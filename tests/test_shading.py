import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.render import shading


def test_bilinear_sampling_corners_and_center():
    tex = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4, 1))
    # align_corners=True: u=0,v=1 -> texel (0,0) (top-left since v flipped)
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[0.0, 1.0]]))
    np.testing.assert_allclose(val[0, 0], 0.0, atol=1e-6)
    # u=1, v=0 -> bottom-right texel (3,3) = 15
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[1.0, 0.0]]))
    np.testing.assert_allclose(val[0, 0], 15.0, atol=1e-6)
    # center: average of the 4 central texels (5,6,9,10) = 7.5
    val = shading.sample_texture_bilinear(tex, jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(val[0, 0], 7.5, atol=1e-5)


def test_bilinear_is_differentiable():
    tex = jnp.ones((8, 8, 3))
    g = jax.grad(lambda uv: shading.sample_texture_bilinear(tex, uv).sum())(
        jnp.asarray([[0.3, 0.7]])
    )
    assert np.all(np.isfinite(np.asarray(g)))


def test_pixar_frame_orthonormal():
    rng = np.random.RandomState(0)
    n = rng.randn(100, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    u, v = shading.pixar_tangent_frame(jnp.asarray(n))
    u, v = np.asarray(u), np.asarray(v)
    np.testing.assert_allclose((u * n).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose((v * n).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose((u * v).sum(1), 0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1, atol=1e-5)


def test_normal_map_identity():
    """Sampling (0,0,1) from the normal map must leave normals unchanged."""
    rng = np.random.RandomState(1)
    n = rng.randn(50, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    flat = jnp.asarray(np.tile([0.0, 0.0, 1.0], (50, 1)).astype(np.float32))
    out = shading.apply_normal_map(jnp.asarray(n), flat)
    np.testing.assert_allclose(np.asarray(out), n, atol=1e-5)


def test_phong_lighting_head_on():
    # Surface at origin facing +z, light on +z axis: full diffuse.
    pts = jnp.zeros((1, 2, 2, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 2, 2, 3))
    light = jnp.asarray([[0.0, 0.0, 5.0]])
    campos = jnp.asarray([[0.0, 0.0, 3.0]])
    amb, diff, spec = shading.phong_lighting(
        pts, nrm, light, campos, (0.5,) * 3, (0.4,) * 3, (0.1,) * 3, shininess=0.0
    )
    np.testing.assert_allclose(np.asarray(amb), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(diff), 0.4, atol=1e-5)
    # shininess=0 -> specular = color wherever cos > 0 (alpha^0 == 1).
    np.testing.assert_allclose(np.asarray(spec), 0.1, atol=1e-5)


def test_phong_diffuse_grazing():
    pts = jnp.zeros((1, 1, 1, 3))
    nrm = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (1, 1, 1, 3))
    light = jnp.asarray([[5.0, 0.0, 0.0]])  # 90 degrees -> no diffuse
    campos = jnp.asarray([[0.0, 0.0, 3.0]])
    _, diff, spec = shading.phong_lighting(
        pts, nrm, light, campos, (0.5,) * 3, (0.4,) * 3, (0.1,) * 3, 0.0
    )
    np.testing.assert_allclose(np.asarray(diff), 0.0, atol=1e-5)
    # cos <= 0 -> alpha = 0 but 0^0 = 1 (reference quirk): spec stays.
    np.testing.assert_allclose(np.asarray(spec), 0.1, atol=1e-5)


def test_specular_shininess64_highlight_falloff():
    """The non-shadow phong path must render the pytorch3d Materials default
    tight highlight (shininess=64, reference renderer_helper.py:264 +
    pbr_materials.py:18), not a constant specular term.

    Analytic pin: for a flat +z surface, light and camera both on the +z
    axis, the specular factor at a pixel whose normal makes the reflection
    miss the view by angle theta is cos(theta)^64 — the half-width where
    the factor drops to 0.5 is ~9.5 deg. A constant specular (the old
    shininess=0 behavior) fails both pins below.
    """
    # Normals tilted by increasing angles; reflection of an axis-aligned
    # light about the normal deviates from the view direction by 2*tilt.
    angles = np.deg2rad(np.array([0.0, 2.0, 5.0, 10.0, 20.0], np.float32))
    nrm = np.stack(
        [np.sin(angles), np.zeros_like(angles), np.cos(angles)], axis=-1
    )
    pts = jnp.zeros((1, 1, 5, 3))
    light = jnp.asarray([[0.0, 0.0, 100.0]])  # ~directional from +z
    campos = jnp.asarray([[0.0, 0.0, 100.0]])
    _, _, spec = shading.phong_lighting(
        pts, jnp.asarray(nrm)[None, None], light, campos,
        (0.5,) * 3, (0.4,) * 3, (1.0,) * 3, shininess=64.0,
    )
    spec = np.asarray(spec)[0, 0, :, 0]
    # cos(2*tilt)^64 (light at finite distance: tolerance loose but the
    # shape is unmistakable vs constant specular).
    expected = np.cos(2 * angles) ** 64
    np.testing.assert_allclose(spec, expected, atol=0.02)
    assert spec[0] > 0.98 and spec[-1] < 0.01  # tight falloff, not constant
    # Gradient must be finite at alpha == 0 (grazing/backside pixels).
    g = jax.grad(
        lambda n: shading.phong_lighting(
            pts, n, light, campos, (0.5,) * 3, (0.4,) * 3, (1.0,) * 3,
            shininess=64.0,
        )[2].sum()
    )(jnp.asarray(-nrm)[None, None])  # flipped normals: cos<0, alpha=0
    assert np.all(np.isfinite(np.asarray(g)))


def test_default_config_shininess_is_64():
    from harp_tpu.config import HarpConfig

    assert HarpConfig().shininess == 64.0


def test_bilinear_packed_stack_matches_4gather():
    """The corner-stack bilinear sampler must match the 4-gather form in
    value and in gradients w.r.t. BOTH the texture and the uvs, including
    at the borders and outside [0,1]^2 (clip semantics)."""
    import jax

    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.normal(size=(17, 13, 6)).astype(np.float32))
    uv = jnp.asarray(
        np.stack(
            [rng.uniform(-0.2, 1.2, size=(2, 41)), rng.uniform(-0.2, 1.2, size=(2, 41))],
            axis=-1,
        ).astype(np.float32)
    )
    a = shading.sample_texture_bilinear(tex, uv)
    b = shading._sample_texture_bilinear_4gather(tex, uv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g = jnp.asarray(rng.normal(size=a.shape).astype(np.float32))
    ga = jax.grad(lambda t, u: (shading.sample_texture_bilinear(t, u) * g).sum(),
                  argnums=(0, 1))(tex, uv)
    gb = jax.grad(lambda t, u: (shading._sample_texture_bilinear_4gather(t, u) * g).sum(),
                  argnums=(0, 1))(tex, uv)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-5)


def test_pcf_packed_stack_matches_9gather():
    """The shifted-stack PCF must match the 9-gather loop in value and in
    gradients w.r.t. the depth map and the point depths, for tap centers
    well inside, at, and beyond every border."""
    import jax
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.shadow import pcf_visibility, _pcf_visibility_loop

    config = HarpConfig(img_size=32, texture_size=16)
    rng = np.random.default_rng(5)
    B, Hl = 2, 19
    depth = jnp.asarray(rng.normal(size=(B, Hl, Hl)).astype(np.float32))
    # Hit every interesting region: interior, each border, corners, and
    # far out of range both sides.
    xs = np.concatenate([rng.integers(0, Hl, size=40),
                         np.array([-7, -2, -1, 0, 1, Hl - 2, Hl - 1, Hl, Hl + 1, Hl + 6])])
    ys = np.concatenate([rng.integers(0, Hl, size=40),
                         np.array([Hl + 3, Hl, Hl - 1, 0, -1, -5, 2, Hl - 2, 1, -1])])
    x = jnp.asarray(np.stack([xs, ys]).astype(np.int32))
    y = jnp.asarray(np.stack([ys, xs]).astype(np.int32))
    a = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    va = pcf_visibility(depth, x, y, a, config)
    vb = _pcf_visibility_loop(depth, x, y, a, config)
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), atol=1e-6)

    g = jnp.asarray(rng.normal(size=va.shape).astype(np.float32))
    ga = jax.grad(lambda d, aa: (pcf_visibility(d, x, y, aa, config) * g).sum(),
                  argnums=(0, 1))(depth, a)
    gb = jax.grad(lambda d, aa: (_pcf_visibility_loop(d, x, y, aa, config) * g).sum(),
                  argnums=(0, 1))(depth, a)
    np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]), atol=1e-5)


def _pcf_case(B=2, Hl=24, nG=6, group=8, seed=11):
    """PCF inputs where only a few pixel groups have in-band taps: depths
    clustered so (tap - a) * sharpness sits inside the f32 sigmoid band for
    groups 0 and 3 of each frame and saturates far outside it elsewhere."""
    import numpy as np

    rng = np.random.default_rng(seed)
    N = nG * group
    depth = rng.uniform(0.5, 0.6, size=(B, Hl, Hl)).astype(np.float32)
    x = rng.integers(1, Hl - 1, size=(B, N)).astype(np.int32)
    y = rng.integers(1, Hl - 1, size=(B, N)).astype(np.int32)
    # Far from every tap: saturated (band has |tap - a| < ~0.104 at
    # sharpness 1000); groups 0 and 3 sit within 5e-3 of the tap depths.
    a = np.full((B, N), 5.0, np.float32)
    for gsel in (0, 3):
        a[:, gsel * group : (gsel + 1) * group] = rng.uniform(
            0.495, 0.605, size=(B, group)
        ).astype(np.float32)
    return (jnp.asarray(depth), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(a), group)


def test_pcf_band_compacted_backward_exact_within_budget():
    """With pcf_grad_tiles covering every in-band group, the compacted
    backward must equal the dense scatter exactly (same update set)."""
    import jax
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.shadow import pcf_visibility, pcf_band_groups

    depth, x, y, a, group = _pcf_case()
    dense_cfg = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=0)
    comp_cfg = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=3)

    # Patch the group size through pcf_visibility's fixed 256 by calling
    # _pcf_sum via a config-free wrapper: exercise the public path with
    # group=256 instead by tiling the case up.
    reps = 256 // group
    xx = jnp.repeat(x, reps, axis=1)
    yy = jnp.repeat(y, reps, axis=1)
    aa = jnp.repeat(a, reps, axis=1)

    band = pcf_band_groups(depth, xx, yy, aa, dense_cfg, group=256)
    assert int(band.max()) <= 3  # budget covers the band

    va = pcf_visibility(depth, xx, yy, aa, dense_cfg)
    vb = pcf_visibility(depth, xx, yy, aa, comp_cfg)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))

    g = jnp.asarray(np.random.default_rng(3).normal(size=va.shape)
                    .astype(np.float32))
    gd = jax.grad(lambda d, p: (pcf_visibility(d, xx, yy, p, dense_cfg) * g).sum(),
                  argnums=(0, 1))(depth, aa)
    gc = jax.grad(lambda d, p: (pcf_visibility(d, xx, yy, p, comp_cfg) * g).sum(),
                  argnums=(0, 1))(depth, aa)
    np.testing.assert_allclose(np.asarray(gd[0]), np.asarray(gc[0]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(gd[1]), np.asarray(gc[1]))


def test_pcf_band_compacted_backward_truncates_to_top_groups():
    """With a budget of 1 group, only the most in-band group's rows reach
    the depth-map gradient; point-depth grads stay dense (elementwise)."""
    import jax
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.shadow import pcf_visibility

    depth, x, y, a, group = _pcf_case()
    reps = 256 // group
    xx, yy, aa = (jnp.repeat(v, reps, axis=1) for v in (x, y, a))
    cfg1 = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=1)
    cfg0 = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=0)

    gd = jax.grad(lambda d: pcf_visibility(d, xx, yy, aa, cfg0).sum())(depth)
    gt = jax.grad(lambda d: pcf_visibility(d, xx, yy, aa, cfg1).sum())(depth)
    # Truncated grad is a strict partial sum: nonzero somewhere, and no
    # entry exceeds the dense magnitude pattern's support.
    assert float(jnp.abs(gt).sum()) > 0
    assert float(jnp.abs(gt).sum()) < float(jnp.abs(gd).sum())
    # a-side gradient is unaffected by the budget.
    ga0 = jax.grad(lambda p: pcf_visibility(depth, xx, yy, p, cfg0).sum())(aa)
    ga1 = jax.grad(lambda p: pcf_visibility(depth, xx, yy, p, cfg1).sum())(aa)
    np.testing.assert_array_equal(np.asarray(ga0), np.asarray(ga1))


def test_pcf_band_compaction_falls_back_dense_on_ragged_groups():
    """N not divisible by the group size (e.g. the full-image eval path)
    silently uses the dense scatter — budget must never change results."""
    import jax
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.shadow import pcf_visibility

    depth, x, y, a, _ = _pcf_case(nG=5, group=10)  # N = 50, ragged vs 256
    cfg0 = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=0)
    cfg2 = HarpConfig(img_size=32, texture_size=16, pcf_grad_tiles=2)
    g0 = jax.grad(lambda d: pcf_visibility(d, x, y, a, cfg0).sum())(depth)
    g2 = jax.grad(lambda d: pcf_visibility(d, x, y, a, cfg2).sum())(depth)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g2))


def test_pcf_pallas_scatter_kernel_matches_dense():
    """The Mosaic one-hot-matmul scatter (pallas/pcf_grad_kernel.py) must
    equal a brute-force dense accumulation exactly: taps at every border
    (clipped coords), a group spanning many row windows, and N not a
    multiple of the 256-pixel group size."""
    from harp_tpu.render.pallas.pcf_grad_kernel import (
        pallas_pcf_scatter, fold_pad2,
    )

    rng = np.random.default_rng(7)
    B, Hl, N = 2, 28, 300  # N % 256 != 0
    hp4 = Hl + 4
    # Centers cover the full clipped range [1, Hl+2] incl. both extremes.
    yc = rng.integers(1, Hl + 3, size=(B, N)).astype(np.int32)
    xc = rng.integers(1, Hl + 3, size=(B, N)).astype(np.int32)
    yc[0, :4] = [1, Hl + 2, 1, Hl + 2]
    xc[0, :4] = [1, 1, Hl + 2, Hl + 2]
    upd = rng.normal(size=(B, N, 9)).astype(np.float32)

    out = np.asarray(pallas_pcf_scatter(
        jnp.asarray(yc), jnp.asarray(xc), jnp.asarray(upd), Hl,
        interpret=True,
    ))
    ref = np.zeros((B, hp4, hp4), np.float32)
    for b in range(B):
        for i in range(N):
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    t = 3 * (di + 1) + (dj + 1)
                    ref[b, yc[b, i] + di, xc[b, i] + dj] += upd[b, i, t]
    # Exact: both are f32 sums of the same values; ordering differences
    # stay within one-ulp accumulation noise of the window matmuls.
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-5)

    # fold_pad2 == transpose of edge-pad-by-2: pin against jax.vjp of pad.
    dpad = jnp.asarray(rng.normal(size=(B, hp4, hp4)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda d: jnp.pad(d, ((0, 0), (2, 2), (2, 2)), mode="edge"),
        jnp.zeros((B, Hl, Hl), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(fold_pad2(dpad)), np.asarray(vjp(dpad)[0]),
        rtol=1e-6, atol=1e-6,
    )


def test_pcf_pallas_backward_matches_xla_path():
    """pcf_visibility with the Pallas backward (pcf_backend=
    "pallas_interpret" on CPU) must reproduce the XLA scatter path: same
    values, same gradients w.r.t. the depth map and the point depths —
    including clipped out-of-range tap centers."""
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.shadow import pcf_visibility

    cfg_x = HarpConfig(img_size=32, texture_size=16, pcf_backend="xla")
    cfg_p = HarpConfig(img_size=32, texture_size=16,
                       pcf_backend="pallas_interpret")
    rng = np.random.default_rng(5)
    B, Hl = 2, 19
    depth = jnp.asarray(rng.normal(size=(B, Hl, Hl)).astype(np.float32))
    xs = np.concatenate([rng.integers(0, Hl, size=40),
                         np.array([-7, -2, -1, 0, 1, Hl - 2, Hl - 1, Hl,
                                   Hl + 1, Hl + 6])])
    ys = np.concatenate([rng.integers(0, Hl, size=40),
                         np.array([Hl + 3, Hl, Hl - 1, 0, -1, -5, 2, Hl - 2,
                                   1, -1])])
    x = jnp.asarray(np.stack([xs, ys]).astype(np.int32))
    y = jnp.asarray(np.stack([ys, xs]).astype(np.int32))
    a = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    vx = pcf_visibility(depth, x, y, a, cfg_x)
    vp = pcf_visibility(depth, x, y, a, cfg_p)
    np.testing.assert_allclose(np.asarray(vp), np.asarray(vx), atol=1e-6)

    g = jnp.asarray(rng.normal(size=vx.shape).astype(np.float32))
    gx = jax.grad(lambda d, aa: (pcf_visibility(d, x, y, aa, cfg_x) * g).sum(),
                  argnums=(0, 1))(depth, a)
    gp = jax.grad(lambda d, aa: (pcf_visibility(d, x, y, aa, cfg_p) * g).sum(),
                  argnums=(0, 1))(depth, a)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               rtol=1e-5, atol=1e-6)
