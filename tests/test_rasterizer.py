import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.render.rasterizer import (
    RasterConfig,
    rasterize,
    rasterize_brute,
    rasterize_soft,
    rasterize_hard,
    soft_alpha_from_ids,
    barycentrics_of,
)

CFG = RasterConfig(
    image_size=32, tile=8, cap=64, bin_chunk=8, tile_chunk=4, face_chunk=16,
    faces_per_pixel=4,
)


def _tri(verts2d, z=1.0):
    """One triangle: verts (3,2) px -> (1,3,3) screen verts."""
    v = np.concatenate([np.asarray(verts2d, np.float32), np.full((3, 1), z, np.float32)], 1)
    return jnp.asarray(v)[None]


def test_hard_single_triangle_coverage():
    # Right triangle covering the lower-left of pixel space.
    verts = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
    faces = np.array([[0, 1, 2]])
    hard = np.asarray(rasterize_hard(verts, faces, CFG))[0]
    # Pixel centers strictly inside the triangle -> id 0, outside -> -1.
    ii, jj = np.mgrid[0:32, 0:32]
    px, py = jj + 0.5, ii + 0.5
    inside = (px >= 2) & (py >= 2) & (px + py <= 32)  # hypotenuse x+y=32
    # Skip pixels within 1px of the boundary (edge-rule ambiguity).
    dist_edge = np.minimum.reduce([px - 2, py - 2, (32 - px - py) / np.sqrt(2)])
    sure = np.abs(dist_edge) > 1.0
    np.testing.assert_array_equal(hard[inside & sure], 0)
    np.testing.assert_array_equal(hard[(~inside) & sure], -1)


def test_hard_depth_ordering():
    # Two stacked triangles; nearer one (z=1) must win where they overlap.
    v_far = np.array([[2, 2], [30, 2], [2, 30]], np.float32)
    v_near = np.array([[8, 8], [24, 8], [8, 24]], np.float32)
    verts = np.concatenate(
        [
            np.concatenate([v_far, np.full((3, 1), 2.0, np.float32)], 1),
            np.concatenate([v_near, np.full((3, 1), 1.0, np.float32)], 1),
        ]
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    hard = np.asarray(rasterize_hard(jnp.asarray(verts)[None], faces, CFG))[0]
    assert hard[12, 12] == 1  # center of near triangle
    assert hard[3, 3] == 0  # only far triangle covers
    assert hard[31, 31] == -1


def test_behind_camera_culled():
    verts = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]], z=-1.0)
    faces = np.array([[0, 1, 2]])
    hard = np.asarray(rasterize_hard(verts, faces, CFG))[0]
    assert (hard == -1).all()


def test_tiled_matches_brute():
    rng = np.random.RandomState(0)
    B, n = 2, 40
    verts = np.zeros((B, n * 3, 3), np.float32)
    for b in range(B):
        centers = rng.uniform(2, 30, size=(n, 2))
        offsets = rng.uniform(-4, 4, size=(n, 3, 2))
        v2 = (centers[:, None] + offsets).reshape(-1, 2)
        z = rng.uniform(0.5, 3.0, size=(n, 1)).repeat(3, 1).reshape(-1)
        verts[b, :, :2] = v2
        verts[b, :, 2] = z
    faces = np.arange(n * 3).reshape(n, 3)
    soft_t, hard_t = rasterize(jnp.asarray(verts), faces, CFG)
    soft_b, hard_b = rasterize_brute(jnp.asarray(verts), faces, CFG)
    np.testing.assert_array_equal(np.asarray(hard_t), np.asarray(hard_b))
    # Soft lists: compare as sets per pixel (distance ties may reorder).
    st, sb = np.sort(np.asarray(soft_t), -1), np.sort(np.asarray(soft_b), -1)
    np.testing.assert_array_equal(st, sb)


def test_soft_alpha_saturates_inside():
    cfg = CFG
    verts = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
    faces = np.array([[0, 1, 2]])
    ids = rasterize_soft(verts, faces, cfg)
    alpha = np.asarray(soft_alpha_from_ids(ids, verts, faces, cfg))[0]
    assert alpha[10, 10] > 0.999
    assert alpha[1, 30] < 1e-3
    assert alpha.min() >= 0 and alpha.max() <= 1 + 1e-6


def test_soft_alpha_gradient_matches_fd():
    # Wider sigma so the soft boundary spans pixels and FD is meaningful.
    cfg = RasterConfig(
        image_size=32, tile=8, cap=64, bin_chunk=8, tile_chunk=4, face_chunk=16,
        faces_per_pixel=4, sigma=2e-4,
        blur_radius=float(np.log(1 / 1e-4 - 1) * 2e-4),
    )
    faces = np.array([[0, 1, 2]])
    base = np.array(
        [[[6.0, 6.0, 1.0], [26.0, 8.0, 1.0], [10.0, 26.0, 1.0]]], np.float32
    )

    def coverage_sum(verts):
        ids = rasterize_soft(verts, faces, cfg)
        return soft_alpha_from_ids(ids, verts, faces, cfg).sum()

    g = np.asarray(jax.grad(lambda v: coverage_sum(v))(jnp.asarray(base)))
    eps = 1e-3
    for vi in range(3):
        for ci in range(2):
            vp = base.copy()
            vp[0, vi, ci] += eps
            vm = base.copy()
            vm[0, vi, ci] -= eps
            fd = (float(coverage_sum(jnp.asarray(vp))) - float(coverage_sum(jnp.asarray(vm)))) / (
                2 * eps
            )
            # Moving a vertex outward grows coverage; grads must agree within
            # a few percent (FD crosses the id-selection boundary slightly).
            np.testing.assert_allclose(g[0, vi, ci], fd, rtol=0.08, atol=0.02)


def test_barycentrics_interpolate_linearly():
    verts = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
    # Give vertices distinct depths: z plane tilted.
    verts = verts.at[0, :, 2].set(jnp.array([1.0, 2.0, 3.0]))
    faces = np.array([[0, 1, 2]])
    ids = rasterize_hard(verts, faces, CFG)
    bary, z, mask = barycentrics_of(ids, verts, faces, CFG)
    bary, z, mask = np.asarray(bary)[0], np.asarray(z)[0], np.asarray(mask)[0]
    assert mask[10, 10]
    np.testing.assert_allclose(bary[10, 10].sum(), 1.0, atol=1e-5)
    # Affine z at pixel (10.5, 10.5): solve barycentrics analytically.
    A = np.array([[2, 30, 2], [2, 2, 30], [1, 1, 1]], float)
    b = np.linalg.solve(A, np.array([10.5, 10.5, 1.0]))
    np.testing.assert_allclose(z[10, 10], b @ [1.0, 2.0, 3.0], atol=1e-4)


def test_batch_independent():
    verts0 = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
    verts1 = _tri([[20.0, 20.0], [30.0, 20.0], [20.0, 30.0]])
    verts = jnp.concatenate([verts0, verts1], 0)
    faces = np.array([[0, 1, 2]])
    hard = np.asarray(rasterize_hard(verts, faces, CFG))
    assert hard[0, 10, 10] == 0 and hard[1, 10, 10] == -1
    assert hard[1, 22, 22] == 0 and hard[0, 22, 22] == -1


def test_active_tile_compaction_preserves_coverage():
    """With the subject inside the tile budget, compaction output is
    identical; overflow is reported when the budget is exceeded."""
    import dataclasses
    from harp_tpu.render.rasterizer import _rasterize_ids

    # Small triangle: covers ~4 of 16 tiles.
    verts = _tri([[10.0, 10.0], [22.0, 12.0], [12.0, 22.0]])
    faces = np.array([[0, 1, 2]])
    full = rasterize_hard(verts, faces, CFG)
    half_cfg = dataclasses.replace(CFG, active_fraction=0.5)
    half = rasterize_hard(verts, faces, half_cfg)
    np.testing.assert_array_equal(np.asarray(half), np.asarray(full))

    # Big triangle at a tiny budget: coverage drops, overflow flags it.
    big = _tri([[2.0, 2.0], [30.0, 2.0], [2.0, 30.0]])
    tiny_cfg = dataclasses.replace(CFG, active_fraction=0.25)
    out = _rasterize_ids(
        jnp.asarray(big), jnp.asarray(faces, jnp.int32), tiny_cfg, False, True
    )
    assert int(out["active_overflow"].max()) > 0


def test_pair_binning_matches_dense():
    """Pair-expansion binning (_bin_faces) against the dense reference
    (_bin_faces_dense): identical per-tile id lists and counts on a random
    scene, plus the two truncation regimes (ADVICE round-2: this cross-check
    was claimed in a docstring but did not exist).
    """
    from harp_tpu.render.rasterizer import _bin_faces, _bin_faces_dense

    rng = np.random.RandomState(3)
    cfg = RasterConfig(image_size=32, tile=8, cap=16, bin_chunk=8,
                       span_tiles=4)
    # 60 small random triangles over 2 frames.
    c = rng.uniform(2, 30, size=(2, 60, 1, 2)).astype(np.float32)
    d = rng.uniform(-3, 3, size=(2, 60, 3, 2)).astype(np.float32)
    fv = jnp.asarray(
        np.concatenate([c + d, np.ones((2, 60, 3, 1), np.float32)], -1)
    )
    ids_p, counts_p, _ = jax.jit(lambda x: _bin_faces(x, cfg))(fv)
    ids_d, counts_d = jax.jit(lambda x: _bin_faces_dense(x, cfg))(fv)
    np.testing.assert_array_equal(np.asarray(counts_p), np.asarray(counts_d))
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_d))


def test_pair_binning_cap_truncation_matches_dense():
    """More overlapping faces than cap: both binners keep the lowest face
    ids and report the FULL pre-truncation count (so bin_overflow fires)."""
    from harp_tpu.render.rasterizer import _bin_faces, _bin_faces_dense

    cfg = RasterConfig(image_size=32, tile=8, cap=8, bin_chunk=8,
                       span_tiles=4)
    # 20 triangles stacked over the same tile (cap 8), slightly offset in x.
    tri = np.array([[9.0, 9.0], [14.0, 9.0], [9.0, 14.0]], np.float32)
    xy = np.tile(tri, (1, 20, 1, 1))
    xy[..., 0] += np.linspace(0, 0.5, 20)[None, :, None]
    fv = jnp.asarray(np.concatenate(
        [xy, np.ones((1, 20, 3, 1), np.float32)], -1
    ).astype(np.float32))
    ids_p, counts_p, _ = jax.jit(lambda x: _bin_faces(x, cfg))(fv)
    ids_d, counts_d = jax.jit(lambda x: _bin_faces_dense(x, cfg))(fv)
    np.testing.assert_array_equal(np.asarray(counts_p), np.asarray(counts_d))
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_d))
    t = int(np.asarray(counts_p)[0].argmax())
    assert np.asarray(counts_p)[0, t] == 20  # pre-truncation count
    np.testing.assert_array_equal(
        np.asarray(ids_p)[0, t], np.arange(8)  # lowest ids kept
    )


def test_pair_binning_span_truncation_flagged():
    """A face spanning more tiles than span_tiles is truncated (lowest tiles
    kept, dense binning lists it everywhere) and MUST surface through the
    overflow accounting (counts > cap at its first tile)."""
    from harp_tpu.render.rasterizer import _bin_faces, _bin_faces_dense

    cfg = RasterConfig(image_size=64, tile=8, cap=4, span_tiles=2,
                       bin_chunk=8)
    # One huge triangle covering most of the image (8x8 tiles > span 2).
    fv = jnp.asarray(
        np.array([[[[1.0, 1.0, 1.0], [60.0, 1.0, 1.0], [1.0, 60.0, 1.0]]]],
                 np.float32)
    )
    ids_p, counts_p, _ = jax.jit(lambda x: _bin_faces(x, cfg))(fv)
    ids_d, counts_d = jax.jit(lambda x: _bin_faces_dense(x, cfg))(fv)
    counts_p = np.asarray(counts_p)[0]
    # Dense sees the face in many tiles; pair keeps only span^2 lowest.
    assert (np.asarray(ids_p)[0] >= 0).sum() == 4
    assert (np.asarray(ids_d)[0] >= 0).sum() > 16
    # Truncation is loud: the face's first tile reports counts > cap.
    assert counts_p.max() > cfg.cap
