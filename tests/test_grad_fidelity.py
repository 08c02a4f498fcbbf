"""Gradient fidelity of the K-bounded soft-raster list on dense overlap.

The silhouette alpha forward is exact (in-raster log-sum over ALL
within-blur faces), but the backward flows only through the K recorded
faces per pixel (rasterizer.soft_alpha_fast). The reference uses K=50
(renderer_helper.py:47); we default K=8 with the argument that pixels with
more than K within-blur contributors are saturated (alpha ~= 1) and carry
vanishing gradient. This test QUANTIFIES that claim on a worst-case scene —
40 triangles stacked over the same pixels, the folded-fingers regime — by
comparing d(loss)/d(verts) at K=8 and K=50 against an all-faces
differentiable brute-force alpha.
"""
import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.render.rasterizer import (
    RasterConfig,
    as_faces_array,
    face_pixel_geometry,
    raster_full,
    soft_alpha_fast,
    _pixel_centers,
)

IMG = 64


def _stacked_scene(n_tri: int = 40, seed: int = 5):
    """n_tri triangles all covering the image center at staggered depths and
    small in-plane offsets: interior pixels see every triangle within blur."""
    rng = np.random.RandomState(seed)
    verts = []
    faces = []
    for i in range(n_tri):
        c = np.array([IMG / 2, IMG / 2]) + rng.uniform(-2.0, 2.0, 2)
        ang = rng.uniform(0, 2 * np.pi)
        r = 18.0 + rng.uniform(-2, 2)
        tri = np.stack(
            [
                [c[0] + r * np.cos(ang + t), c[1] + r * np.sin(ang + t)]
                for t in (0.0, 2.1, 4.2)
            ]
        )
        z = 2.0 + 0.05 * i
        verts.append(np.concatenate([tri, np.full((3, 1), z)], 1))
        faces.append(np.arange(3) + 3 * i)
    return (
        np.stack(verts).reshape(1, -1, 3).astype(np.float32),
        np.stack(faces).astype(np.int32),
    )


def _alpha_brute(verts_px, faces, cfg):
    """Differentiable through ALL faces (no K truncation)."""
    faces = as_faces_array(faces)
    fv = verts_px[:, faces]
    px, py = _pixel_centers(cfg)
    g = face_pixel_geometry(
        fv[:, :, None, None, :, :], px[None, None], py[None, None], cfg
    )
    d_px2 = g["signed_d_ndc2"] / (cfg.ndc_scale**2)
    hit = g["valid"] & (d_px2 <= cfg.blur_px2)
    contrib = -jax.nn.softplus(-g["signed_d_ndc2"] / cfg.sigma)
    lsum = jnp.where(hit, contrib, 0.0).sum(axis=1)
    return 1.0 - jnp.exp(lsum)


def _loss_of(alpha_fn):
    # An asymmetric target makes the alpha gradient nonzero on covered AND
    # uncovered pixels (like the silhouette L1 against a GT mask).
    yy, xx = np.mgrid[0:IMG, 0:IMG]
    target = ((xx + yy) % 3 == 0).astype(np.float32)[None]

    def loss(v):
        return jnp.abs(alpha_fn(v) - target).mean()

    return loss


def _k_grad(verts, faces, K):
    cfg = RasterConfig(
        image_size=IMG, faces_per_pixel=K, cap=64, active_fraction=1.0,
        backend="xla",
    )

    def alpha_fn(v):
        out = raster_full(v, faces, cfg, need_soft=True, need_hard=False)
        return soft_alpha_fast(out["soft_ids"], out["soft_sum"], v, faces, cfg)

    return jax.grad(_loss_of(alpha_fn))(verts)


def test_k8_gradients_match_brute_on_dense_overlap():
    verts, faces = _stacked_scene()
    verts = jnp.asarray(verts)

    cfg_b = RasterConfig(image_size=IMG, faces_per_pixel=8, cap=64,
                         active_fraction=1.0, backend="xla")
    g_true = jax.grad(_loss_of(lambda v: _alpha_brute(v, faces, cfg_b)))(verts)
    g8 = _k_grad(verts, faces, 8)
    g50 = _k_grad(verts, faces, 48)  # multiple of 8; >= n_tri covers all

    gt = np.asarray(g_true)
    scale = np.abs(gt).max()
    rel8 = np.abs(np.asarray(g8) - gt).max() / scale
    rel50 = np.abs(np.asarray(g50) - gt).max() / scale
    cos8 = float(
        (np.asarray(g8).ravel() @ gt.ravel())
        / (np.linalg.norm(g8) * np.linalg.norm(gt) + 1e-30)
    )
    print(f"rel_err K=8: {rel8:.2e}  K=48: {rel50:.2e}  cos(K=8): {cos8:.6f}")

    # K=48 records every contributor -> must equal brute to f32 noise.
    assert rel50 < 1e-4, rel50
    # K=8 on 40-deep overlap: truncated pixels are saturated, so the
    # directional agreement must be essentially exact and the max elementwise
    # deviation small relative to the gradient scale.
    assert cos8 > 0.9999, cos8
    assert rel8 < 0.02, rel8


def test_k8_gradients_on_folded_hand():
    """Same comparison on the actual synthetic hand in a folded ('fist')
    pose — the geometry HARP optimizes through."""
    from harp_tpu.assets import build_synthetic_hand
    from harp_tpu.models.mano import mano_forward

    m = build_synthetic_hand(n_ring=8, seed=0)
    pose = np.zeros((1, 48), np.float32)
    # Flex every finger joint hard around x: a fist with heavy self-overlap.
    pose[:, 3:] = np.tile(np.array([1.4, 0.0, 0.0], np.float32), 15)
    verts_mm, _ = mano_forward(m, jnp.asarray(pose), jnp.zeros((1, 10)),
                               jnp.zeros((1, 3)))
    v = np.asarray(verts_mm)[0] / 1000.0
    v = v - v.mean(0)
    span = np.abs(v[:, :2]).max()
    screen = np.concatenate(
        [(v[:, :2] / span) * (IMG * 0.42) + IMG / 2.0, v[:, 2:3] + 2.0], 1
    ).astype(np.float32)[None]
    faces = m.faces.astype(np.int32)

    verts = jnp.asarray(screen)
    cfg_b = RasterConfig(image_size=IMG, faces_per_pixel=8, cap=512,
                         active_fraction=1.0, backend="xla")
    g_true = jax.grad(_loss_of(lambda vv: _alpha_brute(vv, faces, cfg_b)))(verts)
    g8 = _k_grad_cap(verts, faces, 8, cap=512)

    gt = np.asarray(g_true)
    scale = np.abs(gt).max()
    rel8 = np.abs(np.asarray(g8) - gt).max() / scale
    cos8 = float(
        (np.asarray(g8).ravel() @ gt.ravel())
        / (np.linalg.norm(g8) * np.linalg.norm(gt) + 1e-30)
    )
    print(f"folded hand rel_err K=8: {rel8:.2e}  cos: {cos8:.6f}")
    assert cos8 > 0.999, cos8
    assert rel8 < 0.05, rel8


def _k_grad_cap(verts, faces, K, cap):
    cfg = RasterConfig(image_size=IMG, faces_per_pixel=K, cap=cap,
                       active_fraction=1.0, backend="xla")

    def alpha_fn(v):
        out = raster_full(v, faces, cfg, need_soft=True, need_hard=False)
        return soft_alpha_fast(out["soft_ids"], out["soft_sum"], v, faces, cfg)

    return jax.grad(_loss_of(alpha_fn))(verts)
