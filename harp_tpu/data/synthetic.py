"""Synthetic ground-truth sequences for tests and benchmarks.

Renders the (synthetic or real) hand model with known parameters to produce
images + masks, and returns a perturbed initialization — standing in for the
reference's METRO preprocessing output so the full fit loop can be exercised
hermetically (the reference's sample data is not redistributable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig
from harp_tpu.render import pipeline
from harp_tpu.render.rasterizer import RasterConfig


def erode_mask(mask: jnp.ndarray, iterations: int = 2) -> jnp.ndarray:
    """3x3 min-filter erosion, matching cv2.erode(kernel=ones(3,3))
    (reference utils/data_util.py:18-20)."""
    m = mask
    for _ in range(iterations):
        m = jax.lax.reduce_window(
            m, jnp.inf, jax.lax.min, (1, 3, 3), (1, 1, 1), "SAME"
        )
    return m


def make_synthetic_sequence(assets: AvatarAssets, config: HarpConfig,
                            rcfg: RasterConfig, n_frames: int = 4,
                            seed: int = 0, perturb: float = 0.15,
                            cam=(6.0, -0.08, -0.01),
                            shape_seed: int | None = None):
    """Returns (images, masks, masks_eroded, gt_params, init_params_dict).

    shape_seed: override the GT hand SHAPE's seed (the texture/normal/light
    appearance is already seed-independent). Two sequences generated with
    different `seed` but the same `shape_seed` depict the SAME identity
    under different motions — the setting the reference's known_appearance
    test mode assumes (appearance fitted on sequence A transferred frozen
    to sequence B, optimize_sequence.py:263-272). Applied as an overlay so
    the base RNG stream (and every existing seeded scene) is unchanged."""
    rng = np.random.RandomState(seed)
    ts = config.texture_size
    V = assets.num_render_verts
    # Parameter widths follow the model family: MANO 45-dof pose / 10 shape,
    # NIMBLE 30 PCA pose / 20 shape, etc.
    P = getattr(assets.model, "ncomps", 45)
    S = assets.model.shapedirs.shape[2]

    # Ground-truth parameters: smooth pose trajectory + mild appearance.
    t = np.linspace(0, 1, n_frames)[:, None]
    base_pose = 0.25 * rng.randn(1, P)
    drift = 0.2 * np.sin(2 * np.pi * t + rng.uniform(0, 6.28, (1, P)))
    tex = np.tile(np.array([0.8, 0.62, 0.55], np.float32), (ts, ts, 1))
    # paint some structure so photometric losses are informative
    yy, xx = np.mgrid[0:ts, 0:ts]
    tex[..., 0] += 0.1 * np.sin(xx / 6.0)
    tex[..., 1] += 0.1 * np.cos(yy / 9.0)
    gt = {
        "pose": jnp.asarray(base_pose + drift, jnp.float32),
        "rot": jnp.asarray(0.1 * rng.randn(n_frames, 3) * 0 + 0.05 * t, jnp.float32),
        "trans": jnp.zeros((n_frames, 3), jnp.float32),
        "shape": jnp.asarray(0.3 * rng.randn(S), jnp.float32),
        "wrist_pose": jnp.zeros((n_frames, 3), jnp.float32),
        "cam": jnp.asarray(np.tile(cam, (n_frames, 1)), jnp.float32),
        "verts_disps": jnp.zeros((V, 1), jnp.float32),
        "texture": jnp.asarray(np.clip(tex, 0, 1)),
        "normal_map": jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (ts, ts, 3)).astype(jnp.float32),
        "light_positions": jnp.asarray(np.tile([-0.5, -0.5, -0.5], (n_frames, 1)), jnp.float32),
        "amb_ratio": jnp.asarray(0.4, jnp.float32),
    }

    if shape_seed is not None:
        gt["shape"] = jnp.asarray(
            0.3 * np.random.RandomState(shape_seed).randn(S), jnp.float32
        )

    # One jitted program for the whole GT render: eager op-by-op dispatch is
    # extremely slow on remote-compile backends. Long sequences render as
    # chunks of a lax.map so they stay inside HBM (an unchunked 150-frame
    # 448² GT render needs 18.75 GiB of temps — compile-time OOM on v5e).
    # Sequences <= 48 frames keep the original single-batch program so
    # every previously measured GT stays bit-identical (the protocol
    # determinism lineage pins on it); chunking is mathematically a no-op
    # (frames are independent) but XLA may tile reductions differently.
    def _render_frames(gt, fids):
        verts, joints = pipeline.mesh_forward(gt, fids, assets, config)
        R, T = pipeline.camera_for_frames(gt, fids, config)
        alpha = pipeline.render_silhouette(verts, assets, R, T, config, rcfg)
        images = pipeline.render_rgb(
            verts, assets, R, T, config, rcfg, gt["texture"],
            gt["normal_map"], gt["light_positions"][fids],
        )
        masks = (alpha > 0.5).astype(jnp.float32)
        return joints, images, masks, erode_mask(masks)

    if n_frames <= 48:
        fids = jnp.arange(n_frames)
        _render_gt = jax.jit(lambda gt: _render_frames(gt, fids))
    else:
        chunk = 16
        pad = (-n_frames) % chunk
        fids_pad = jnp.concatenate([jnp.arange(n_frames),
                                    jnp.zeros((pad,), jnp.int32)])

        @jax.jit
        def _render_gt(gt):
            out = jax.lax.map(lambda f: _render_frames(gt, f),
                              fids_pad.reshape(-1, chunk))
            return jax.tree.map(
                lambda x: x.reshape((-1,) + x.shape[2:])[:n_frames], out
            )

    joints, images, masks, masks_eroded = _render_gt(gt)

    # Perturbed init, standing in for noisy METRO estimates.
    init = {
        "pose": np.asarray(gt["pose"]) + perturb * rng.randn(n_frames, P).astype(np.float32),
        "rot": np.asarray(gt["rot"]) + 0.3 * perturb * rng.randn(n_frames, 3).astype(np.float32),
        "trans": np.asarray(gt["trans"]),
        "shape": np.tile(np.asarray(gt["shape"]), (n_frames, 1))
        + 0.5 * perturb * rng.randn(n_frames, S).astype(np.float32),
        "cam": np.asarray(gt["cam"]),
        "joints": np.asarray(joints),  # anchor joints, as METRO would supply
    }
    return images, masks, masks_eroded, gt, init
