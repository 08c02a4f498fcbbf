"""Parameter initialization (reference init_params, optimize_sequence.py:181-250).

All per-frame parameters are pre-stacked (N, ...) arrays — the natural layout
for vmap/scan over the frame axis and for sharding the frame axis across
devices.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from harp_tpu.assets import AvatarAssets
from harp_tpu.config import HarpConfig

SKIN_COLOR = np.array([232, 190, 172], np.float32) / 255.0


def init_params(input_params: dict, assets: AvatarAssets, config: HarpConfig):
    """Build the optimizable parameter pytree + non-optimized aux data.

    input_params: numpy/jnp dict with per-frame 'trans' (N,3), 'pose' (N,45),
    'rot' (N,3), 'shape' (N,10), 'cam' (N,3), 'joints' (N,21,3) — the
    preprocessing (METRO fit) output.
    """
    n = int(np.asarray(input_params["pose"]).shape[0])
    V = assets.num_render_verts
    ts = config.texture_size
    f32 = jnp.float32

    params = {
        "trans": jnp.asarray(input_params["trans"], f32),
        "pose": jnp.asarray(input_params["pose"], f32),
        "rot": jnp.asarray(input_params["rot"], f32),
        # Shared shape: mean of the per-frame estimates (reference :189).
        "shape": jnp.asarray(np.asarray(input_params["shape"], np.float32).mean(0)),
        "wrist_pose": jnp.zeros((n, 3), f32),
        "cam": jnp.asarray(input_params["cam"], f32),
        "verts_disps": jnp.zeros(
            (V, 1 if config.vert_disp_normals else 3), f32
        ),
        "texture": jnp.broadcast_to(jnp.asarray(SKIN_COLOR), (ts, ts, 3)).astype(f32),
        "normal_map": jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0]), (ts, ts, 3)
        ).astype(f32),
        "light_positions": jnp.broadcast_to(
            jnp.asarray([-0.5, -0.5, -0.5]), (n, 3)
        ).astype(f32),
        "amb_ratio": jnp.asarray(0.4, f32),  # pre-sigmoid; ~0.6 ambient
    }
    if config.model_type == "html":
        # HTML appearance: 101 linear texture-basis coefficients.
        params["html_texture"] = jnp.zeros((101,), f32)
    aux = {
        "init_joints": jnp.asarray(input_params["joints"], f32),
        "uv_mask": jnp.asarray(
            np.asarray(
                _resize_mask(assets.uv_mask, (ts, ts)), np.float32
            )
        ),
    }
    return params, aux


def _resize_mask(mask: np.ndarray, size) -> np.ndarray:
    """Nearest-neighbor resize of the uv mask to the texture resolution."""
    H, W = size
    ys = (np.arange(H) * mask.shape[0] / H).astype(int)
    xs = (np.arange(W) * mask.shape[1] / W).astype(int)
    return mask[ys][:, xs]
