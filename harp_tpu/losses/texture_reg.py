"""Stochastic texture smoothness regularizers (loss/texture_reg.py semantics).

Each texel is compared against a Gaussian-offset neighbor; offsets are drawn
fresh every step — here from an explicit PRNG key (jit-friendly, reproducible)
instead of torch's global RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _neighbor_offsets(key, shape, std):
    d = std * jax.random.normal(key, shape + (2,))
    return jnp.trunc(d).astype(jnp.int32)  # torch `.to(torch.int)` truncates


def smooth_texture_reg(texture: jnp.ndarray, key, std: float = 2.0,
                       uv_mask: jnp.ndarray | None = None,
                       offsets: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean |texel - random neighbor|_1 / 3, uv-masked.

    offsets: optional (H, W, 2) int32 neighbor offsets replacing the drawn
    ones — used by the golden-parity tests to replay the exact offsets the
    executed reference sampled (its torch.normal is global-RNG)."""
    H, W = texture.shape[0], texture.shape[1]
    dist = _neighbor_offsets(key, (H, W), std) if offsets is None else offsets
    gx = jnp.arange(H)[:, None] + dist[..., 0]
    gy = jnp.arange(W)[None, :] + dist[..., 1]
    gx = jnp.clip(gx, 0, H - 1)
    gy = jnp.clip(gy, 0, W - 1)
    tar = texture[gx, gy]
    diff = jnp.abs(texture - tar).sum(-1) / 3.0
    if uv_mask is not None:
        diff = diff * uv_mask
    return diff.mean()


def albedo_reg(texture: jnp.ndarray, key, std: float = 1.0,
               uv_mask: jnp.ndarray | None = None,
               offsets: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference albedo_reg: L1 norm (not mean-abs) per texel pair / 3.

    NOTE the reference uses p=1 norm over channels — identical to the sum of
    absolute channel differences, as in smooth_texture_reg.
    """
    return smooth_texture_reg(texture, key, std=std, uv_mask=uv_mask,
                              offsets=offsets)


def close_to_z_reg(normal_map: jnp.ndarray) -> jnp.ndarray:
    """Mean ||n - (0,0,1)||_2 / 3 (texture_reg.py:41-45)."""
    from harp_tpu.ops.numerics import safe_norm

    diff = safe_norm(
        normal_map - jnp.asarray([0.0, 0.0, 1.0], normal_map.dtype), axis=-1
    ) / 3.0
    return diff.mean()


def normal_reg(normal_map: jnp.ndarray, key, std: float = 2.0,
               uv_mask: jnp.ndarray | None = None,
               offsets: jnp.ndarray | None = None) -> jnp.ndarray:
    """0.2 * close-to-flat + local smoothness (texture_reg.py:33-38)."""
    return 0.2 * close_to_z_reg(normal_map) + smooth_texture_reg(
        normal_map, key, std=std, uv_mask=uv_mask, offsets=offsets
    )
