"""Numerically-safe primitives.

jnp.linalg.norm has a NaN gradient at exactly 0 (d sqrt(x)/dx -> inf, times
zero cotangent). torch defines a zero subgradient there, and the reference
relies on that (e.g. root-aligned keypoint error is exactly 0 at the root
joint every step). These helpers give the torch behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_norm(x: jnp.ndarray, axis=-1, keepdims: bool = False,
              eps: float = 1e-24) -> jnp.ndarray:
    """L2 norm with zero gradient at x == 0 (clamped inside the sqrt)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, eps))


def safe_normalize(x: jnp.ndarray, axis=-1, eps: float = 1e-24) -> jnp.ndarray:
    """x / ||x|| with zero output (and finite gradient) at x == 0."""
    return x / safe_norm(x, axis=axis, keepdims=True, eps=eps)
