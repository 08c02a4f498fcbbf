"""U-Net (reference model/unet_model.py + unet_parts.py — dormant there,
included for capability parity).

A standard double-conv U-Net with optional latent broadcast at the
bottleneck, as pure JAX functions over an explicit parameter pytree (NHWC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv_params(rng, cin, cout, k=3):
    w = rng.randn(k, k, cin, cout).astype(np.float32) * np.sqrt(2.0 / (k * k * cin))
    return {"w": w, "b": np.zeros(cout, np.float32)}


def init_unet(in_ch: int = 3, out_ch: int = 3, base: int = 32,
              latent_dim: int = 0, seed: int = 0):
    rng = np.random.RandomState(seed)
    chans = [base, base * 2, base * 4, base * 8]
    params = {"enc": [], "dec": [], "latent_dim": latent_dim}
    cin = in_ch
    for c in chans:
        params["enc"].append(
            {"c1": _conv_params(rng, cin, c), "c2": _conv_params(rng, c, c)}
        )
        cin = c
    bott_in = chans[-1] + latent_dim
    params["bott"] = {
        "c1": _conv_params(rng, bott_in, chans[-1]),
        "c2": _conv_params(rng, chans[-1], chans[-1]),
    }
    cin = chans[-1]
    for c in reversed(chans):
        params["dec"].append(
            {"c1": _conv_params(rng, cin + c, c), "c2": _conv_params(rng, c, c)}
        )
        cin = c
    params["head"] = _conv_params(rng, cin, out_ch, k=1)
    return params


def _conv(p, x):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(p["b"])


def _double_conv(block, x):
    x = jax.nn.relu(_conv(block["c1"], x))
    return jax.nn.relu(_conv(block["c2"], x))


def _down(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _up(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")


def unet_forward(params, x: jnp.ndarray, latent: jnp.ndarray | None = None):
    """x: (B, H, W, in_ch); latent: (B, latent_dim) broadcast at bottleneck."""
    skips = []
    h = x
    for block in params["enc"]:
        h = _double_conv(block, h)
        skips.append(h)
        h = _down(h)
    if params["latent_dim"]:
        z = jnp.broadcast_to(
            latent[:, None, None, :], h.shape[:3] + (params["latent_dim"],)
        )
        h = jnp.concatenate([h, z], axis=-1)
    h = _double_conv(params["bott"], h)
    for block, skip in zip(params["dec"], reversed(skips)):
        h = _up(h)
        h = jnp.concatenate([h, skip], axis=-1)
        h = _double_conv(block, h)
    return _conv(params["head"], h)
