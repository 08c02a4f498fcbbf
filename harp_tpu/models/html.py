"""HTML texture-basis appearance model (reference model_type='html').

The reference drives an external package (htmlpth, utils/hand_model_utils.py:15-26)
whose core is a linear texture basis: a UV texture is mean + basis @ coeffs
(101 coefficients). This module implements that math natively; the actual
basis arrays load from the (license-gated) HTML release when available, and
a deterministic synthetic basis is provided for tests.
"""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TextureBasis:
    """Linear texture model: texture(c) = reshape(mean + basis @ c)."""

    mean: np.ndarray  # (H*W*3,)
    basis: np.ndarray  # (H*W*3, K)
    shape: tuple  # (H, W, 3)

    @property
    def num_coeffs(self) -> int:
        return self.basis.shape[1]

    def texture(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(K,) or (B, K) coeffs -> (H, W, 3) or (B, H, W, 3) texture."""
        flat = jnp.asarray(self.mean) + coeffs @ jnp.asarray(self.basis).T
        return flat.reshape(coeffs.shape[:-1] + self.shape)


def load_html_basis(tex_model_path: str, texture_shape=(1024, 1024, 3),
                    num_coeffs: int = 101) -> TextureBasis:
    """Load the HTML release's texture model pkl (keys 'mean'/'basis', layout
    per the HTML 2020 release)."""
    with open(tex_model_path, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    mean = np.asarray(d["mean"], np.float32).reshape(-1)
    basis = np.asarray(d["basis"], np.float32)
    if basis.shape[0] != mean.shape[0]:
        basis = basis.T
    return TextureBasis(mean=mean, basis=basis[:, :num_coeffs], shape=texture_shape)


def synthetic_texture_basis(size: int = 64, num_coeffs: int = 16,
                            seed: int = 0) -> TextureBasis:
    """Deterministic low-frequency basis for tests."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    mean = np.tile([0.8, 0.6, 0.55], (size, size, 1)).astype(np.float32)
    modes = []
    for k in range(num_coeffs):
        fy, fx = rng.uniform(1, 6, 2)
        ph = rng.uniform(0, 6.28, 2)
        field = 0.1 * np.sin(2 * np.pi * fy * yy + ph[0]) * np.cos(2 * np.pi * fx * xx + ph[1])
        color = rng.randn(3) * 0.5
        modes.append((field[..., None] * color).astype(np.float32).reshape(-1))
    return TextureBasis(
        mean=mean.reshape(-1), basis=np.stack(modes, 1), shape=(size, size, 3)
    )
