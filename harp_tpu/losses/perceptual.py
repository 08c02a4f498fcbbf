"""VGG16 perceptual features in JAX (reference model/vgg.py:10-55).

The reference extracts torchvision-VGG16 activations at relu1_2 / relu2_2 /
relu3_3 / relu4_3, concatenates them (weighted, with the raw image) and takes
an L1 between pred/true feature vectors. This module reimplements the network
(conv3x3 stacks + maxpool, NHWC) so the loss is pure JAX:

- weights load from an .npz (13 conv layers, torchvision parameter layout
  converted to HWIO) when available;
- otherwise deterministic He-initialized random filters are used. Random
  VGG-architecture features are a standard perceptual-loss proxy; the
  structure (multi-scale, local) is what drives the loss. The choice is
  recorded in `source` for observability.

Inputs are (B, H, W, 3) in [0,1]; like the reference, no ImageNet
normalization is applied before the network.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Channel widths of the 13 VGG16 conv layers; 'M' marks maxpool.
VGG16_LAYOUT = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M"]
# Conv counts per feature slice (through relu1_2, relu2_2, relu3_3, relu4_3).
SLICE_CONVS = [2, 2, 3, 3]


def _init_weights(seed: int = 0):
    rng = np.random.RandomState(seed)
    params = []
    cin = 3
    for item in VGG16_LAYOUT:
        if item == "M":
            continue
        cout = int(item)
        fan_in = 3 * 3 * cin
        w = rng.randn(3, 3, cin, cout).astype(np.float32) * np.sqrt(2.0 / fan_in)
        b = np.zeros(cout, np.float32)
        params.append((w, b))
        cin = cout
    return params


N_CONVS = sum(1 for x in VGG16_LAYOUT if x != "M")  # 10: through relu4_3


def load_vgg16_npz(path: str):
    """Load conv weights from an npz with keys w0..wN / b0..bN in HWIO.

    Only the first N_CONVS (10, through relu4_3) are read — the feature
    pyramid stops at relu4_3 like the reference (model/vgg.py:16-23), so an
    npz holding all 13 VGG16 convs also works."""
    data = np.load(path)
    return [(data[f"w{i}"], data[f"b{i}"]) for i in range(N_CONVS)]


@dataclasses.dataclass(frozen=True)
class Vgg16Features:
    """Feature-pyramid extractor; `params` is a tuple of (w, b) numpy pairs."""

    params: tuple
    layers_weights: tuple = (1.0, 1 / 16, 1 / 8, 1 / 4, 1.0)
    source: str = "random"

    @classmethod
    def create(cls, weights_path: str | None = None, seed: int = 0,
               layers_weights=(1.0, 1 / 16, 1 / 8, 1 / 4, 1.0)):
        if weights_path:
            return cls(tuple(load_vgg16_npz(weights_path)),
                       tuple(layers_weights), "pretrained")
        return cls(tuple(_init_weights(seed)), tuple(layers_weights), "random")

    def slices(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (B, H, W, 3) in [0,1] -> [x, relu1_2, relu2_2, relu3_3, relu4_3]."""
        feats = [x]
        h = x
        li = 0
        for si, n_convs in enumerate(SLICE_CONVS):
            if si > 0:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
            for _ in range(n_convs):
                w, b = self.params[li]
                li += 1
                h = jax.lax.conv_general_dilated(
                    h, jnp.asarray(w), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(b)
                h = jax.nn.relu(h)
            feats.append(h)
        return feats


def vgg_feature_l1(vgg: Vgg16Features, pred: jnp.ndarray, true: jnp.ndarray) -> jnp.ndarray:
    """L1 over the weighted concatenated feature vector (model/vgg.py:40-55 +
    torch.nn.L1Loss mean semantics), computed slice-wise without
    materializing the concatenation."""
    fp = vgg.slices(pred)
    ft = vgg.slices(true)
    total_abs = 0.0
    total_n = 0
    for w, a, b in zip(vgg.layers_weights, fp, ft):
        total_abs = total_abs + w * jnp.abs(a - b).sum()
        total_n += int(np.prod(a.shape[1:])) * a.shape[0]
    return total_abs / total_n
