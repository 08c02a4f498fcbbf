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
    """Feature-pyramid extractor; `params` is a tuple of (w, b) numpy pairs.

    compute_dtype: dtype the conv pyramid runs in. "bfloat16" doubles MXU
    throughput and halves activation HBM vs f32 (the convs are pure matmul
    work; the MXU accumulates in f32 either way). Loss reductions over the
    features always accumulate in f32 regardless (see _feature_abs_sum).
    The raw-image pyramid slice keeps the input dtype."""

    params: tuple
    layers_weights: tuple = (1.0, 1 / 16, 1 / 8, 1 / 4, 1.0)
    source: str = "random"
    compute_dtype: str = "float32"

    @classmethod
    def create(cls, weights_path: str | None = None, seed: int = 0,
               layers_weights=(1.0, 1 / 16, 1 / 8, 1 / 4, 1.0),
               compute_dtype: str = "float32"):
        if weights_path:
            return cls(tuple(load_vgg16_npz(weights_path)),
                       tuple(layers_weights), "pretrained", compute_dtype)
        return cls(tuple(_init_weights(seed)), tuple(layers_weights),
                   "random", compute_dtype)

    def slices(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: (B, H, W, 3) in [0,1] -> [x, relu1_2, relu2_2, relu3_3, relu4_3]."""
        dt = jnp.dtype(self.compute_dtype)
        feats = [x]
        h = x.astype(dt)
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
                    h, jnp.asarray(w, dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.asarray(b, dt)
                h = jax.nn.relu(h)
            feats.append(h)
        return feats


def _feature_abs_sum(vgg: Vgg16Features, pred: jnp.ndarray, true: jnp.ndarray):
    """Weighted sum of |feat(pred) - feat(true)| over all pyramid slices
    (no normalization — the caller divides by the static feature count)."""
    fp = vgg.slices(pred)
    ft = vgg.slices(true)
    total_abs = 0.0
    for w, a, b in zip(vgg.layers_weights, fp, ft):
        # f32 accumulation: a bf16 sum over millions of feature elements
        # would lose ~3 decimal digits (XLA fuses the cast into the
        # reduction, so this costs nothing).
        total_abs = total_abs + w * jnp.abs(a - b).sum(dtype=jnp.float32)
    return total_abs


def _feature_count_per_frame(vgg: Vgg16Features, h: int, wdt: int) -> int:
    """Static element count of one frame's feature pyramid (for the L1 mean)."""
    n = h * wdt * 3  # the raw image slice
    ch_per_slice = [64, 128, 256, 512]
    for si, c in enumerate(ch_per_slice):
        sh, sw = h // (2 ** si), wdt // (2 ** si)
        n += sh * sw * c
    return n


def precompute_slices(vgg: Vgg16Features, images: jnp.ndarray,
                      chunk: int | None = 6,
                      dtype=None) -> tuple:
    """Per-frame GT feature pyramids for the whole sequence, computed once.

    The GT side of the perceptual loss (reference model/vgg.py:40-55 — the
    masked ground-truth frame) is a constant per frame, yet the reference
    recomputes its VGG forward every step. Returns a tuple of (N, h, w, c)
    arrays (one per pyramid slice, incl. the raw image slice) stored in
    `dtype` (bf16 halves the HBM cost: ~49 MB/frame at 448² vs 99 MB f32).
    `images` must already be masked exactly as the loss masks them.
    Chunked over frame groups so the precompute never holds more than one
    group's f32 pyramid live.

    dtype defaults to the vgg's compute_dtype so an f32
    (reference-semantics) pipeline caches f32 GT features — a bf16 cache
    under f32 compute would silently train against rounded GT."""
    if dtype is None:
        dtype = jnp.dtype(vgg.compute_dtype)
    N = images.shape[0]
    if not chunk or chunk >= N:
        return tuple(s.astype(dtype) for s in vgg.slices(images))
    c = max(d for d in range(1, int(chunk) + 1) if N % d == 0)
    grouped = images.reshape((N // c, c) + images.shape[1:])
    outs = jax.lax.map(
        lambda x: tuple(s.astype(dtype) for s in vgg.slices(x)), grouped
    )
    return tuple(o.reshape((N,) + o.shape[2:]) for o in outs)


def vgg_feature_l1_cached(vgg: Vgg16Features, pred: jnp.ndarray,
                          gt_slices: tuple, fids: jnp.ndarray,
                          chunk: int | None = None,
                          remat: bool = True) -> jnp.ndarray:
    """vgg_feature_l1 against precomputed GT pyramids (precompute_slices).

    Only the pred-side VGG forward runs in the step; the GT side is a
    per-slice gather `gt[fids]`. With the default bf16 cache the loss
    differs from the recomputed-GT value only by the bf16 rounding of the
    GT features (~1e-3 relative — pinned by tests/test_perceptual.py);
    gradients w.r.t. pred take the sign of (pred_feat - gt_feat), so they
    match wherever the difference exceeds that rounding."""
    B = pred.shape[0]
    total_n = _feature_count_per_frame(vgg, pred.shape[1], pred.shape[2]) * B

    def absum(pred_c, fids_c):
        fp = vgg.slices(pred_c)
        total = 0.0
        for w, a, g in zip(vgg.layers_weights, fp, gt_slices):
            total = total + w * jnp.abs(
                a - g[fids_c].astype(a.dtype)
            ).sum(dtype=jnp.float32)
        return total

    if not chunk or chunk >= B:
        body = jax.checkpoint(absum) if remat else absum
        return body(pred, fids) / total_n
    c = max(d for d in range(1, int(chunk) + 1) if B % d == 0)
    pr = pred.reshape((B // c, c) + pred.shape[1:])
    fr = fids.reshape(B // c, c)
    # remat=False keeps each chunk's activations for the backward instead
    # of recomputing the pred-side forward (the bf16 pyramid is small
    # enough: ~25 MB/frame of residuals vs a whole extra VGG forward).
    body = lambda pt: absum(pt[0], pt[1])
    if remat:
        body = jax.checkpoint(body)
    sums = jax.lax.map(body, (pr, fr))
    return sums.sum() / total_n


def vgg_feature_l1(vgg: Vgg16Features, pred: jnp.ndarray, true: jnp.ndarray,
                   chunk: int | None = None,
                   remat: bool = True) -> jnp.ndarray:
    """L1 over the weighted concatenated feature vector (model/vgg.py:40-55 +
    torch.nn.L1Loss mean semantics), computed slice-wise without
    materializing the concatenation.

    chunk: process the batch in `chunk`-frame groups through a
    lax.map(jax.checkpoint(...)) — EXACT (the loss is a sum over frames)
    but bounds the live activation set to one group's pyramid instead of
    the whole batch's. At 448^2 x B18 the unchunked loss costs ~10 GB of
    activation temps inside the train step (the whole step measured 13.1 GB
    — it only ever fit on an otherwise-empty 16 GB v5e and crashed the TPU
    worker once other programs' code accumulated); chunk=6 brings the step
    to ~4 GB. If B is not divisible, the largest divisor <= chunk is used."""
    B = pred.shape[0]
    total_n = _feature_count_per_frame(vgg, pred.shape[1], pred.shape[2]) * B
    if not chunk or chunk >= B:
        # remat applies on the unchunked path too, so vgg_remat=True bounds
        # HBM regardless of whether chunking kicked in (advisor r3).
        body = lambda p, t: _feature_abs_sum(vgg, p, t)
        if remat:
            body = jax.checkpoint(body)
        return body(pred, true) / total_n
    c = max(d for d in range(1, int(chunk) + 1) if B % d == 0)
    n = B // c
    pr = pred.reshape((n, c) + pred.shape[1:])
    tr = true.reshape((n, c) + true.shape[1:])
    body = lambda pt: _feature_abs_sum(vgg, pt[0], pt[1])
    if remat:
        body = jax.checkpoint(body)
    sums = jax.lax.map(body, (pr, tr))
    return sums.sum() / total_n
