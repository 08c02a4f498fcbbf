"""Evaluation metrics (reference utils/eval_util.py equivalents, in JAX).

- Silhouette IoU, image L1: direct ports (eval_util.py:34-49).
- SSIM / MS-SSIM: standard Wang et al. formulation matching pytorch_msssim
  defaults (data_range=1, 11x11 Gaussian sigma=1.5, K=(0.01, 0.03); MS
  weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]).
- perceptual_distance: LPIPS-style layer-wise unit-normalized feature
  distance over our VGG16 features. The reference uses lpips(net='alex')
  with learned linear weights; without its weights this uses uniform layer
  weighting — monotonically comparable, flagged via `source`.
- align_w_scale / EvalUtil (PCK, AUC): numpy ports (eval_util.py:73-235).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from harp_tpu.losses.perceptual import Vgg16Features


def iou_per_frame(ref_masks: jnp.ndarray, pred_masks: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) masks -> (B,) IoU at the 0.5 threshold. jit-safe — the
    device-side body of sil_iou, used by the fused eval pass."""
    ref_b = ref_masks >= 0.5
    pred_b = pred_masks >= 0.5
    union = (ref_b | pred_b).sum(axis=(1, 2))
    inter = (ref_b & pred_b).sum(axis=(1, 2))
    return inter / jnp.maximum(union, 1)


def l1_per_frame(ref_images: jnp.ndarray, pred_images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B,) mean absolute difference per frame (jit-safe)."""
    return jnp.abs(ref_images - pred_images).mean(axis=(1, 2, 3))


def sil_iou(ref_masks, pred_masks) -> float:
    return float(np.mean(np.asarray(
        iou_per_frame(jnp.asarray(ref_masks), jnp.asarray(pred_masks))
    )))


def l1_diff(ref_images, pred_images) -> float:
    return float(np.abs(np.asarray(ref_images) - np.asarray(pred_images)).mean())


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2d(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid-mode 2D filter; img (B, H, W, C)."""
    C = img.shape[-1]
    k = jnp.tile(win[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _ssim_parts(x, y, data_range=1.0, win_size=11, sigma=1.5, k1=0.01, k2=0.03):
    win = _gaussian_window(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d(x, win)
    mu_y = _filter2d(y, win)
    sxx = _filter2d(x * x, win) - mu_x**2
    syy = _filter2d(y * y, win) - mu_y**2
    sxy = _filter2d(x * y, win) - mu_x * mu_y
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs
    return ssim_map.mean(axis=(1, 2, 3)), cs.mean(axis=(1, 2, 3))


def ssim(x, y, data_range: float = 1.0) -> float:
    """x, y: (B, H, W, C) in [0, data_range]."""
    s, _ = _ssim_parts(jnp.asarray(x), jnp.asarray(y), data_range)
    return float(s.mean())


MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim_per_frame(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
                      weights=MS_SSIM_WEIGHTS, win_size: int = 11) -> jnp.ndarray:
    """(B, H, W, C) -> (B,) MS-SSIM (jit-safe; shape logic is static)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    # Use only scales where the downsampled image still fits the window
    # (pytorch_msssim instead asserts a minimum size); renormalize weights.
    min_side = min(x.shape[1], x.shape[2])
    n_scales = 1
    while n_scales < len(weights) and (min_side >> n_scales) >= win_size:
        n_scales += 1
    if n_scales < len(weights):
        w = np.asarray(weights[:n_scales])
        weights = tuple(w / w.sum())
    vals = []
    for i, w in enumerate(weights):
        s, cs = _ssim_parts(x, y, data_range)
        vals.append(s if i == len(weights) - 1 else cs)
        if i < len(weights) - 1:
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            y = jax.lax.reduce_window(
                y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    vals = jnp.stack([jax.nn.relu(v) for v in vals])  # (L, B)
    return jnp.prod(vals ** jnp.asarray(weights)[:, None], axis=0)


def ms_ssim(x, y, data_range: float = 1.0, weights=MS_SSIM_WEIGHTS,
            win_size: int = 11) -> float:
    return float(ms_ssim_per_frame(x, y, data_range, weights, win_size).mean())


def perceptual_per_frame(vgg: Vgg16Features, x: jnp.ndarray,
                         y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B,) LPIPS-style distance (jit-safe, one group):
    unit-normalize features per channel, mean squared difference per layer,
    summed (uniform layer weights). The caller chunks the batch — every
    pyramid slice of the group is live at once."""
    fx = vgg.slices(x)[1:]
    fy = vgg.slices(y)[1:]
    total = 0.0
    for a, b in zip(fx, fy):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
        total = total + ((an - bn) ** 2).sum(-1).mean(axis=(1, 2))
    return total


def perceptual_distance(vgg: Vgg16Features, x, y, chunk: int = 8) -> float:
    """Mean LPIPS-style distance over the batch.

    Frames are processed in `chunk`-sized groups: holding every pyramid
    slice of a 64-frame eval batch live costs ~13 GB per side at 448^2 —
    chunking is exact (the metric is a mean of per-frame values)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    per_frame = []
    for s in range(0, x.shape[0], max(int(chunk), 1)):
        per_frame.append(
            np.asarray(perceptual_per_frame(vgg, x[s:s + chunk], y[s:s + chunk]))
        )
    return float(np.concatenate(per_frame).mean())


def image_eval(images_for_eval: dict, vgg: Vgg16Features | None = None) -> dict:
    """Batch evaluation dict -> metric dict (reference eval_util.image_eval)."""
    ref_img = np.concatenate([np.asarray(v) for v in images_for_eval["ref_image"]], 0) \
        if isinstance(images_for_eval["ref_image"], list) else np.asarray(images_for_eval["ref_image"])
    pred_img = np.concatenate([np.asarray(v) for v in images_for_eval["pred_image"]], 0) \
        if isinstance(images_for_eval["pred_image"], list) else np.asarray(images_for_eval["pred_image"])
    ref_mask = np.concatenate([np.asarray(v) for v in images_for_eval["ref_mask"]], 0) \
        if isinstance(images_for_eval["ref_mask"], list) else np.asarray(images_for_eval["ref_mask"])
    pred_mask = np.concatenate([np.asarray(v) for v in images_for_eval["pred_mask"]], 0) \
        if isinstance(images_for_eval["pred_mask"], list) else np.asarray(images_for_eval["pred_mask"])
    if vgg is None:
        vgg = Vgg16Features.create()
    # Honest naming: only call the metric LPIPS when real pretrained VGG
    # weights are loaded (scripts/import_vgg16_weights.py). With random
    # filters it is a perceptual proxy, NOT comparable to reference
    # lpips-alex numbers (eval_util.py:51-53).
    perc_key = "LPIPS" if vgg.source == "pretrained" else "LPIPS_proxy"
    return {
        "Silhouette IoU": sil_iou(ref_mask, pred_mask),
        "L1": l1_diff(ref_img, pred_img),
        perc_key: perceptual_distance(vgg, ref_img, pred_img),
        "MS_SSIM": ms_ssim(ref_img, pred_img),
    }


# ---------------------------------------------------------------------------
# Procrustes alignment + PCK/AUC (numpy, reference eval_util.py:73-235)
# ---------------------------------------------------------------------------


def align_w_scale(mtx1: np.ndarray, mtx2: np.ndarray, return_trafo: bool = False):
    """Similarity-align mtx2 to mtx1 (scale + rotation + translation)."""
    from scipy.linalg import orthogonal_procrustes

    t1, t2 = mtx1.mean(0), mtx2.mean(0)
    mtx1_t = mtx1 - t1
    mtx2_t = mtx2 - t2
    s1 = np.linalg.norm(mtx1_t) + 1e-8
    mtx1_t = mtx1_t / s1
    s2 = np.linalg.norm(mtx2_t) + 1e-8
    mtx2_t = mtx2_t / s2
    R, s = orthogonal_procrustes(mtx1_t, mtx2_t)
    if return_trafo:
        return R, s, s1, t1 - t2
    return (mtx2_t @ R.T) * s * s1 + t1


def align_by_trafo(mtx: np.ndarray, trafo):
    t2 = mtx.mean(0)
    R, s, s1, t1 = trafo
    return ((mtx - t2) @ R.T) * s * s1 + t1 + t2


class EvalUtil:
    """Keypoint PCK / AUC / EPE accumulator."""

    def __init__(self, num_kp: int = 21):
        self.data = [[] for _ in range(num_kp)]
        self.num_kp = num_kp

    def feed(self, keypoint_gt, keypoint_vis, keypoint_pred):
        keypoint_gt = np.squeeze(keypoint_gt)
        keypoint_pred = np.squeeze(keypoint_pred)
        keypoint_vis = np.squeeze(keypoint_vis).astype(bool)
        dist = np.linalg.norm(keypoint_gt - keypoint_pred, axis=1)
        for i in range(self.num_kp):
            if keypoint_vis[i]:
                self.data[i].append(dist[i])

    def get_measures(self, val_min: float, val_max: float, steps: int):
        thresholds = np.linspace(val_min, val_max, steps)
        norm = np.trapezoid(np.ones_like(thresholds), thresholds)
        epe_mean, epe_median, auc_all, pck_curves = [], [], [], []
        for part in self.data:
            if not part:
                continue
            arr = np.asarray(part)
            epe_mean.append(arr.mean())
            epe_median.append(np.median(arr))
            pck = np.asarray([(arr <= t).mean() for t in thresholds])
            pck_curves.append(pck)
            auc_all.append(np.trapezoid(pck, thresholds) / norm)
        return (
            float(np.mean(epe_mean)),
            float(np.mean(epe_median)),
            float(np.mean(auc_all)),
            np.mean(pck_curves, 0),
            thresholds,
        )


def procrustes_joint_error(gt_joints_mm: np.ndarray, pred_joints_mm: np.ndarray,
                           valid=None) -> float:
    """Mean Procrustes-aligned joint error in mm for one frame
    (eval_util.eval_procrustes semantics: root-align, drop invalid joints,
    similarity-align, mean euclidean error)."""
    gt = np.asarray(gt_joints_mm)
    pred = np.asarray(pred_joints_mm)
    gt = gt - gt[0:1]
    pred = pred - pred[0:1]
    if valid is not None:
        v = np.asarray(valid).astype(bool)
        gt, pred = gt[v], pred[v]
    if len(gt) == 0:
        return float("nan")
    aligned = align_w_scale(gt, pred)
    return float(np.linalg.norm(gt - aligned, axis=1).mean())
