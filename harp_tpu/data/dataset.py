"""Real-sequence data pipeline (reference utils/data_util.py semantics).

Directory layout consumed (identical to the reference so preprocessed data
is interchangeable):

  {metro_output_dir}/{seq}/metro_mano[_smooth]/%04d_mano.pkl
      keys: joints, verts, rot, pose, shape, trans, cam
  {image_dir}/{seq}/unscreen_cropped/%04d.jpg
  {image_dir}/{seq}/mask/%04d_mask.jpg

TPU-native difference: instead of a 20-worker torch DataLoader feeding
per-step host->device copies, the entire sequence is decoded once into
stacked arrays and device_put (448^2 RGB f32 is ~2.4 MB/frame — whole
sequences fit in HBM comfortably), making minibatching a device-side gather.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from harp_tpu.data.synthetic import erode_mask


def load_frame_pkl(path: str) -> dict:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return {k: np.asarray(v) for k, v in d.items() if k != "seq"}


def save_frame_pkl(path: str, params: dict, idx: int) -> None:
    """Write one frame's fitted params in the reference's per-frame schema
    (hand_utils.write_pkl): batch-1 arrays except 'cam'."""
    out = {}
    for k, v in params.items():
        v = np.asarray(v)
        out[k] = v[idx] if k == "cam" else v[idx, None]
    with open(path, "wb") as f:
        pickle.dump(out, f)


def _load_image(path: str, mask: bool = False) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if mask:
        return np.asarray(img.convert("L"), np.float32) / 255.0
    return np.asarray(img.convert("RGB"), np.float32) / 255.0


def load_sequences(metro_output_dir: str, image_dir: str, seq_list,
                   use_smooth_seq: bool = True,
                   average_cam_sequence: bool = False,
                   model_type: str = "harp",
                   use_native: bool = True):
    """Load and stack a list of sequences.

    Returns (mano_params, images, masks, masks_eroded) with every array
    stacked over the concatenated frame axis, matching the reference's
    combine_dict_to_batch layout (data_util.py:54-73).

    use_native: decode JPEGs and erode masks through the threaded C++
    frameloader (harp_tpu/native/frameloader.cpp — the replacement for the
    reference's 20-worker DataLoader, optimize_sequence.py:399); falls back
    to the PIL path automatically when the extension is unavailable.
    """
    import jax.numpy as jnp

    folder = "metro_mano_smooth" if use_smooth_seq else "metro_mano"
    if model_type == "nimble":
        folder = "nimble_" + folder

    entries = []
    for seq in seq_list:
        d = os.path.join(metro_output_dir, str(seq), folder)
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".pkl"):
                entries.append((str(seq), fn[:-9]))  # strip "_mano.pkl"
    entries.sort()

    mano_list, img_paths, mask_paths, cam_by_seq = [], [], [], {}
    for seq, name in entries:
        p = load_frame_pkl(os.path.join(metro_output_dir, seq, folder, name + "_mano.pkl"))
        p["seq"] = seq
        cam_by_seq.setdefault(seq, []).append(p["cam"])
        mano_list.append(p)
        img_paths.append(os.path.join(image_dir, seq, "unscreen_cropped", name + ".jpg"))
        mask_paths.append(os.path.join(image_dir, seq, "mask", name + "_mask.jpg"))

    if average_cam_sequence:
        avg = {s: np.mean(np.stack(v), axis=0) for s, v in cam_by_seq.items()}
        for p in mano_list:
            p["cam"] = avg[p["seq"]]

    keys = [k for k in mano_list[0] if k != "seq"]
    mano_params = {}
    for k in keys:
        rows = [
            p[k] if k == "cam" else np.asarray(p[k]).squeeze(0) for p in mano_list
        ]
        mano_params[k] = np.stack(rows).astype(np.float32)

    native = None
    if use_native:
        from harp_tpu.native import load_frameloader

        native = load_frameloader()
    if native is not None:
        from harp_tpu.native import decode_jpeg_batch, erode_masks

        images = decode_jpeg_batch(img_paths)  # float32 in [0,1]
        masks = decode_jpeg_batch(mask_paths, gray=True)
        masks_eroded = erode_masks(masks, iterations=2)
        return mano_params, images, masks, masks_eroded
    images = np.stack([_load_image(p) for p in img_paths])
    masks = np.stack([_load_image(p, mask=True) for p in mask_paths])
    masks_j = jnp.asarray(masks)
    masks_eroded = np.asarray(erode_mask(masks_j))
    return mano_params, images, masks, masks_eroded
