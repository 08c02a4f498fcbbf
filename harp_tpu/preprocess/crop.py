"""Raw-frame crop / mask extraction (the ingest step before METRO).

Replicates the reference's Unscreen preprocessing
(metro_modifications/end2end_inference_handmesh.py:95-115,156-186): frames
arrive as RGBA where the background was removed (empty alpha); the alpha
channel IS the segmentation mask. Each frame is resized so its short side is
448, center-cropped to 448², and the RGB is composited onto a white
background through the (resized) soft mask. Outputs land in exactly the
layout harp_tpu.data.dataset.load_sequence reads:

  {out_root}/unscreen_cropped/%04d.jpg   white-background cropped RGB
  {out_root}/mask/%04d_mask.jpg          cropped 8-bit mask

This is pure host-side image IO — there is no device work to map to the
TPU; the heavy decode path at fit time is the native frameloader.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

RESOLUTION = 448  # end2end_inference_handmesh.py:54


def resize_center_crop(img: Image.Image, res: int = RESOLUTION) -> Image.Image:
    """torchvision Resize(res) + CenterCrop(res) semantics
    (end2end_inference_handmesh.py:55-58): bilinear resize of the SHORT side
    to `res` (long side = int(res * long / short)), then a centered crop
    with int(round((dim - res) / 2)) offsets."""
    w, h = img.size
    if w <= h:
        nw, nh = res, int(res * h / w)
    else:
        nw, nh = int(res * w / h), res
    img = img.resize((nw, nh), Image.BILINEAR)
    left = int(round((nw - res) / 2.0))
    top = int(round((nh - res) / 2.0))
    return img.crop((left, top, left + res, top + res))


def fill_img_background(rgb: Image.Image, mask: Image.Image) -> Image.Image:
    """Composite onto white through an 8-bit (soft) mask
    (end2end_inference_handmesh.py:95-101)."""
    background = Image.new("RGB", rgb.size, (255, 255, 255))
    background.paste(rgb, mask=mask)
    return background


def list_frames(image_dir: str) -> list[str]:
    """png/jpg frames, excluding 'pred'/'mask' files, sorted — the
    reference's listing filter (end2end_inference_handmesh.py:176-186)."""
    out = []
    for filename in os.listdir(image_dir):
        if ((filename.endswith(".png") or filename.endswith(".jpg"))
                and "pred" not in filename and "mask" not in filename):
            out.append(os.path.join(image_dir, filename))
    out.sort()
    return out


def frame_index(path: str) -> int:
    """idx = int(basename[-8:-4]) (end2end_inference_handmesh.py:185)."""
    return int(os.path.basename(path)[-8:-4])


def crop_frame(unscreen_path: str, ori_path: str | None = None,
               res: int = RESOLUTION) -> tuple[np.ndarray, np.ndarray]:
    """One frame: RGBA unscreen -> (cropped white-bg RGB u8, cropped mask u8).

    ori_path: the original full-size frame the RGB is taken from
    (save_cropped_image reads ori_img_dir/%04d.png); falls back to the
    unscreen frame's own RGB when absent."""
    img = Image.open(unscreen_path)
    if img.mode != "RGBA":
        img = img.convert("RGBA")
    alpha = img.split()[3]
    mask = resize_center_crop(alpha, res)

    if ori_path is not None and os.path.exists(ori_path):
        full = Image.open(ori_path).convert("RGB")
    else:
        full = img.convert("RGB")
    full = resize_center_crop(full, res)
    rgb = fill_img_background(full, mask)
    return np.asarray(rgb), np.asarray(mask)


def crop_unscreen_sequence(unscreen_dir: str, out_root: str,
                           ori_img_dir: str | None = None,
                           res: int = RESOLUTION,
                           skip_if_done: bool = True) -> int:
    """Crop a whole sequence into the ingest layout. Returns frame count.

    Mirrors the do_crop block (end2end_inference_handmesh.py:156-186)
    including its skip-if-cropped-dir-exists behavior."""
    cropped_dir = os.path.join(out_root, "unscreen_cropped")
    mask_dir = os.path.join(out_root, "mask")
    if skip_if_done and os.path.isdir(cropped_dir) and os.listdir(cropped_dir):
        return len(os.listdir(cropped_dir))
    os.makedirs(cropped_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)

    frames = list_frames(unscreen_dir)
    for path in frames:
        idx = frame_index(path)
        ori = (os.path.join(ori_img_dir, "%04d.png" % idx)
               if ori_img_dir else None)
        rgb, mask = crop_frame(path, ori, res)
        Image.fromarray(rgb).save(
            os.path.join(cropped_dir, "%04d.jpg" % idx), quality=95
        )
        Image.fromarray(mask).save(
            os.path.join(mask_dir, "%04d_mask.jpg" % idx), quality=95
        )
    return len(frames)
