"""Convert pretrained VGG16 weights to the harp_tpu npz layout.

The build environment has no network egress and ships no pretrained
checkpoints, so this converter is the supported path for users who have the
standard torchvision checkpoint:

    vgg16-397923af.pth   (https://download.pytorch.org/models/vgg16-397923af.pth;
    per torchvision convention the filename suffix 397923af is the leading
    8 hex digits of the file's sha256 — verify after download)

Usage:
    python scripts/import_vgg16_weights.py /path/to/vgg16-397923af.pth \
        [out.npz]                       # default: assets/vgg16_weights.npz

The output npz has keys w0..w12 / b0..b12, conv filters in HWIO layout, as
read by harp_tpu.losses.perceptual.load_vgg16_npz. Pass its path as
`HarpConfig.vgg_weights` (or --vgg-weights on fit_avatar.py); the loss and
eval then report source="pretrained" and the metric key becomes LPIPS.

A golden activation test (tests/test_vgg_pretrained.py) runs automatically
when the default output path exists.
"""
import os
import sys

import numpy as np


def convert(pth_path: str, out_path: str) -> None:
    import torch

    state = torch.load(pth_path, map_location="cpu", weights_only=True)
    # torchvision layout: features.{idx}.weight / .bias for conv layers at
    # indices 0,2,5,7,10,12,14,17,19,21,24,26,28 (OIHW).
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    out = {}
    for i, ci in enumerate(conv_idx):
        w = state[f"features.{ci}.weight"].numpy()  # (O, I, H, W)
        b = state[f"features.{ci}.bias"].numpy()
        out[f"w{i}"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # HWIO
        out[f"b{i}"] = b.astype(np.float32)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB)")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "vgg16_weights.npz",
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    convert(sys.argv[1], dst)
