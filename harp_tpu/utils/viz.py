"""Visualization outputs (reference utils/visualize.py + the driver's
logging composites, without matplotlib — PIL only).

Provides: 3x3 image-pair grids, red/blue silhouette overlays, per-frame
GT|pred|normal|overlay composites, 360-degree turntable renders, light
sweeps, and GIF assembly.
"""

from __future__ import annotations

import os
import glob

import numpy as np
import jax.numpy as jnp
from PIL import Image

from harp_tpu.render import pipeline
from harp_tpu.ops.rotations import axis_angle_to_matrix


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:  # already quantized (e.g. on device)
        return img
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_image(img, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = _to_uint8(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    Image.fromarray(arr).save(path)


def save_images_parallel(items, workers: int = 8) -> None:
    """Encode+write many (image, path) pairs on a thread pool. PIL's JPEG
    encoder releases the GIL, so this parallelizes well — a 300-frame
    eval spent 39.5 s writing composites serially (72.6 s at 500)."""
    from concurrent.futures import ThreadPoolExecutor

    items = list(items)
    if len(items) <= 2:
        for im, p in items:
            save_image(im, p)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        list(ex.map(lambda ip: save_image(ip[0], ip[1]), items))


def sil_overlay(true_mask, pred_mask) -> np.ndarray:
    """GT in red channel, prediction in blue (reference show_img_pair)."""
    h, w = np.asarray(true_mask).shape[:2]
    out = np.zeros((h, w, 3), np.float32)
    out[:, :, 0] = np.asarray(true_mask)
    out[:, :, 2] = np.asarray(pred_mask)
    return out


def image_grid(images, rows: int = 3, cols: int = 3) -> np.ndarray:
    """Tile up to rows*cols images into one grid (pads with black)."""
    images = [np.asarray(im) for im in images[: rows * cols]]
    h, w = images[0].shape[:2]
    c = images[0].shape[2] if images[0].ndim == 3 else 1
    grid = np.zeros((rows * h, cols * w, 3), np.float32)
    for i, im in enumerate(images):
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        r, cc = divmod(i, cols)
        grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = im[..., :3]
    return grid


def save_pair_grid(pred, true, path: str, silhouette: bool = False) -> None:
    if silhouette:
        imgs = [sil_overlay(t, p) for p, t in zip(pred, true)]
    else:
        imgs = list(np.asarray(pred))
    save_image(image_grid(imgs), path)


def frame_composite(img_true, img_pred, img_normal, mask_true, mask_pred) -> np.ndarray:
    """GT | prediction | normal render | silhouette overlay, side by side
    (reference optimize_sequence.py:742-757)."""
    overlay = sil_overlay(mask_true, mask_pred)
    return np.concatenate(
        [np.asarray(img_true), np.asarray(img_pred), np.asarray(img_normal), overlay],
        axis=1,
    )


def save_gif(in_dir: str, out_path: str, duration_ms: int = 100) -> None:
    frames = [
        Image.open(p).convert("RGB")
        for p in sorted(glob.glob(os.path.join(in_dir, "*.jpg")))
    ]
    if not frames:
        return
    frames[0].save(
        out_path, save_all=True, append_images=frames[1:],
        duration=duration_ms, loop=0,
    )


def _rotate_about_center(verts, axis: str, degrees: float):
    center = verts.mean(axis=1, keepdims=True)
    idx = {"X": 0, "Y": 1, "Z": 2}[axis]
    aa = np.zeros(3, np.float32)
    aa[idx] = np.deg2rad(degrees)
    R = axis_angle_to_matrix(jnp.asarray(aa)[None])[0]
    return (verts - center) @ R.T + center


# Keyed cache of the jitted sweep programs: rebuilding the jit closure per
# call would recompile per call, and a stable callable is what lets the
# fit's prefetch lanes warm these compiles DURING training (see
# prewarm_turntables) instead of serially heading the eval. Entries hold
# strong refs to the keyed objects so id() reuse cannot alias.
_SWEEP_CACHE: dict = {}


def _turntable_fn(assets, config, rcfg, fid: int, render_normal: bool,
                  views_per_axis: int):
    import jax

    key = ("360", id(assets), config, rcfg, fid, render_normal,
           views_per_axis)
    hit = _SWEEP_CACHE.get(key)
    if hit is not None and hit[0] is assets:
        return hit[1]
    fids = jnp.asarray([fid])

    @jax.jit
    def sweep(params):
        verts, _ = pipeline.mesh_forward(params, fids, assets, config)
        R, T = pipeline.camera_for_frames(params, fids, config)
        light = params["light_positions"][fids]
        deg = 360.0 / views_per_axis

        def step(v, axis_idx):
            v = jax.lax.cond(
                axis_idx == 0,
                lambda v: _rotate_about_center(v, "Y", deg),
                lambda v: _rotate_about_center(v, "X", deg),
                v,
            )
            if render_normal:
                img = pipeline.render_normal(v, assets, R, T, config, rcfg)
            else:
                img = pipeline.render_rgb(
                    v, assets, R, T, config, rcfg, params["texture"],
                    params["normal_map"], light,
                )
            return v, (jnp.clip(img[0], 0, 1) * 255).astype(jnp.uint8)

        axes = jnp.concatenate(
            [jnp.zeros(views_per_axis, jnp.int32),
             jnp.ones(views_per_axis, jnp.int32)]
        )
        _, imgs = jax.lax.scan(step, verts, axes)
        return imgs

    _SWEEP_CACHE[key] = (assets, sweep)
    return sweep


def _light_sweep_fn(assets, config, rcfg, fid: int, num: int, z_range):
    import jax

    key = ("light", id(assets), config, rcfg, fid, num, tuple(z_range))
    hit = _SWEEP_CACHE.get(key)
    if hit is not None and hit[0] is assets:
        return hit[1]
    fids = jnp.asarray([fid])
    zs = jnp.asarray(
        [z_range[0] + (z_range[1] - z_range[0]) / num * i for i in range(num)],
        jnp.float32,
    )

    @jax.jit
    def sweep(params):
        verts, _ = pipeline.mesh_forward(params, fids, assets, config)
        R, T = pipeline.camera_for_frames(params, fids, config)

        def step(_, z):
            light = jnp.stack([jnp.ones(()), jnp.ones(()), z])[None]
            img = pipeline.render_rgb(
                verts, assets, R, T, config, rcfg, params["texture"],
                params["normal_map"], light,
            )
            return _, (jnp.clip(img[0], 0, 1) * 255).astype(jnp.uint8)

        _, imgs = jax.lax.scan(step, 0, zs)
        return imgs

    _SWEEP_CACHE[key] = (assets, sweep)
    return sweep


# AOT-compiled sweep executables, keyed like _SWEEP_CACHE plus the input
# aval signature. Populated by prewarm_turntables; consumed by
# render_360/render_360_light when the signature matches.
_SWEEP_AOT: dict = {}


def _params_sig(params):
    import jax

    return tuple(
        (tuple(leaf.shape), str(jax.numpy.asarray(leaf).dtype))
        for leaf in jax.tree.leaves(params)
    )


def prewarm_turntables(params, assets, config, rcfg, fid: int = 0,
                       views_per_axis: int = 36, num_lights: int = 40,
                       z_range=(-5.0, 5.0)) -> None:
    """AOT-COMPILE the three sweep programs (RGB turntable, normal
    turntable, light sweep) so the post-fit eval starts from loaded
    executables. Meant for the fit's prefetch lanes: `params` may be ANY
    pytree with the final parameters' shapes.

    Compile-only on purpose: an earlier version EXECUTED the sweeps here,
    and that execution (raster temps at protocol resolution) landed
    concurrently with the first app-stage scan's ~7 GiB of temps — the
    round-5 300-frame runs crashed the TPU worker at exactly the stage-2
    boundary until the overlap was removed. Compiling/loading overlaps
    training safely; executing does not."""
    import jax

    _abs = lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                          jax.numpy.asarray(x).dtype)
    p_abs = jax.tree.map(_abs, params)
    sig = _params_sig(params)
    for kind, fn in (
        (("360", fid, False, views_per_axis),
         _turntable_fn(assets, config, rcfg, fid, False, views_per_axis)),
        (("360", fid, True, views_per_axis),
         _turntable_fn(assets, config, rcfg, fid, True, views_per_axis)),
        (("light", fid, num_lights, tuple(z_range)),
         _light_sweep_fn(assets, config, rcfg, fid, num_lights, z_range)),
    ):
        key = (kind, id(assets), config, rcfg, sig)
        if key not in _SWEEP_AOT:
            _SWEEP_AOT[key] = (assets, fn.lower(p_abs).compile())


def _sweep_exec(kind, assets, config, rcfg, params, jit_fn):
    """The prewarmed AOT executable for this sweep+signature, else the
    plain jitted fn (which compiles on first call)."""
    key = (kind, id(assets), config, rcfg, _params_sig(params))
    hit = _SWEEP_AOT.get(key)
    if hit is not None and hit[0] is assets:
        return hit[1]
    return jit_fn


def render_360(params, fid, assets, config, rcfg, out_dir: str,
               render_normal: bool = False, use_shadow: bool = False,
               views_per_axis: int = 36) -> str:
    """Turntable render: 36 x 10-degree Y-rotations then X-rotations
    (reference visualize.py:145-196), saved as jpgs + gif.

    One scanned device program: the per-view loop used to issue 72
    sequential B=1 render dispatches, each with a host sync + f32 image
    pull over the tunnel (~0.4 s/view on axon — the whole turntable pass
    dominated the fused eval by ~80 s). The rotation is a scan carry, the
    72 views quantize to uint8 on device, and ONE transfer brings back the
    (72, H, W, 3) stack for host-side jpg/gif encode."""
    sub = "render_360_normal" if render_normal else "render_360"
    out = os.path.join(out_dir, sub)
    os.makedirs(out, exist_ok=True)
    sweep = _sweep_exec(("360", int(fid), render_normal, views_per_axis),
                        assets, config, rcfg, params,
                        _turntable_fn(assets, config, rcfg, int(fid),
                                      render_normal, views_per_axis))
    imgs = np.asarray(sweep(params))  # single host transfer, uint8
    for idx in range(2 * views_per_axis):
        prefix = "" if idx < views_per_axis else "h_"
        save_image(imgs[idx],
                   os.path.join(out, f"{prefix}{idx % views_per_axis:04d}.jpg"))
    save_gif(out, os.path.join(out, "out.gif"))
    return out


def render_360_light(params, fid, assets, config, rcfg, out_dir: str,
                     num: int = 40, z_range=(-5.0, 5.0)) -> str:
    """Light-position sweep (reference visualize.py:199-228). Scanned into
    one device program with device-side uint8 quantization — see
    render_360 for why (tunnel round-trips dominated)."""
    out = os.path.join(out_dir, "render_360_light")
    os.makedirs(out, exist_ok=True)
    sweep = _sweep_exec(("light", int(fid), num, tuple(z_range)),
                        assets, config, rcfg, params,
                        _light_sweep_fn(assets, config, rcfg, int(fid), num,
                                        z_range))
    imgs = np.asarray(sweep(params))  # single host transfer, uint8
    for i in range(num):
        save_image(imgs[i], os.path.join(out, f"{i:04d}.jpg"))
    save_gif(out, os.path.join(out, "out.gif"))
    return out


def concat_image_dirs(dir1: str, dir2: str, out_dir: str) -> None:
    """Side-by-side concat of two render directories (visualize.py:322-345)."""
    os.makedirs(out_dir, exist_ok=True)
    l1 = sorted(
        p for p in glob.glob(os.path.join(dir1, "*"))
        if p.endswith((".jpg", ".png"))
    )
    l2 = sorted(
        p for p in glob.glob(os.path.join(dir2, "*"))
        if p.endswith((".jpg", ".png"))
    )
    for i, (a, b) in enumerate(zip(l1, l2)):
        ia = np.asarray(Image.open(a).convert("RGB"))
        ib = np.asarray(Image.open(b).convert("RGB"))
        Image.fromarray(np.concatenate([ia, ib], 1)).save(
            os.path.join(out_dir, "%04d.jpg" % i)
        )
    save_gif(out_dir, os.path.join(out_dir, "out.gif"))


def save_texture_maps(params, uv_mask, out_dir: str) -> None:
    """Export the optimized albedo + normal map as PNGs
    (optimize_sequence.py:627-654)."""
    out = os.path.join(out_dir, "uv_out")
    os.makedirs(out, exist_ok=True)
    mask = np.asarray(uv_mask) if uv_mask is not None else None
    tex = np.clip(np.asarray(params["texture"]), 0, 1)
    if mask is not None:
        tex = tex * mask[..., None]
    save_image(tex, os.path.join(out, "texture.png"))
    if "normal_map" in params:
        nm = np.asarray(params["normal_map"])
        nm = nm / np.maximum(np.linalg.norm(nm, axis=-1, keepdims=True), 1e-9)
        nm = nm / 2.0 + 0.5
        if mask is not None:
            nm = nm * mask[..., None]
        save_image(np.clip(nm, 0, 1), os.path.join(out, "normal_map.png"))
