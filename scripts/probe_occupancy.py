"""Probe per-tile face occupancy of the bench scene at reference density.

Informs RasterConfig.cap / active_fraction defaults (``__graft_entry__._build``)
for the 3088-vert hand and the 4078-vert arm at 448^2: prints the peak
per-tile face count, occupied-tile fraction, and the span-truncation count
for a sweep of poses, so cap/budget defaults carry measured headroom instead
of guesses (VERDICT round-2 #10).

Usage: python scripts/probe_occupancy.py [--arm] [--img 448]
"""

from __future__ import annotations

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", action="store_true")
    ap.add_argument("--img", type=int, default=448)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--density", default="reference")
    ap.add_argument("--span", type=int, default=4)
    args = ap.parse_args()

    from harp_tpu.assets import build_synthetic_assets, build_synthetic_arm_assets
    from harp_tpu.config import HarpConfig
    from harp_tpu.render.rasterizer import RasterConfig, _bin_faces
    from harp_tpu.render import pipeline
    from harp_tpu.render import camera as cam_mod

    if args.arm:
        assets = build_synthetic_arm_assets(density=args.density)
    else:
        assets = build_synthetic_assets(density=args.density)
    config = HarpConfig(
        img_size=args.img, focal_length=2000.0 * args.img / 448.0,
        use_arm=args.arm,
    )
    rcfg = RasterConfig(image_size=args.img, span_tiles=args.span)

    rng = np.random.RandomState(0)
    B = args.frames
    V = assets.num_render_verts
    params = {
        "pose": jnp.asarray(0.15 * rng.randn(B, 45), jnp.float32),
        "rot": jnp.asarray(0.05 * rng.randn(B, 3), jnp.float32),
        "trans": jnp.zeros((B, 3), jnp.float32),
        "shape": jnp.zeros((10,), jnp.float32),
        "wrist_pose": jnp.zeros((B, 3), jnp.float32),
        "cam": jnp.asarray(np.tile([6.0, -0.08, -0.01], (B, 1)), jnp.float32),
        "verts_disps": jnp.zeros((V, 1), jnp.float32),
    }
    fids = jnp.arange(B)
    verts, _ = pipeline.mesh_forward(params, fids, assets, config)
    R, T = pipeline.camera_for_frames(params, fids, config)
    screen = cam_mod.screen_from_world(verts, R, T, config.focal_length,
                                       config.img_size)
    fv = screen[:, jnp.asarray(assets.render_faces)]
    _, counts, _ = jax.jit(lambda f: _bin_faces(f, rcfg))(fv)
    counts = np.asarray(counts)
    T_tiles = counts.shape[1]
    print(f"mesh: {V} verts / {assets.render_faces.shape[0]} faces, "
          f"img {args.img}, tiles {T_tiles}, span {args.span}")
    print(f"peak per-tile count: {counts.max()}")
    print(f"p99 per-tile count (occupied): "
          f"{np.percentile(counts[counts > 0], 99):.0f}")
    occ = (counts > 0).sum(axis=1)
    print(f"occupied tiles per frame: mean {occ.mean():.0f} "
          f"({occ.mean() / T_tiles:.2%}), max {occ.max()}")
    # Random pose jitter sweep: how much headroom does a fit need?
    peaks = []
    for i in range(20):
        p2 = dict(params)
        p2["pose"] = params["pose"] + jnp.asarray(
            0.2 * rng.randn(B, 45), jnp.float32)
        p2["cam"] = params["cam"] * jnp.asarray(
            1.0 + 0.15 * rng.randn(B, 1), jnp.float32)
        v2, _ = pipeline.mesh_forward(p2, fids, assets, config)
        s2 = cam_mod.screen_from_world(v2, R, T, config.focal_length,
                                       config.img_size)
        _, c2, _ = jax.jit(lambda f: _bin_faces(f, rcfg))(
            s2[:, jnp.asarray(assets.render_faces)])
        peaks.append(int(np.asarray(c2).max()))
    print(f"pose/cam-jitter peak sweep: max {max(peaks)}, "
          f"mean {np.mean(peaks):.0f}")


if __name__ == "__main__":
    main()
