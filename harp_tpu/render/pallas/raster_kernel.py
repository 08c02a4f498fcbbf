"""Pallas TPU rasterization kernel.

Replaces the XLA per-tile pass of harp_tpu.render.rasterizer (the hot path —
the XLA pass burns the full face capacity for every tile; measured ~190 ms
fused at 448^2 x 8 frames) with a count-bounded kernel:

- grid = (B, T / TC): each program rasterizes TC=8 tiles of one frame.
- Binning stays in XLA, which also PRE-GATHERS each tile's face rows into a
  packed (B, T, cap, 16) float32 buffer: 3 vertices x (u, v, z) + the face
  id bitcast into lane 9. Mosaic has no per-element dynamic VMEM loads
  ("index must be a multiple of 128"), so the kernel instead walks each
  tile's rows in sublane-aligned groups of 8 (dynamic start `8*g` via
  pl.multiple_of) and unrolls the 8 faces statically.
- The inner loop is bounded by the tile's face COUNT (scalar-prefetched in
  SMEM), so empty tiles — most of the image — cost nothing.
- Per-pixel state lives in registers: argmin-depth face (hard raster) and a
  K-slot first-hit list (soft raster; same selection policy as the XLA path
  and brute-force reference).

Outputs are integer face ids only, identical to `rasterizer._rasterize_ids`,
so the differentiable recompute (coverage, barycentrics) and therefore
gradients are unchanged. Interpreter-mode CPU tests assert exact agreement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from harp_tpu.render.rasterizer import RasterConfig, _bin_faces, _untile

TC = 8  # tiles per program
FG = 8  # faces per aligned group (sublane granularity)
ROW = 16  # packed floats per face row


def _kernel(counts_ref, act_ref, fvt_ref, hard_ref, soft_ref, ssum_ref,
            *, cfg: RasterConfig, K: int, nt: int, A: int):
    ts = cfg.tile
    P = ts * ts
    b = pl.program_id(0)
    tg = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    blur_px2 = jnp.float32(cfg.blur_px2)
    znear = jnp.float32(cfg.znear)
    inf = jnp.float32(3.4e38)
    # px^2 -> NDC^2 factor for the coverage log-sum.
    ndc2 = jnp.float32(cfg.ndc_scale**2)
    inv_sigma = jnp.float32(1.0 / cfg.sigma)

    def tile_body(j):
        # j is a PYTHON int (static unroll): output stores index the sublane
        # dimension, where dynamic indices are mislowered by Mosaic.
        slot = tg * TC + j          # position in the ACTIVE tile list
        t = act_ref[b * A + slot]   # actual tile index in the image
        ou = (t % nt) * ts
        ov = (t // nt) * ts
        px = (ou + lane % ts).astype(jnp.float32) + 0.5
        py = (ov + lane // ts).astype(jnp.float32) + 0.5
        n = jnp.minimum(counts_ref[b * A + slot], fvt_ref.shape[3])

        def group_body(g, state):
            zmin, hard, cnt, ssum, sd, sid = state
            base = pl.multiple_of(g * FG, FG)
            block = fvt_ref[0, 0, j, pl.ds(base, FG), :]  # (FG, ROW)
            for r in range(FG):
                fv = block[r]
                live = (g * FG + r) < n
                x0, y0, z0 = fv[0], fv[1], fv[2]
                x1, y1, z1 = fv[3], fv[4], fv[5]
                x2, y2, z2 = fv[6], fv[7], fv[8]
                # The kernel tracks the bin-list SLOT, not the face id:
                # reading ids from memory needs unsupported scalar extracts;
                # XLA maps slots back to face ids afterwards.
                fid = g * FG + r

                area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
                w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
                w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
                w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
                denom = jnp.where(jnp.abs(area2) > 1e-10, area2,
                                  jnp.where(area2 >= 0, 1e-10, -1e-10))
                b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
                valid = live & (jnp.abs(area2) > 1e-10) & (z0 > znear) \
                    & (z1 > znear) & (z2 > znear)
                inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid

                def seg_d2(ax, ay, bx, by):
                    abx, aby = bx - ax, by - ay
                    apx, apy = px - ax, py - ay
                    dn = abx * abx + aby * aby + 1e-12
                    tt = jnp.clip((apx * abx + apy * aby) / dn, 0.0, 1.0)
                    dx = apx - tt * abx
                    dy = apy - tt * aby
                    return dx * dx + dy * dy

                d2 = jnp.minimum(
                    jnp.minimum(seg_d2(x0, y0, x1, y1), seg_d2(x1, y1, x2, y2)),
                    seg_d2(x2, y2, x0, y0),
                )
                signed = jnp.where(inside, -d2, d2)

                z = b0 * z0 + b1 * z1 + b2 * z2
                zc = jnp.where(inside, z, inf)
                better = zc < zmin
                zmin = jnp.where(better, zc, zmin)
                hard = jnp.where(better, fid, hard)

                # First-K-in-order slot insertion (policy shared with the
                # XLA slot compaction and the brute-force reference).
                hit = valid & (signed <= blur_px2)
                new_sd, new_sid = [], []
                for k in range(K):
                    sel = hit & (cnt == k)
                    new_sd.append(jnp.where(sel, signed, sd[k]))
                    new_sid.append(jnp.where(sel, fid, sid[k]))
                sd, sid = tuple(new_sd), tuple(new_sid)
                cnt = cnt + hit.astype(jnp.int32)
                # Coverage log-sum over ALL within-blur faces.
                contrib = -jax.nn.softplus(-(signed * ndc2) * inv_sigma)
                ssum = ssum + jnp.where(hit, contrib, 0.0)
            return zmin, hard, cnt, ssum, sd, sid

        zmin0 = jnp.full((1, P), inf, jnp.float32)
        hard0 = jnp.full((1, P), -1, jnp.int32)
        cnt0 = jnp.zeros((1, P), jnp.int32)
        ssum0 = jnp.zeros((1, P), jnp.float32)
        sd0 = tuple(jnp.full((1, P), inf, jnp.float32) for _ in range(K))
        sid0 = tuple(jnp.full((1, P), -1, jnp.int32) for _ in range(K))
        n_groups = (n + FG - 1) // FG
        zmin, hard, _, ssum, sd, sid = jax.lax.fori_loop(
            0, n_groups, group_body, (zmin0, hard0, cnt0, ssum0, sd0, sid0)
        )
        hard_ref[0, j] = hard[0]
        ssum_ref[0, j] = ssum[0]
        for k in range(K):
            soft_ref[0, j, k] = jnp.where(sd[k] < inf, sid[k], -1)[0]

    for j in range(TC):
        tile_body(j)


def pallas_rasterize(verts_px, faces, cfg: RasterConfig, interpret: bool = False):
    """Fused soft+hard rasterization ids via the Pallas tile kernel.

    Returns (soft_ids (B, H, W, K) int32 — first K within-blur faces in
    bin-list order, soft_sum (B, H, W) f32 coverage log-sum, hard_ids
    (B, H, W) int32). Identical id outputs to the XLA `rasterize`.
    interpret=True runs in the Pallas interpreter (CPU tests).
    """
    from harp_tpu.render.rasterizer import as_faces_array

    faces = as_faces_array(faces)
    return _pallas_rasterize_impl(verts_px, faces, cfg, interpret)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def _pallas_rasterize_impl(verts_px, faces, cfg: RasterConfig, interpret: bool):
    verts_px = jax.lax.stop_gradient(verts_px)
    B = verts_px.shape[0]
    K = cfg.faces_per_pixel
    ts = cfg.tile
    nt = cfg.image_size // ts
    T = nt * nt
    P = ts * ts
    assert T % TC == 0, f"tile count {T} must be a multiple of {TC}"
    assert cfg.cap % FG == 0, f"cap {cfg.cap} must be a multiple of {FG}"

    fv = verts_px[:, faces]  # (B, F, 3, 3)
    tile_ids, counts = _bin_faces(fv, cfg)

    # Active-tile compaction (same budget rule as the XLA path, rounded to
    # the program granularity): pre-gather and rasterize only the A
    # most-loaded tiles.
    if cfg.active_fraction >= 1.0:
        A = T
    else:
        A = min(max(-(-int(T * cfg.active_fraction) // TC), 1) * TC, T)
    _, act_idx = jax.lax.top_k(counts, A)  # (B, A)
    act_idx = act_idx.astype(jnp.int32)
    brow = jnp.arange(B)[:, None]
    tile_ids_a = jnp.take_along_axis(tile_ids, act_idx[:, :, None], axis=1)
    counts_a = jnp.take_along_axis(counts, act_idx, axis=1)
    counts_a = jnp.minimum(counts_a, cfg.cap).astype(jnp.int32).reshape(-1)

    # Pre-gather packed per-tile face rows (9 vertex floats, padded).
    fv_pack = jnp.concatenate(
        [
            fv.reshape(B, -1, 9),
            jnp.zeros((B, fv.shape[1], ROW - 9), verts_px.dtype),
        ],
        -1,
    )  # (B, F, ROW)
    safe = jnp.maximum(tile_ids_a, 0).reshape(B, A * cfg.cap)
    fvt = jnp.take_along_axis(fv_pack, safe[:, :, None], axis=1)
    # Zero padding rows: zero vertices make the face degenerate (area == 0),
    # so correctness never depends on the in-kernel count masking.
    fvt = jnp.where((tile_ids_a >= 0).reshape(B, A * cfg.cap)[:, :, None], fvt, 0.0)
    fvt = fvt.reshape(B, A // TC, TC, cfg.cap, ROW)

    kernel = partial(_kernel, cfg=cfg, K=K, nt=nt, A=A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, A // TC),
        in_specs=[
            pl.BlockSpec((1, 1, TC, cfg.cap, ROW), lambda b, t, c, a: (b, t, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TC, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0)),
            pl.BlockSpec((1, TC, K, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0, 0)),
            pl.BlockSpec((1, TC, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0)),
        ],
    )
    hard, soft, ssum = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * (A // TC), TC, P), jnp.int32),
            jax.ShapeDtypeStruct((B * (A // TC), TC, K, P), jnp.int32),
            jax.ShapeDtypeStruct((B * (A // TC), TC, P), jnp.float32),
        ],
        interpret=interpret,
    )(counts_a, act_idx.reshape(-1), fvt)

    # Map slot indices back to face ids via the ACTIVE bin lists, then
    # scatter compact tiles into the full image.
    hard_slot = hard.reshape(B, A, P)
    soft_slot = jnp.moveaxis(soft.reshape(B, A, K, P), 2, 3)  # (B, A, P, K)
    tid3 = jnp.broadcast_to(
        tile_ids_a.reshape(B, A, 1, cfg.cap), (B, A, P, cfg.cap)
    )
    hard_ids_a = jnp.where(
        hard_slot >= 0,
        jnp.take_along_axis(tid3, jnp.maximum(hard_slot, 0)[..., None], -1)[..., 0],
        -1,
    )
    soft_ids_a = jnp.where(
        soft_slot >= 0,
        jnp.take_along_axis(tid3, jnp.maximum(soft_slot, 0), -1),
        -1,
    )

    def scatter(x, fill, trailing=()):
        full = jnp.full((B, T, P) + trailing, fill, x.dtype)
        return _untile(full.at[brow, act_idx].set(x), cfg)

    hard_ids = scatter(hard_ids_a, -1)
    soft_ids = scatter(soft_ids_a, -1, (K,))
    soft_sum = scatter(ssum.reshape(B, A, P).astype(jnp.float32), 0.0)
    return soft_ids, soft_sum, hard_ids

