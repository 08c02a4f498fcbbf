"""Pallas TPU rasterization kernel (the production TPU raster path).

Replaces the XLA per-tile pass of harp_tpu.render.rasterizer — and, in the
reference stack, pytorch3d's CUDA `rasterize_meshes` (renderer_helper.py:44-48)
— with a count-bounded, face-vectorized kernel:

- grid = (B, A / TC): each program rasterizes TC tiles of one frame, taken
  from the ACTIVE tile list (most-loaded first, the same compaction budget
  as the XLA path).
- Binning stays in XLA, which also pre-gathers each tile's face rows into a
  packed (B, A, cap, 16) float32 buffer: 3 vertices x (u, v, z) padded to a
  16-lane row. The pipeline streams (TC, cap, 16) blocks into VMEM; HBM
  traffic for the packed buffer is tens of microseconds at the fit sizes.
- The inner loop walks each tile's rows in vector groups of FG=8 faces:
  geometry for all FG faces x P pixels is evaluated as (FG, P) VPU ops
  (faces on sublanes, pixels on lanes — 8x the utilization of per-face
  scalar processing). The loop is bounded by ceil(count / FG) with the
  tile's face COUNT scalar-prefetched in SMEM, so empty tiles cost nothing.
- Per-pixel state is (1, P) registers: argmin-depth slot (hard raster), a
  K-slot first-hit list + hit counter (soft raster), and the coverage
  log-sum (silhouette alpha forward).

Outputs are integer face ids (+ the coverage sum), identical to
`rasterizer._rasterize_ids`, so the differentiable recompute (coverage,
barycentrics) and therefore gradients are unchanged. Interpreter-mode CPU
tests assert exact agreement; on-device tests assert agreement at the real
448^2 workload.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from harp_tpu.render.rasterizer import (
    RasterConfig,
    _bin_pairs,
    _gather_tile_ids,
    _untile,
)

TC = 8  # tiles per program
FG = 8  # faces per vector group (sublane granularity for f32)
ROW = 16  # packed floats per face row
BIG = 2**30  # sentinel slot (Python int: jnp constants get captured by Mosaic)


def _cumsum_sublane(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of an (FG, P) int32 array via static
    shifted adds (Mosaic-safe; no reduce_window)."""
    c = x
    sh = 1
    while sh < c.shape[0]:
        c = c + jnp.concatenate(
            [jnp.zeros((sh, c.shape[1]), c.dtype), c[:-sh]], axis=0
        )
        sh *= 2
    return c


def _kernel(counts_ref, act_ref, fvt_ref, *out_refs,
            cfg: RasterConfig, K: int, nt: int, A: int,
            need_soft: bool = True):
    if need_soft:
        hard_ref, soft_ref, ssum_ref = out_refs
    else:
        # Depth-only mode (e.g. the shadow light pass): the soft K-slot
        # bookkeeping, hit cumsums, and the softplus coverage sum are all
        # statically elided — only the argmin-depth raster remains.
        (hard_ref,) = out_refs
    ts = cfg.tile
    P = ts * ts
    b = pl.program_id(0)
    tg = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (FG, 1), 0)
    blur_px2 = jnp.float32(cfg.blur_px2)
    znear = jnp.float32(cfg.znear)
    inf = jnp.float32(3.4e38)
    ndc2 = jnp.float32(cfg.ndc_scale**2)
    inv_sigma = jnp.float32(1.0 / cfg.sigma)

    def tile_body(j):
        # j is a PYTHON int (static unroll): output stores index the sublane
        # dimension, where dynamic indices are mislowered by Mosaic.
        slot = tg * TC + j          # position in the ACTIVE tile list
        t = act_ref[b * A + slot]   # actual tile index in the image
        ou = (t % nt) * ts
        ov = (t // nt) * ts
        px = (ou + lane % ts).astype(jnp.float32) + 0.5   # (1, P)
        py = (ov + lane // ts).astype(jnp.float32) + 0.5
        n = jnp.minimum(counts_ref[b * A + slot], fvt_ref.shape[3])

        def group_body(g, state):
            zmin, hard, cnt, ssum, sid = state
            base = pl.multiple_of(g * FG, FG)
            blk = fvt_ref[0, 0, j, pl.ds(base, FG), :]  # (FG, ROW)
            x0, y0, z0 = blk[:, 0:1], blk[:, 1:2], blk[:, 2:3]
            x1, y1, z1 = blk[:, 3:4], blk[:, 4:5], blk[:, 5:6]
            x2, y2, z2 = blk[:, 6:7], blk[:, 7:8], blk[:, 8:9]
            # Face ids ride lane 9 as exact float values (ints < 2^24; a
            # BITCAST would make ids denormal floats, which the TPU flushes
            # to zero). Bin lists are face-id ascending, so id
            # min-reductions implement the same first-in-bin-order selection
            # as slot tracking would — and the outputs need no slot->id
            # gather afterwards (that gather measured 83 ms at 448^2 x 8,
            # more than the kernel itself).
            gslot = blk[:, 9:10].astype(jnp.int32)
            live = (base + row) < n

            area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # (FG, 1)
            w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)     # (FG, P)
            w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
            w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
            denom = jnp.where(jnp.abs(area2) > 1e-10, area2,
                              jnp.where(area2 >= 0, 1e-10, -1e-10))
            b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
            valid = live & (jnp.abs(area2) > 1e-10) & (z0 > znear) \
                & (z1 > znear) & (z2 > znear)        # (FG, 1)
            inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid

            if need_soft:
                def seg_d2(ax, ay, bx, by):
                    abx, aby = bx - ax, by - ay
                    apx, apy = px - ax, py - ay
                    dn = abx * abx + aby * aby + 1e-12
                    tt = jnp.clip((apx * abx + apy * aby) / dn, 0.0, 1.0)
                    dx = apx - tt * abx
                    dy = apy - tt * aby
                    return dx * dx + dy * dy

                # The edge-distance stack is the most expensive part of the
                # pair work — statically elided in depth-only mode.
                d2 = jnp.minimum(
                    jnp.minimum(seg_d2(x0, y0, x1, y1),
                                seg_d2(x1, y1, x2, y2)),
                    seg_d2(x2, y2, x0, y0),
                )
                signed = jnp.where(inside, -d2, d2)  # (FG, P)

            # Hard raster: group argmin depth, first-slot tie-break, merged
            # with the running state by strict less-than (keeps the earliest
            # group on exact ties — XLA-path semantics).
            z = b0 * z0 + b1 * z1 + b2 * z2
            zc = jnp.where(inside, z, inf)
            zmin_g = jnp.min(zc, axis=0, keepdims=True)          # (1, P)
            slot_g = jnp.min(
                jnp.where(zc == zmin_g, gslot, BIG), axis=0, keepdims=True
            )
            better = zmin_g < zmin
            zmin = jnp.where(better, zmin_g, zmin)
            hard = jnp.where(better, slot_g, hard)

            if need_soft:
                # Soft raster: record the first K within-blur faces in
                # bin-list order. pos = overall hit ordinal; at most one
                # face per pixel matches each k, extracted with a sublane
                # min-reduction.
                hit = valid & (signed <= blur_px2)       # (FG, P)
                pos = cnt + _cumsum_sublane(hit.astype(jnp.int32)) - 1
                slot_or_big = jnp.where(hit, gslot, BIG)
                for k in range(K):
                    sk = jnp.min(jnp.where(pos == k, slot_or_big, BIG),
                                 axis=0, keepdims=True)  # (1, P)
                    sid[k] = jnp.where(sk < BIG, sk, sid[k])
                cnt = cnt + jnp.sum(hit.astype(jnp.int32), axis=0,
                                    keepdims=True)
                # Coverage log-sum over ALL within-blur faces (not just the
                # K recorded): log(1-p) = -softplus(-d/sigma). Makes the
                # silhouette alpha FORWARD free.
                contrib = -jax.nn.softplus(-(signed * ndc2) * inv_sigma)
                ssum = ssum + jnp.sum(jnp.where(hit, contrib, 0.0), axis=0,
                                      keepdims=True)
            return zmin, hard, cnt, ssum, sid

        zmin0 = jnp.full((1, P), inf, jnp.float32)
        hard0 = jnp.full((1, P), -1, jnp.int32)
        cnt0 = jnp.zeros((1, P), jnp.int32)
        ssum0 = jnp.zeros((1, P), jnp.float32)
        n_soft = K if need_soft else 0
        sid0 = [jnp.full((1, P), -1, jnp.int32) for _ in range(n_soft)]
        n_groups = (n + FG - 1) // FG
        zmin, hard, _, ssum, sid = jax.lax.fori_loop(
            0, n_groups, group_body, (zmin0, hard0, cnt0, ssum0, sid0)
        )
        hard_ref[0, j] = jnp.where(zmin < inf, hard, -1)[0]
        if need_soft:
            ssum_ref[0, j] = ssum[0]
            for k in range(K):
                soft_ref[0, j, k] = sid[k][0]

    for j in range(TC):
        tile_body(j)


def pallas_rasterize(verts_px, faces, cfg: RasterConfig, interpret: bool = False,
                     need_soft: bool = True):
    """Fused soft+hard rasterization ids via the Pallas tile kernel.

    Returns (soft_ids (B, H, W, K) int32 — first K within-blur faces in
    bin-list order, soft_sum (B, H, W) f32 coverage log-sum, hard_ids
    (B, H, W) int32). Identical id outputs to the XLA `rasterize`.
    interpret=True runs in the Pallas interpreter (CPU tests).
    need_soft=False returns (None, None, hard_ids) from the depth-only
    kernel.
    """
    out = pallas_raster_compact(verts_px, faces, cfg, interpret=interpret,
                                need_soft=need_soft)
    B = verts_px.shape[0]
    T = (cfg.image_size // cfg.tile) ** 2
    P = cfg.tile * cfg.tile
    K = cfg.faces_per_pixel
    brow = jnp.arange(B)[:, None]
    act_idx = out["act_idx"]

    def scatter(x, fill, trailing=()):
        full = jnp.full((B, T, P) + trailing, fill, x.dtype)
        return _untile(full.at[brow, act_idx].set(x), cfg)

    hard_ids = scatter(out["hard_ids"], -1)
    if not need_soft:
        return None, None, hard_ids
    soft_ids = scatter(out["soft_ids"], -1, (K,))
    soft_sum = scatter(out["soft_sum"], jnp.float32(0.0))
    return soft_ids, soft_sum, hard_ids


@partial(jax.jit, static_argnames=("cfg", "interpret", "need_soft"))
def pallas_raster_compact(verts_px, faces, cfg: RasterConfig,
                          interpret: bool = False, need_soft: bool = True):
    """Compact active-tile rasterization: returns a dict with act_idx
    (B, A), soft_ids (B, A, P, K), soft_sum (B, A, P), hard_ids (B, A, P),
    bin_overflow (B,), active_overflow (B,) — the same contract as
    rasterizer._rasterize_ids_compact, produced in ONE tile pass with no
    full-image scatter.

    need_soft=False (depth-only: shadow light passes) statically elides the
    soft-list/coverage work from the kernel AND the packed-buffer residuals
    — only act_idx, hard_ids, and the overflow counters are returned."""
    from harp_tpu.render.rasterizer import as_faces_array

    faces = as_faces_array(faces)
    verts_px = jax.lax.stop_gradient(verts_px)
    B = verts_px.shape[0]
    K = cfg.faces_per_pixel
    ts = cfg.tile
    nt = cfg.image_size // ts
    T = nt * nt
    P = ts * ts
    assert cfg.cap % FG == 0, f"cap {cfg.cap} must be a multiple of {FG}"

    fv = verts_px[:, faces]  # (B, F, 3, 3)
    s_face, start, counts_clean, counts, span_cnt = _bin_pairs(fv, cfg)

    # Active-tile compaction: pre-gather and rasterize only the A
    # most-loaded tiles (top_k also sorts them most-loaded first, so tiles
    # within a program have similar counts — balanced count-bounded loops).
    # Per-tile face lists are read from the sorted pair runs for ONLY the
    # active tiles — the dense (B, T, cap) table is never built here.
    # A is padded up to the program granularity TC; padded entries carry
    # count 0 (no kernel work) and are dropped from the outputs.
    if cfg.active_fraction >= 1.0:
        A_eff = T
    else:
        A_eff = min(max(-(-int(T * cfg.active_fraction) // TC), 1) * TC, T)
    A = -(-A_eff // TC) * TC
    _, act_idx = jax.lax.top_k(counts, A_eff)  # (B, A_eff)
    act_idx = act_idx.astype(jnp.int32)
    tile_ids_a = _gather_tile_ids(s_face, start, counts_clean, act_idx, cfg.cap)
    # Clean counts bound the in-kernel face loops exactly (the reporting
    # counts' span-truncation bump would only add zeroed degenerate rows).
    counts_a = jnp.minimum(
        jnp.take_along_axis(counts_clean, act_idx, axis=1), cfg.cap
    ).astype(jnp.int32)
    if A != A_eff:
        pad = A - A_eff
        act_idx_k = jnp.pad(act_idx, ((0, 0), (0, pad)))
        counts_a = jnp.pad(counts_a, ((0, 0), (0, pad)))
        tile_ids_a = jnp.pad(tile_ids_a, ((0, 0), (0, pad), (0, 0)),
                             constant_values=-1)
    else:
        act_idx_k = act_idx
    counts_a = counts_a.reshape(-1)

    # Pre-gather packed per-tile face rows: 9 vertex floats + the face id
    # as an exact float value in lane 9 (read back in-kernel; see _kernel).
    # Padding slots (tile id -1) redirect to an all-zero SENTINEL row at
    # index F instead of being masked post-gather: the earlier
    # where(tile_ids >= 0, ...) materialized a (B, A, cap) pred mask whose
    # packed-bool relayout copies cost 2 x 29 ms/step at 448^2 x B18 in the
    # profile. Zero vertices make the face degenerate (area == 0), so
    # correctness never depends on the in-kernel count masking either way.
    F = fv.shape[1]
    assert F + 1 < 2**24, "face ids must be exactly representable in float32"
    id_lane = jnp.arange(F + 1, dtype=jnp.float32)[None, :, None]
    fv_rows = jnp.concatenate(
        [fv.reshape(B, -1, 9), jnp.zeros((B, 1, 9), verts_px.dtype)], 1
    )
    fv_pack = jnp.concatenate(
        [
            fv_rows,
            jnp.broadcast_to(id_lane, (B, F + 1, 1)).astype(verts_px.dtype),
            jnp.zeros((B, F + 1, ROW - 10), verts_px.dtype),
        ],
        -1,
    )  # (B, F+1, ROW)
    safe = jnp.where(tile_ids_a >= 0, tile_ids_a, F).reshape(B, A * cfg.cap)
    fvt = jnp.take_along_axis(fv_pack, safe[:, :, None], axis=1)
    fvt = fvt.reshape(B, A // TC, TC, cfg.cap, ROW)

    kernel = partial(_kernel, cfg=cfg, K=K, nt=nt, A=A, need_soft=need_soft)
    hard_spec = pl.BlockSpec((1, TC, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0))
    hard_shape = jax.ShapeDtypeStruct((B * (A // TC), TC, P), jnp.int32)
    out_specs = [hard_spec]
    out_shapes = [hard_shape]
    if need_soft:
        out_specs += [
            pl.BlockSpec((1, TC, K, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0, 0)),
            pl.BlockSpec((1, TC, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((B * (A // TC), TC, K, P), jnp.int32),
            jax.ShapeDtypeStruct((B * (A // TC), TC, P), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, A // TC),
        in_specs=[
            pl.BlockSpec((1, 1, TC, cfg.cap, ROW), lambda b, t, c, a: (b, t, 0, 0, 0)),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(counts_a, act_idx_k.reshape(-1), fvt)

    out = {
        "act_idx": act_idx,
        "hard_ids": outs[0].reshape(B, A, P)[:, :A_eff],
        "bin_overflow": (counts > cfg.cap).sum(axis=-1),
        "active_overflow": jnp.maximum((counts > 0).sum(-1) - A_eff, 0),
        "span_overflow": span_cnt,
    }
    if need_soft:
        _, soft, ssum = outs
        out["soft_ids"] = jnp.moveaxis(soft.reshape(B, A, K, P), 2, 3)[:, :A_eff]
        out["soft_sum"] = ssum.reshape(B, A, P).astype(jnp.float32)[:, :A_eff]
        # Residuals for the fused coverage-gradient kernel
        # (pallas_coverage_grad): the packed tile-face buffer and its
        # bookkeeping, all non-differentiable. (A is recomputed from cfg on
        # the consumer side — ints must not cross the jit boundary.)
        out["pack"] = (fvt, counts_a, act_idx_k.reshape(-1))
    return out


def _coverage_grad_kernel(counts_ref, act_ref, fvt_ref, g_ref, out_ref,
                          *, cfg: RasterConfig, nt: int, A: int):
    """Backward of the coverage log-sum w.r.t. the packed face rows.

    For every tile and face row, recomputes the forward's within-blur
    coverage contribution with jax.vjp (traced inline — the partials are
    EXACT autodiff of the forward expression) and stores the 9 vertex-coord
    gradients, reduced over the tile's pixels, at the face's row:
    out (TC, cap, ROW) with grads in lanes 0..8.

    Unlike the XLA id-list backward this differentiates through ALL
    within-blur faces (not the first K recorded) — i.e. it computes the
    exact gradient of the alpha forward, which the K-list path approximates
    (tests/test_grad_fidelity.py measured the difference at f32 noise).
    """
    ts = cfg.tile
    P = ts * ts
    b = pl.program_id(0)
    tg = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (FG, 1), 0)
    blur_px2 = jnp.float32(cfg.blur_px2)
    znear = jnp.float32(cfg.znear)
    ndc2 = jnp.float32(cfg.ndc_scale**2)
    inv_sigma = jnp.float32(1.0 / cfg.sigma)

    def tile_body(j):
        slot = tg * TC + j
        t = act_ref[b * A + slot]
        ou = (t % nt) * ts
        ov = (t // nt) * ts
        px = (ou + lane % ts).astype(jnp.float32) + 0.5
        py = (ov + lane // ts).astype(jnp.float32) + 0.5
        n = jnp.minimum(counts_ref[b * A + slot], fvt_ref.shape[3])
        gp = g_ref[0, j, :].reshape(1, P)  # upstream d L / d ssum

        out_ref[0, j] = jnp.zeros((fvt_ref.shape[3], ROW), jnp.float32)

        def group_body(g, _):
            base = pl.multiple_of(g * FG, FG)
            blk = fvt_ref[0, 0, j, pl.ds(base, FG), :]  # (FG, ROW)
            live = ((base + row) < n).astype(jnp.float32)

            def ssum_contrib(coords):
                # EXACTLY the forward's per-group coverage contribution
                # (_kernel group_body), as a function of the 9 vertex
                # coordinate planes; reduced against the upstream grad so
                # vjp gives d(sum(g * contrib)) / d coords.
                x0, y0, z0, x1, y1, z1, x2, y2, z2 = coords
                area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
                w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
                w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
                w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
                denom = jnp.where(jnp.abs(area2) > 1e-10, area2,
                                  jnp.where(area2 >= 0, 1e-10, -1e-10))
                b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
                valid = (jnp.abs(area2) > 1e-10) & (z0 > znear) \
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
                    jnp.minimum(seg_d2(x0, y0, x1, y1),
                                seg_d2(x1, y1, x2, y2)),
                    seg_d2(x2, y2, x0, y0),
                )
                signed = jnp.where(inside, -d2, d2)
                hit = valid & (signed <= blur_px2)
                contrib = -jax.nn.softplus(-(signed * ndc2) * inv_sigma)
                w = jnp.where(hit, gp, 0.0) * live
                return jnp.sum(w * contrib)

            coords = tuple(blk[:, i:i + 1] for i in range(9))
            _, vjp = jax.vjp(ssum_contrib, coords)
            grads = vjp(jnp.float32(1.0))[0]  # 9 x (FG, 1)
            gblk = jnp.concatenate(
                list(grads) + [jnp.zeros((FG, ROW - 9), jnp.float32)], axis=1
            )
            out_ref[0, j, pl.ds(base, FG), :] = gblk
            return 0

        n_groups = (n + FG - 1) // FG
        jax.lax.fori_loop(0, n_groups, group_body, 0)

    for j in range(TC):
        tile_body(j)


def pallas_coverage_grad(pack, g_compact, faces, num_verts: int,
                         cfg: RasterConfig, interpret: bool = False):
    """d(sum over pixels of g * coverage_log_sum) / d verts_px via the
    fused tile kernel + one segment scatter.

    pack: the "pack" entry from pallas_raster_compact (fvt, counts_a,
    act_flat); g_compact: (B, A_eff, P) upstream gradient of soft_sum;
    returns (B, num_verts, 3) gradient w.r.t. screen-space vertices.

    This replaces the XLA K-id backward's per-pixel-per-k gathers +
    573k-row scatters (profiled ~99 ms/step at 448^2 x B8) with one
    count-bounded kernel pass + a (B*A*cap)-row segment sum.
    """
    fvt, counts_a, act_flat = pack
    B = fvt.shape[0]
    cap = fvt.shape[3]
    A = fvt.shape[1] * TC  # padded active budget (static from the buffer)
    ts = cfg.tile
    nt = cfg.image_size // ts
    P = ts * ts
    A_eff = g_compact.shape[1]
    if A_eff != A:
        g_compact = jnp.pad(g_compact, ((0, 0), (0, A - A_eff), (0, 0)))
    g_compact = g_compact.reshape(B * (A // TC), TC, P)

    kernel = partial(_coverage_grad_kernel, cfg=cfg, nt=nt, A=A)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, A // TC),
        in_specs=[
            pl.BlockSpec((1, 1, TC, cap, ROW), lambda b, t, c, a: (b, t, 0, 0, 0)),
            pl.BlockSpec((1, TC, P), lambda b, t, c, a: (b * (A // TC) + t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TC, cap, ROW),
                         lambda b, t, c, a: (b * (A // TC) + t, 0, 0, 0)),
        ],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * (A // TC), TC, cap, ROW), jnp.float32),
        ],
        interpret=interpret,
    )(counts_a, act_flat, fvt, g_compact)

    out = out.reshape(B, A * cap, ROW)
    # Face ids ride lane 9 of the fvt rows (grads occupy lanes 0..8 of out).
    fid = fvt.reshape(B, A * cap, ROW)[..., 9].astype(jnp.int32)
    grads9 = out[..., :9]
    F = faces.shape[0]
    # Segment-sum rows by face id. Padding rows carry the sentinel id F
    # (see the zero-row gather in pallas_raster_compact) and ZERO grads
    # (the kernel zeroes beyond-count rows); they land in the extra row
    # F, which is sliced off.
    per_face = jnp.zeros((B, F + 1, 9), jnp.float32)
    brow = jnp.arange(B)[:, None]
    per_face = per_face.at[brow, fid].add(grads9)[:, :F]
    # (B, F, 3 verts, 3 coords) -> scatter into vertices via the face table.
    vidx = jnp.broadcast_to(faces.reshape(-1)[None], (B, F * 3))
    dverts = jnp.zeros((B, num_verts, 3), jnp.float32)
    dverts = dverts.at[brow, vidx].add(per_face.reshape(B, F * 3, 3))
    return dverts
