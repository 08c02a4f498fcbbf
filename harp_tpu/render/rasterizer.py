"""Tile-binned differentiable rasterizer (XLA implementation).

Replaces pytorch3d's CUDA `rasterize_meshes` (the reference's hot native
dependency, renderer_helper.py:44-48) with a TPU-friendly design:

1.  **Binning** (integer, non-differentiable): faces are assigned to fixed
    capacity per-tile lists by bbox overlap, via a masked top_k — static
    shapes, no host control flow.
2.  **Per-tile rasterization** (integer outputs): each tile computes signed
    pixel-to-face distances / coverage for its face list and keeps
    - soft mode: the first K face ids (bin-list order) within the blur
      radius (for silhouette coverage; the coverage product is
      order-independent and >K contributors at sigma=1e-7 is rare), and
    - hard mode: the argmin-depth covering face id (for color/normal/depth).
3.  **Differentiable recompute**: given the integer ids, coverage
    probabilities, barycentrics and depths are recomputed in plain JAX, so
    autodiff produces exactly the soft-rasterizer gradients — no custom VJP,
    and any faster id-producer (the Pallas kernel) is a drop-in swap.

Geometry conventions match pytorch3d rasterization semantics: signed squared
point-to-triangle-edge distance (negative inside), measured in NDC units
(pixel distances scaled by 2/min(H,W)); faces participate in the soft list
when inside or within `blur_radius`; coverage p = sigmoid(-dist/sigma);
silhouette alpha = 1 - prod(1-p) (SoftSilhouetteShader semantics).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def as_faces_array(faces) -> jnp.ndarray:
    """Tracer-safe conversion of a face array to int32 jnp. Plain numpy and
    lists go through np.asarray; traced/device arrays are cast directly
    (custom_vjp backward passes re-trace with closed-over faces as tracers)."""
    if isinstance(faces, (jax.core.Tracer, jax.Array)):
        return faces.astype(jnp.int32)
    return jnp.asarray(np.asarray(faces), jnp.int32)


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    image_size: int = 448
    # Soft-rasterizer constants in NDC units (reference renderer_helper.py:37-48).
    sigma: float = 1e-7
    gamma: float = 1e-1
    blur_radius: float = float(np.log(1.0 / 1e-4 - 1.0) * 1e-7)  # NDC^2
    faces_per_pixel: int = 8  # K for the soft id list
    tile: int = 16
    cap: int = 256  # max faces binned per tile
    bin_chunk: int = 128  # tiles per binning chunk (dense binning only)
    # Pair-expansion binning: each face is expanded to the <= span_tiles^2
    # tiles its (blur-padded) bbox covers; one sort of F*span^2 (tile, face)
    # pairs per frame builds every tile list. Faces spanning more tiles are
    # truncated and counted in `bin_overflow` (raise span_tiles for scenes
    # with triangles larger than span_tiles * tile pixels; lower it to 3
    # for known-small-triangle scenes — the isolated pair sort is ~6x
    # faster at span 3, though the fused train step absorbs the difference
    # through async overlap).
    span_tiles: int = 4
    tile_chunk: int = 8  # tiles per raster chunk
    face_chunk: int = 256  # faces per inner accumulation step (capped at cap)
    znear: float = 1e-6
    # Fraction of tiles processed per frame (most-loaded first). The subject
    # covers a minority of the image, so empty tiles are skipped wholesale;
    # tiles beyond the budget that DO contain faces are reported in
    # `active_overflow`. 1.0 (default) disables compaction; fitting configs
    # set ~0.5 (HarpConfig.raster_active_fraction).
    active_fraction: float = 1.0
    # "auto": Pallas kernel on TPU, XLA elsewhere; or force "pallas"/"xla".
    backend: str = "auto"

    @property
    def ndc_scale(self) -> float:
        """Pixel -> NDC length factor (square images)."""
        return 2.0 / self.image_size

    @property
    def blur_px2(self) -> float:
        """Blur radius in squared pixel units."""
        return self.blur_radius / (self.ndc_scale**2)


# ---------------------------------------------------------------------------
# Shared geometry (differentiable)
# ---------------------------------------------------------------------------


def _seg_dist2(px, py, ax, ay, bx, by):
    """Squared distance from point to segment, all inputs broadcastable."""
    abx, aby = bx - ax, by - ay
    apx, apy = px - ax, py - ay
    denom = abx * abx + aby * aby + 1e-12
    t = jnp.clip((apx * abx + apy * aby) / denom, 0.0, 1.0)
    dx = apx - t * abx
    dy = apy - t * aby
    return dx * dx + dy * dy


def face_pixel_geometry(fv: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, cfg: RasterConfig):
    """Per (face, pixel) rasterization quantities.

    Args:
      fv: (..., 3, 3) face vertices in screen space (u, v, z).
      px, py: pixel center coordinates broadcastable against (...).

    Returns dict with:
      signed_d_ndc2: signed squared distance in NDC^2 (negative inside),
      inside: bool coverage, z: affine-interpolated view depth,
      bary: (..., 3) affine barycentrics, valid: face not degenerate/behind.
    """
    x0, y0, z0 = fv[..., 0, 0], fv[..., 0, 1], fv[..., 0, 2]
    x1, y1, z1 = fv[..., 1, 0], fv[..., 1, 1], fv[..., 1, 2]
    x2, y2, z2 = fv[..., 2, 0], fv[..., 2, 1], fv[..., 2, 2]

    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
    w0 = (x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)
    w1 = (x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)
    w2 = (x0 - px) * (y1 - py) - (x1 - px) * (y0 - py)
    denom = jnp.where(jnp.abs(area2) > 1e-10, area2, jnp.where(area2 >= 0, 1e-10, -1e-10))
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom

    degenerate = jnp.abs(area2) <= 1e-10
    behind = (z0 <= cfg.znear) | (z1 <= cfg.znear) | (z2 <= cfg.znear)
    valid = ~(degenerate | behind)

    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & valid
    d2 = jnp.minimum(
        jnp.minimum(
            _seg_dist2(px, py, x0, y0, x1, y1),
            _seg_dist2(px, py, x1, y1, x2, y2),
        ),
        _seg_dist2(px, py, x2, y2, x0, y0),
    )
    signed_px2 = jnp.where(inside, -d2, d2)
    signed_d_ndc2 = signed_px2 * (cfg.ndc_scale**2)
    z = b0 * z0 + b1 * z1 + b2 * z2
    return {
        # Pixel-space signed distance is the PRIMARY value: the blur hit
        # test must use it directly (the Pallas kernel tests in px^2; the
        # round trip x * s^2 / s^2 flips boundary pixels vs the kernel —
        # caught by the arm-density parity test).
        "signed_px2": signed_px2,
        "signed_d_ndc2": signed_d_ndc2,
        "inside": inside,
        "z": z,
        "bary": jnp.stack([b0, b1, b2], axis=-1),
        "valid": valid,
    }


# ---------------------------------------------------------------------------
# Binning + tiling (non-differentiable, id-producing)
# ---------------------------------------------------------------------------


def _bin_pairs(fv: jnp.ndarray, cfg: RasterConfig):
    """Sorted (tile, face) pair runs: the shared first stage of binning.

    Returns (s_face (B, F*S*S) face ids sorted by (tile, face) with
    sentinel-tile runs last, start (B, T) exclusive per-tile prefix,
    counts_clean (B, T) true overlap counts, counts_rep (B, T) reporting
    counts with the span-truncation bump folded in — see _bin_faces).

    Pair-expansion algorithm (O(F * span^2 * log) instead of the dense
    O(T * F) overlap matrix + per-tile top_k, which measured 30 ms at
    448^2 x 8): each live face emits one (tile, face) pair per tile of its
    blur-padded bbox (clamped to span_tiles^2); pairs sorted by
    tile * F + face give every tile's list as a contiguous ascending run;
    within-tile ranks come from the tiles' count prefix sums.
    """
    B, F = fv.shape[0], fv.shape[1]
    ts = cfg.tile
    nt = cfg.image_size // ts
    T = nt * nt
    S = cfg.span_tiles
    # The pair sort key is tile_of * F + fid in int32 with sentinel 2^30;
    # valid keys must stay below it or binning silently corrupts.
    assert T * F < 2**30, (
        f"binning key overflow: tiles({T}) * faces({F}) >= 2^30 — "
        "raise RasterConfig.tile or split the scene"
    )
    pad = math.sqrt(max(cfg.blur_px2, 0.0)) + 1e-3

    umin = fv[..., 0].min(-1) - pad
    umax = fv[..., 0].max(-1) + pad
    vmin = fv[..., 1].min(-1) - pad
    vmax = fv[..., 1].max(-1) + pad
    live = ~((fv[..., 2] <= cfg.znear).any(-1))  # cull behind-camera faces

    # Tile index ranges of each face's bbox. Tile t spans pixel centers
    # [t*ts+0.5, t*ts+ts-0.5]; the dense binning's overlap test is
    # umin <= t*ts+ts-0.5 && umax >= t*ts+0.5, i.e.
    # t in [ceil((umin+0.5-ts)/ts), floor((umax-0.5)/ts)].
    tx0 = jnp.ceil((umin + 0.5 - ts) / ts).astype(jnp.int32)
    ty0 = jnp.ceil((vmin + 0.5 - ts) / ts).astype(jnp.int32)
    tx1 = jnp.floor((umax - 0.5) / ts).astype(jnp.int32)
    ty1 = jnp.floor((vmax - 0.5) / ts).astype(jnp.int32)
    tx0c = jnp.clip(tx0, 0, nt - 1)
    ty0c = jnp.clip(ty0, 0, nt - 1)
    # A face whose on-screen range needs more than S tiles per dim is
    # truncated (lowest tiles kept) and counted into bin_overflow below.
    span_trunc = live & (
        (jnp.minimum(tx1, nt - 1) - tx0c >= S)
        | (jnp.minimum(ty1, nt - 1) - ty0c >= S)
    )

    di = jnp.arange(S, dtype=jnp.int32)
    # (B, F, S) tile coords; valid when within the face range AND in-bounds.
    cx = tx0c[..., None] + di
    cy = ty0c[..., None] + di
    vx = (cx <= jnp.minimum(tx1, nt - 1)[..., None]) & (cx >= tx0[..., None])
    vy = (cy <= jnp.minimum(ty1, nt - 1)[..., None]) & (cy >= ty0[..., None])
    tile_of = (cy[:, :, :, None] * nt + cx[:, :, None, :]).reshape(B, F, S * S)
    pair_ok = (vy[:, :, :, None] & vx[:, :, None, :]).reshape(B, F, S * S)
    pair_ok = pair_ok & live[..., None]

    fid = jnp.arange(F, dtype=jnp.int32)
    key = jnp.where(pair_ok, tile_of * F + fid[None, :, None], jnp.int32(2**30))
    skey = jnp.sort(key.reshape(B, F * S * S), axis=-1)
    s_tile = jnp.where(skey < 2**30, skey // F, T)  # T = invalid sentinel
    s_face = skey - s_tile * F

    # Per-tile counts by scatter-add (fast on TPU), then each tile's list is
    # the contiguous run s_face[start[t] : start[t]+count[t]] — read back
    # with a GATHER (a scatter-set of the table measured 26 ms; this is
    # sub-ms at the fit sizes).
    brow = jnp.arange(B)[:, None]
    counts = jnp.zeros((B, T + 1), jnp.int32).at[brow, s_tile].add(1)[:, :T]
    start = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(counts, axis=-1)[:, :-1]],
        axis=-1,
    )  # (B, T) exclusive prefix
    # Fold span truncation into the reporting counts so `bin_overflow`
    # (counts > cap) cannot miss it: bump the face's first tile. The clean
    # counts remain the exact per-tile run lengths in s_face.
    first_tile = ty0c * nt + tx0c
    counts_rep = counts.at[brow, first_tile].add(
        jnp.where(span_trunc, cfg.cap + 1, 0)
    )
    # (B,) span-truncated face count, reported separately as span_overflow
    # so a budget miss can be attributed: span_overflow > 0 means triangles
    # larger than span_tiles * tile px (raise span_tiles); bin_overflow
    # without span means a genuine per-tile cap excess (raise cap).
    span_cnt = span_trunc.sum(-1).astype(jnp.int32)
    return s_face, start, counts, counts_rep, span_cnt


def _gather_tile_ids(s_face, start, counts_clean, tiles, cap: int):
    """Per-tile face-id lists for a tile subset, read from the sorted pair
    runs of _bin_pairs: ids (B, Tq, cap) int32, -1 empty, ascending face id,
    truncated at cap keeping the lowest ids. `tiles` is (B, Tq) tile indices
    (may differ per frame, e.g. top_k active tiles). Gathering only the
    active tiles instead of materializing the dense (B, T, cap) table saved
    a measured ~16 ms/step at 448^2 x B18 across the camera + light passes."""
    B, n = s_face.shape
    Tq = tiles.shape[1]
    st = jnp.take_along_axis(start, tiles, axis=1)  # (B, Tq)
    ct = jnp.take_along_axis(counts_clean, tiles, axis=1)
    r = jnp.arange(cap, dtype=jnp.int32)
    pos = st[..., None] + r  # (B, Tq, cap)
    valid = r[None, None, :] < jnp.minimum(ct, cap)[..., None]
    posc = jnp.minimum(pos, n - 1).reshape(B, -1)
    return jnp.where(
        valid,
        jnp.take_along_axis(s_face, posc, axis=-1).reshape(B, Tq, cap),
        -1,
    )


def _bin_faces(fv: jnp.ndarray, cfg: RasterConfig):
    """Assign faces to tiles: ids (B, T, cap) int32 (-1 empty, ascending
    face id per tile, truncated at cap keeping the lowest ids) and counts
    (B, T) of ALL overlapping faces (pre-truncation, with the
    span-truncation bump folded in). Dense-table wrapper over _bin_pairs +
    _gather_tile_ids for the XLA tile path and diagnostics; the Pallas path
    gathers only its active tiles."""
    B = fv.shape[0]
    nt = cfg.image_size // cfg.tile
    T = nt * nt
    s_face, start, counts, counts_rep, span_cnt = _bin_pairs(fv, cfg)
    tiles = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    ids = _gather_tile_ids(s_face, start, counts, tiles, cfg.cap)
    return ids, counts_rep, span_cnt


def _bin_faces_dense(fv: jnp.ndarray, cfg: RasterConfig):
    """Dense reference binning (overlap matrix + per-tile top_k); kept for
    cross-checking the pair-expansion binning in tests."""
    B, F = fv.shape[0], fv.shape[1]
    ts = cfg.tile
    nt = cfg.image_size // ts
    T = nt * nt
    pad = math.sqrt(max(cfg.blur_px2, 0.0)) + 1e-3

    umin = fv[..., 0].min(-1) - pad
    umax = fv[..., 0].max(-1) + pad
    vmin = fv[..., 1].min(-1) - pad
    vmax = fv[..., 1].max(-1) + pad
    live = ~((fv[..., 2] <= cfg.znear).any(-1))  # cull behind-camera faces

    tids = jnp.arange(T, dtype=jnp.int32)
    tu0 = (tids % nt) * ts + 0.5
    tv0 = (tids // nt) * ts + 0.5
    tu1 = tu0 + (ts - 1)
    tv1 = tv0 + (ts - 1)

    def bin_chunk(tc):
        # tc: (C,) tile indices
        over = (
            (umin[:, None, :] <= tu1[tc][None, :, None])
            & (umax[:, None, :] >= tu0[tc][None, :, None])
            & (vmin[:, None, :] <= tv1[tc][None, :, None])
            & (vmax[:, None, :] >= tv0[tc][None, :, None])
            & live[:, None, :]
        )
        key = over.astype(jnp.float32)
        if key.shape[-1] < cfg.cap:  # fewer faces than the tile capacity
            key = jnp.pad(key, ((0, 0), (0, 0), (0, cfg.cap - key.shape[-1])))
        vals, idx = jax.lax.top_k(key, cfg.cap)
        ids = jnp.where(vals > 0, idx.astype(jnp.int32), -1)
        count = over.sum(-1).astype(jnp.int32)
        return ids, count

    n_chunks = -(-T // cfg.bin_chunk)
    padded = jnp.concatenate([tids, jnp.zeros(n_chunks * cfg.bin_chunk - T, jnp.int32)])
    chunks = padded.reshape(n_chunks, cfg.bin_chunk)
    ids, counts = jax.lax.map(bin_chunk, chunks)  # (n_chunks, B, C, cap)
    ids = jnp.moveaxis(ids, 1, 0).reshape(B, n_chunks * cfg.bin_chunk, cfg.cap)[:, :T]
    counts = jnp.moveaxis(counts, 1, 0).reshape(B, -1)[:, :T]
    return ids, counts


def _tile_pixels(cfg: RasterConfig):
    ts = cfg.tile
    j = jnp.arange(ts * ts, dtype=jnp.float32)
    pu = (j % ts) + 0.5
    pv = (j // ts) + 0.5
    return pu, pv


def _untile(x: jnp.ndarray, cfg: RasterConfig):
    """(B, T, P, ...) -> (B, H, W, ...)."""
    ts = cfg.tile
    nt = cfg.image_size // ts
    trailing = x.shape[3:]
    x = x.reshape((x.shape[0], nt, nt, ts, ts) + trailing)
    x = jnp.moveaxis(x, 3, 2)  # (B, nty, ts, ntx, ts, ...)
    return x.reshape((x.shape[0], cfg.image_size, cfg.image_size) + trailing)


@partial(jax.jit, static_argnames=("cfg", "need_soft", "need_hard", "compact"))
def _rasterize_ids(verts_px, faces, cfg: RasterConfig, need_soft: bool,
                   need_hard: bool, compact: bool = False):
    B = verts_px.shape[0]
    fv = verts_px[:, faces]  # (B, F, 3, 3)
    tile_ids, counts, span_cnt = _bin_faces(fv, cfg)
    ts, K = cfg.tile, cfg.faces_per_pixel
    nt = cfg.image_size // ts
    T = nt * nt
    P = ts * ts
    pu, pv = _tile_pixels(cfg)
    blur_px2 = cfg.blur_px2
    fv9 = fv.reshape(B, -1, 9)

    # Active-tile compaction: process only the A most-loaded tiles per frame.
    Tc_sz = cfg.tile_chunk
    while T % Tc_sz != 0:  # tile_chunk must divide the tile count
        Tc_sz -= 1
    if cfg.active_fraction >= 1.0:
        A = T
    else:
        A = min(max(-(-int(T * cfg.active_fraction) // Tc_sz), 1) * Tc_sz, T)
    _, act_idx = jax.lax.top_k(counts, A)  # (B, A), most-loaded first
    act_idx = act_idx.astype(jnp.int32)
    tc_count = A // Tc_sz
    act_chunks = jnp.moveaxis(act_idx.reshape(B, tc_count, Tc_sz), 1, 0)

    face_chunk = min(cfg.face_chunk, cfg.cap)
    n_face_steps = -(-cfg.cap // face_chunk)
    # Pad the per-tile lists so every dynamic_slice start is in-bounds:
    # when cap is not a multiple of face_chunk, XLA CLAMPS the last slice's
    # start index, silently re-processing the overlap (e.g. cap 448 /
    # chunk 256 re-ran slots 192-255: duplicate soft ids AND double-counted
    # coverage — caught by the arm-density Pallas parity test).
    cap_pad = n_face_steps * face_chunk
    if cap_pad != cfg.cap:
        tile_ids = jnp.pad(tile_ids, ((0, 0), (0, 0), (0, cap_pad - cfg.cap)),
                           constant_values=-1)

    def raster_chunk(tc):
        # tc: (B, Tc) per-frame tile indices
        Tc = tc.shape[1]
        ids_c = jnp.take_along_axis(tile_ids, tc[:, :, None], axis=1)  # (B, Tc, cap)
        ou = ((tc % nt) * ts).astype(jnp.float32)  # (B, Tc)
        ov = ((tc // nt) * ts).astype(jnp.float32)
        px = ou[:, :, None] + pu[None, None, :]  # (B, Tc, P)
        py = ov[:, :, None] + pv[None, None, :]

        soft_d0 = jnp.full((B, Tc, P, K), jnp.inf, jnp.float32)
        soft_id0 = jnp.full((B, Tc, P, K), -1, jnp.int32)
        base0 = jnp.zeros((B, Tc, P), jnp.int32)
        ssum0 = jnp.zeros((B, Tc, P), jnp.float32)
        hard_z0 = jnp.full((B, Tc, P), jnp.inf, jnp.float32)
        hard_id0 = jnp.full((B, Tc, P), -1, jnp.int32)

        def step(i, state):
            soft_d, soft_id, base, ssum, hard_z, hard_id = state
            sl = jax.lax.dynamic_slice_in_dim(ids_c, i * face_chunk, face_chunk, axis=2)
            slot_valid = sl >= 0
            slc = jnp.maximum(sl, 0)
            # Gather face vertices: (B, Tc, fc, 3, 3)
            fvc = jnp.take_along_axis(
                fv9[:, None], slc[..., None], axis=2
            ).reshape(B, Tc, face_chunk, 3, 3)
            g = face_pixel_geometry(
                fvc[..., None, :, :],  # (B, Tc, fc, 1, 3, 3)
                px[:, :, None, :],
                py[:, :, None, :],
                cfg,
            )
            # (B, Tc, fc, P)
            d_px2 = g["signed_px2"]
            ok = slot_valid[..., None] & g["valid"]
            if need_soft:
                # Slot compaction: keep the FIRST K faces (in bin-list order)
                # within the blur radius. Elementwise only — no per-step sort
                # (the concat+top_k merge measured 13x the hard-raster cost).
                hit = ok & (d_px2 <= blur_px2)
                hit_p = jnp.moveaxis(hit, 2, 3)  # (B, Tc, P, fc)
                d_p = jnp.moveaxis(d_px2, 2, 3)
                id_p = jnp.broadcast_to(
                    jnp.moveaxis(slc[..., None], 2, 3), d_p.shape
                ).astype(jnp.int32)
                pos = base[..., None] + jnp.cumsum(hit_p, axis=-1) - 1
                new_d, new_id = [], []
                for k in range(K):
                    selk = hit_p & (pos == k)  # at most one true along fc
                    dk = jnp.min(jnp.where(selk, d_p, jnp.inf), axis=-1)
                    ik = jnp.max(jnp.where(selk, id_p, -1), axis=-1)
                    cur = soft_d[..., k]
                    take = jnp.isinf(cur) & ~jnp.isinf(dk)
                    new_d.append(jnp.where(take, dk, cur))
                    new_id.append(jnp.where(take, ik, soft_id[..., k]))
                soft_d = jnp.stack(new_d, -1)
                soft_id = jnp.stack(new_id, -1)
                base = base + hit_p.sum(-1).astype(jnp.int32)
                # Coverage log-sum over ALL within-blur faces (not just the
                # K recorded): log(1-p) = -softplus(-d/sigma). Makes the
                # silhouette alpha FORWARD free (no per-pixel re-gather).
                contrib = -jax.nn.softplus(-g["signed_d_ndc2"] / cfg.sigma)
                ssum = ssum + jnp.where(hit, contrib, 0.0).sum(axis=2)
            if need_hard:
                cand_z = jnp.where(ok & g["inside"], g["z"], jnp.inf)  # (B,Tc,fc,P)
                zmin = cand_z.min(axis=2)
                amin = cand_z.argmin(axis=2)
                zid = jnp.take_along_axis(slc, amin.reshape(B, Tc, -1), axis=2).reshape(
                    B, Tc, P
                )
                better = zmin < hard_z
                hard_z = jnp.where(better, zmin, hard_z)
                hard_id = jnp.where(better, zid.astype(jnp.int32), hard_id)
            return soft_d, soft_id, base, ssum, hard_z, hard_id

        soft_d, soft_id, _, ssum, hard_z, hard_id = jax.lax.fori_loop(
            0, n_face_steps, step, (soft_d0, soft_id0, base0, ssum0, hard_z0, hard_id0)
        )
        soft_id = jnp.where(jnp.isinf(soft_d), -1, soft_id)
        return soft_id, ssum, hard_id

    soft_ids, soft_sum, hard_ids = jax.lax.map(raster_chunk, act_chunks)
    # (tc_count, B, Tc, P, ...) -> (B, A, P, ...)
    soft_ids = jnp.moveaxis(soft_ids, 1, 0).reshape(B, A, P, K)
    soft_sum = jnp.moveaxis(soft_sum, 1, 0).reshape(B, A, P)
    hard_ids = jnp.moveaxis(hard_ids, 1, 0).reshape(B, A, P)
    brow = jnp.arange(B)[:, None]
    out = {
        "bin_overflow": (counts > cfg.cap).sum(axis=-1),
        # Tiles with faces that did not fit the active budget.
        "active_overflow": jnp.maximum((counts > 0).sum(-1) - A, 0),
        "span_overflow": span_cnt,
    }
    if compact:
        out["act_idx"] = act_idx
        if need_soft:
            out["soft_ids"] = soft_ids
            out["soft_sum"] = soft_sum
        if need_hard:
            out["hard_ids"] = hard_ids
        return out
    if need_soft:
        full_soft = jnp.full((B, T, P, K), -1, jnp.int32)
        full_soft = full_soft.at[brow, act_idx].set(soft_ids)
        out["soft_ids"] = _untile(full_soft, cfg)
        full_sum = jnp.zeros((B, T, P), jnp.float32)
        full_sum = full_sum.at[brow, act_idx].set(soft_sum)
        out["soft_sum"] = _untile(full_sum, cfg)
    if need_hard:
        full_hard = jnp.full((B, T, P), -1, jnp.int32)
        full_hard = full_hard.at[brow, act_idx].set(hard_ids)
        out["hard_ids"] = _untile(full_hard, cfg)
    return out


def rasterize_soft(verts_px, faces, cfg: RasterConfig):
    """-> (B, H, W, K) int32: first K faces (bin-list order) within the blur
    radius per pixel; -1 for empty slots."""
    faces = as_faces_array(faces)
    out = _rasterize_ids(jax.lax.stop_gradient(verts_px), faces, cfg, True, False)
    return out["soft_ids"]


def rasterize_hard(verts_px, faces, cfg: RasterConfig):
    """-> (B, H, W) int32 id of nearest covering face, -1 for background."""
    faces = as_faces_array(faces)
    out = _rasterize_ids(jax.lax.stop_gradient(verts_px), faces, cfg, False, True)
    return out["hard_ids"]


def rasterize(verts_px, faces, cfg: RasterConfig):
    """Both soft id lists and hard ids in one shared pass."""
    faces = as_faces_array(faces)
    out = _rasterize_ids(jax.lax.stop_gradient(verts_px), faces, cfg, True, True)
    return out["soft_ids"], out["hard_ids"]


def _use_pallas(cfg: RasterConfig) -> bool:
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "xla":
        return False
    # "auto": the Pallas kernel on TPU only (measured 2.6x the XLA tile pass
    # at 448^2 x 8, exact id parity on device). The kernel uses TPU-only
    # Mosaic constructs (PrefetchScalarGridSpec), so CUDA/ROCm backends get
    # the XLA tile pass like CPU does.
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform == "tpu"


def get_ids(verts_px, faces, cfg: RasterConfig, need_soft: bool = True,
            need_hard: bool = True):
    """Unified id rasterization: (soft_ids | None, hard_ids | None).

    Dispatches to the fused Pallas kernel on TPU (which always computes both
    outputs in one count-bounded pass) or the XLA reference path elsewhere.
    """
    if _use_pallas(cfg) and not _pallas_pregather_too_large(verts_px.shape[0], cfg):
        from harp_tpu.render.pallas.raster_kernel import pallas_rasterize

        soft, _, hard = pallas_rasterize(verts_px, faces, cfg,
                                         need_soft=need_soft)
        return soft, (hard if need_hard else None)
    faces = as_faces_array(faces)
    out = _rasterize_ids(
        jax.lax.stop_gradient(verts_px), faces, cfg, need_soft, need_hard
    )
    return out.get("soft_ids"), out.get("hard_ids")


# ---------------------------------------------------------------------------
# Differentiable recompute from ids
# ---------------------------------------------------------------------------


def _pixel_centers(cfg: RasterConfig, dtype=jnp.float32):
    r = jnp.arange(cfg.image_size, dtype=dtype) + 0.5
    px = r[None, :]  # (1, W) broadcast over rows
    py = r[:, None]  # (H, 1)
    return jnp.broadcast_to(px, (cfg.image_size, cfg.image_size)), jnp.broadcast_to(
        py, (cfg.image_size, cfg.image_size)
    )


def soft_alpha_from_ids(ids: jnp.ndarray, verts_px: jnp.ndarray, faces, cfg: RasterConfig):
    """Differentiable silhouette alpha = 1 - prod_k (1 - sigmoid(-d_k/sigma)).

    ids: (B, H, W, K) from rasterize_soft. Gradient flows into verts_px
    through the signed distances of the listed faces (SoftSilhouetteShader +
    softmax blend alpha semantics, pytorch3d blending).
    """
    faces = as_faces_array(faces)
    B = verts_px.shape[0]
    fv9 = verts_px[:, faces].reshape(B, -1, 9)
    px, py = _pixel_centers(cfg)
    K = ids.shape[-1]

    # Static unroll over K (see soft_alpha_from_ids_at: a fori_loop here
    # serializes the per-k gathers in the backward).
    acc = jnp.zeros(ids.shape[:3], verts_px.dtype)
    for k in range(K):
        fid = ids[..., k]  # (B, H, W)
        safe = jnp.maximum(fid, 0)
        fvk = jnp.take_along_axis(
            fv9, safe.reshape(B, -1, 1), axis=1
        ).reshape(B, cfg.image_size, cfg.image_size, 3, 3)
        g = face_pixel_geometry(fvk, px[None], py[None], cfg)
        d = g["signed_d_ndc2"]
        ok = (fid >= 0) & g["valid"] & (d <= cfg.blur_radius)
        # log(1 - sigmoid(-d/sigma)) = -softplus(-d/sigma)
        contrib = -jax.nn.softplus(-d / cfg.sigma)
        acc = acc + jnp.where(ok, contrib, 0.0)
    return 1.0 - jnp.exp(acc)


def barycentrics_of(ids: jnp.ndarray, verts_px: jnp.ndarray, faces, cfg: RasterConfig):
    """Differentiable (bary (B,H,W,3), z (B,H,W), mask (B,H,W)) for hard ids."""
    faces = as_faces_array(faces)
    B = verts_px.shape[0]
    fv9 = verts_px[:, faces].reshape(B, -1, 9)
    safe = jnp.maximum(ids, 0)
    fvk = jnp.take_along_axis(fv9, safe.reshape(B, -1, 1), axis=1).reshape(
        B, cfg.image_size, cfg.image_size, 3, 3
    )
    px, py = _pixel_centers(cfg)
    g = face_pixel_geometry(fvk, px[None], py[None], cfg)
    mask = ids >= 0
    return g["bary"], g["z"], mask


# ---------------------------------------------------------------------------
# Brute-force reference (tests only; O(F * H * W))
# ---------------------------------------------------------------------------


def rasterize_brute(verts_px, faces, cfg: RasterConfig):
    """All-pairs reference rasterizer for small images. Returns same outputs
    as `rasterize` (soft ids sorted by distance, hard ids by depth)."""
    faces = as_faces_array(faces)
    B = verts_px.shape[0]
    fv = jax.lax.stop_gradient(verts_px)[:, faces]  # (B, F, 3, 3)
    px, py = _pixel_centers(cfg)
    g = face_pixel_geometry(
        fv[:, :, None, None, :, :], px[None, None], py[None, None], cfg
    )  # (B, F, H, W)
    d_px2 = g["signed_px2"]
    hit = g["valid"] & (d_px2 <= cfg.blur_px2)
    hit = jnp.moveaxis(hit, 1, -1)  # (B, H, W, F)
    F = hit.shape[-1]
    # First K hits in face-id order (the same policy as the tiled path's
    # slot compaction; bin lists are face-id ordered).
    key = jnp.where(hit, -jnp.arange(F, dtype=jnp.float32), -jnp.inf)
    if F < cfg.faces_per_pixel:
        key = jnp.pad(key, ((0, 0),) * 3 + ((0, cfg.faces_per_pixel - F),),
                      constant_values=-jnp.inf)
    vals, order = jax.lax.top_k(key, cfg.faces_per_pixel)
    soft_ids = jnp.where(vals > -jnp.inf, order.astype(jnp.int32), -1)
    zc = jnp.where(g["inside"], g["z"], jnp.inf)
    hard = jnp.argmin(zc, axis=1).astype(jnp.int32)
    hard_ids = jnp.where(jnp.isinf(zc.min(axis=1)), -1, hard)
    return soft_ids, hard_ids


def raster_full(verts_px, faces, cfg: RasterConfig, need_soft: bool = True,
                need_hard: bool = True):
    """Like get_ids but also returns the coverage log-sum: a dict with
    soft_ids, soft_sum, hard_ids (missing keys when not requested)."""
    if _use_pallas(cfg) and not _pallas_pregather_too_large(verts_px.shape[0], cfg):
        from harp_tpu.render.pallas.raster_kernel import pallas_rasterize

        soft, ssum, hard = pallas_rasterize(verts_px, faces, cfg,
                                            need_soft=need_soft)
        out = {}
        if need_soft:
            out["soft_ids"], out["soft_sum"] = soft, ssum
        if need_hard:
            out["hard_ids"] = hard
        return out
    faces = as_faces_array(faces)
    return _rasterize_ids(
        jax.lax.stop_gradient(verts_px), faces, cfg, need_soft, need_hard
    )


def soft_alpha_fast(ids: jnp.ndarray, soft_sum: jnp.ndarray, verts_px: jnp.ndarray,
                    faces, cfg: RasterConfig) -> jnp.ndarray:
    """Silhouette alpha with the forward taken from the raster pass's
    accumulated log-sum (free) and the backward recomputed from the K ids
    (identical gradients to soft_alpha_from_ids — pixels with >K
    within-blur contributors are saturated, where the gradient vanishes)."""
    faces = as_faces_array(faces)
    ids = jax.lax.stop_gradient(ids)
    soft_sum = jax.lax.stop_gradient(soft_sum)

    @jax.custom_vjp
    def alpha(v):
        return 1.0 - jnp.exp(soft_sum)

    def fwd(v):
        return alpha(v), v

    def bwd(v, g):
        _, vjp = jax.vjp(lambda vv: soft_alpha_from_ids(ids, vv, faces, cfg), v)
        return vjp(g)

    alpha.defvjp(fwd, bwd)
    return alpha(verts_px)


# ---------------------------------------------------------------------------
# Compact (active-tile) interface: differentiable per-pixel work on
# (B, A, P) arrays instead of (B, H, W) — the subject covers a minority of
# tiles, so shading/coverage recompute and their backward gathers shrink by
# the active fraction. Exact: inactive tiles are background by construction.
# ---------------------------------------------------------------------------


def _rasterize_ids_compact(verts_px, faces, cfg: RasterConfig, need_soft: bool,
                           need_hard: bool):
    """XLA tile pass with compact per-active-tile outputs (no scatter back
    to the full image — the tile pass computes compact arrays natively)."""
    return _rasterize_ids(verts_px, faces, cfg, need_soft, need_hard,
                          compact=True)


def _pallas_pregather_too_large(B: int, cfg: RasterConfig,
                                limit_bytes: int = 256 * 1024 * 1024) -> bool:
    """The Pallas path pre-gathers a (B, A, cap, 16) f32 face buffer. With
    an unbounded active budget at high resolution this can reach ~1 GB
    (B18, A=784, cap 256 = 918 MB) — enough to crash the TPU worker once
    the gradient graph's residents are added. Past `limit_bytes`, fall back
    to the chunked XLA tile pass (correct at any size, just slower).
    Fitting configs stay far below the limit (compaction budgets ~0.35-0.5)."""
    T = (cfg.image_size // cfg.tile) ** 2
    A = T if cfg.active_fraction >= 1.0 else int(T * cfg.active_fraction)
    return B * A * cfg.cap * 16 * 4 > limit_bytes


def raster_compact(verts_px, faces, cfg: RasterConfig, need_soft: bool = True,
                   need_hard: bool = True):
    """Unified compact rasterization entry: dict with act_idx (B, A),
    soft_ids (B, A, P, K), soft_sum (B, A, P), hard_ids (B, A, P),
    bin_overflow, active_overflow. Dispatches to the Pallas kernel on
    accelerators, the XLA tile pass on CPU.

    NOTE the two backends may round the active budget to different
    granularities (tile_chunk vs the kernel's TC); both are exact for any
    budget that covers the occupied tiles."""
    faces = as_faces_array(faces)
    verts_px = jax.lax.stop_gradient(verts_px)
    if _use_pallas(cfg) and not _pallas_pregather_too_large(verts_px.shape[0], cfg):
        from harp_tpu.render.pallas.raster_kernel import pallas_raster_compact

        # need_soft=False statically elides the kernel's soft-list/coverage
        # work (the edge-distance stack is most of the pair cost) — the
        # depth-only mode the shadow light pass uses.
        out = dict(pallas_raster_compact(verts_px, faces, cfg,
                                         need_soft=need_soft))
        if not need_hard:
            out.pop("hard_ids", None)
        return out
    return _rasterize_ids_compact(verts_px, faces, cfg, need_soft, need_hard)


def _retile(x: jnp.ndarray, cfg: RasterConfig):
    """(B, H, W, ...) -> (B, T, P, ...): inverse of _untile."""
    ts = cfg.tile
    nt = cfg.image_size // ts
    trailing = x.shape[3:]
    x = x.reshape((x.shape[0], nt, ts, nt, ts) + trailing)
    x = jnp.moveaxis(x, 2, 3)  # (B, nt, nt, ts, ts, ...)
    return x.reshape((x.shape[0], nt * nt, ts * ts) + trailing)


def tile_pixel_coords(act_idx: jnp.ndarray, cfg: RasterConfig):
    """Pixel-center coordinates for compact tiles: (B, A, P) px / py."""
    ts = cfg.tile
    nt = cfg.image_size // ts
    j = jnp.arange(ts * ts, dtype=jnp.float32)
    pu = (j % ts) + 0.5
    pv = (j // ts) + 0.5
    ou = ((act_idx % nt) * ts).astype(jnp.float32)
    ov = ((act_idx // nt) * ts).astype(jnp.float32)
    return ou[..., None] + pu[None, None], ov[..., None] + pv[None, None]


def gather_tiles(img: jnp.ndarray, act_idx: jnp.ndarray, cfg: RasterConfig):
    """Full image (B, H, W, ...) -> compact (B, A, P, ...)."""
    x = _retile(img, cfg)
    return x[jnp.arange(x.shape[0])[:, None], act_idx]


def scatter_tiles(x: jnp.ndarray, act_idx: jnp.ndarray, cfg: RasterConfig, fill):
    """Compact (B, A, P, ...) -> full image (B, H, W, ...), `fill` elsewhere
    (fill may be a scalar or an array broadcastable to the trailing dims)."""
    ts = cfg.tile
    nt = cfg.image_size // ts
    T = nt * nt
    B, A, P = x.shape[:3]
    shape = (B, T, P) + x.shape[3:]
    full = jnp.broadcast_to(jnp.asarray(fill, x.dtype), shape)
    full = full.at[jnp.arange(B)[:, None], act_idx].set(x)
    return _untile(full, cfg)


def soft_alpha_from_ids_at(ids: jnp.ndarray, verts_px: jnp.ndarray, faces,
                           cfg: RasterConfig, px: jnp.ndarray, py: jnp.ndarray):
    """soft_alpha_from_ids generalized to arbitrary pixel coordinates
    (compact tile layout): ids (B, A, P, K), px/py (B, A, P)."""
    faces = as_faces_array(faces)
    B = verts_px.shape[0]
    fv9 = verts_px[:, faces].reshape(B, -1, 9)
    K = ids.shape[-1]

    # STATIC Python loop over K, not fori_loop: the while op serializes 8
    # gather+geometry rounds (profiled 44 ms at 448^2 x B8 in the backward);
    # unrolled, XLA fuses the K gathers and their VJP scatters into batched
    # ops (~2x faster backward for the silhouette term).
    acc = jnp.zeros(ids.shape[:-1], verts_px.dtype)
    for k in range(K):
        fid = ids[..., k]
        safe = jnp.maximum(fid, 0)
        fvk = jnp.take_along_axis(
            fv9, safe.reshape(B, -1, 1), axis=1
        ).reshape(fid.shape + (3, 3))
        g = face_pixel_geometry(fvk, px, py, cfg)
        d = g["signed_d_ndc2"]
        ok = (fid >= 0) & g["valid"] & (d <= cfg.blur_radius)
        contrib = -jax.nn.softplus(-d / cfg.sigma)
        acc = acc + jnp.where(ok, contrib, 0.0)
    return 1.0 - jnp.exp(acc)


def soft_alpha_fast_pack(soft_sum, pack, verts_px, faces, cfg: RasterConfig,
                         interpret: bool = False):
    """Compact silhouette alpha with the FUSED Pallas backward.

    Forward: free (1 - exp of the raster pass's coverage log-sum).
    Backward: the tile kernel recomputes every within-blur face's coverage
    contribution per tile with in-kernel jax.vjp and emits per-tile-slot
    vertex gradients, reduced by one segment scatter — replacing the XLA
    K-id path's per-pixel-per-k gathers + 573k-row scatters (profiled
    ~99 ms/step at 448^2 x B8).

    Semantics: gradient of the EXACT alpha (all within-blur faces), where
    the K-id path truncates to the first K recorded; the two agree to f32
    noise (tests/test_grad_fidelity.py) and the Pallas backward is the
    closer one to the true derivative.
    """
    from harp_tpu.render.pallas.raster_kernel import pallas_coverage_grad

    faces = as_faces_array(faces)
    soft_sum = jax.lax.stop_gradient(soft_sum)
    pack = jax.tree.map(jax.lax.stop_gradient, pack)
    num_verts = verts_px.shape[1]

    @jax.custom_vjp
    def alpha(v):
        return 1.0 - jnp.exp(soft_sum)

    def fwd(v):
        return alpha(v), None

    def bwd(res, g):
        # d alpha / d ssum = -exp(ssum): fold into the upstream gradient.
        g_ssum = -jnp.exp(soft_sum) * g
        dv = pallas_coverage_grad(pack, g_ssum, faces, num_verts, cfg,
                                  interpret=interpret)
        return (dv,)

    alpha.defvjp(fwd, bwd)
    return alpha(verts_px)


def soft_alpha_fast_at(ids, soft_sum, verts_px, faces, cfg: RasterConfig,
                       px, py):
    """Compact-layout soft_alpha_fast: free forward from the raster's
    coverage sum, ids-recompute backward."""
    faces = as_faces_array(faces)
    ids = jax.lax.stop_gradient(ids)
    soft_sum = jax.lax.stop_gradient(soft_sum)

    @jax.custom_vjp
    def alpha(v):
        return 1.0 - jnp.exp(soft_sum)

    def fwd(v):
        return alpha(v), v

    def bwd(v, g):
        _, vjp = jax.vjp(
            lambda vv: soft_alpha_from_ids_at(ids, vv, faces, cfg, px, py), v
        )
        return vjp(g)

    alpha.defvjp(fwd, bwd)
    return alpha(verts_px)


def barycentrics_of_at(ids: jnp.ndarray, verts_px: jnp.ndarray, faces,
                       cfg: RasterConfig, px: jnp.ndarray, py: jnp.ndarray):
    """barycentrics_of generalized to compact tile layout: ids (B, A, P)."""
    faces = as_faces_array(faces)
    B = verts_px.shape[0]
    fv9 = verts_px[:, faces].reshape(B, -1, 9)
    safe = jnp.maximum(ids, 0)
    fvk = jnp.take_along_axis(fv9, safe.reshape(B, -1, 1), axis=1).reshape(
        ids.shape + (3, 3)
    )
    g = face_pixel_geometry(fvk, px, py, cfg)
    return g["bary"], g["z"], ids >= 0
