"""Pallas TPU kernel for the PCF shadow-map gradient scatter.

The backward of the 3x3 PCF visibility (shadow.py `_pcf_sum`) w.r.t. the
light-view depth map is a scatter-add: every camera pixel i adds its 9 tap
gradients upd[i, t] to the 3x3 patch of the (edge-padded) depth map centered
at its tap coordinates. As an XLA row-scatter over the pre-shifted tap stack
this is the single largest op in the train step (79.4 ms at 448^2 x B18,
Q=226^2, N=56320x9 rows; sorted/segment variants measured worse — NEXT.md
round 3). In the reference stack this work is inside pytorch3d's CUDA
autograd of the shadow texture lookup (renderer_helper.py:391-408).

This kernel reformulates the scatter as dense MXU work over the *local
footprint* of each 256-pixel group: a camera tile's pixels project into a
small row-window of the light map, so its contribution is

    dpad[w0:w0+WR, :] += sum_dj  A_dj^T  (one-hot rows, upd-weighted)
                                @ B_dj   (one-hot cols)

with A_dj (WR, P) built already-transposed from a row-index iota and
B_dj (P, LANES) from a column iota — three (WR, P) @ (P, LANES) f32
matmuls per window, no gather/scatter at all. Groups whose row span
exceeds one window walk ceil(span/WR) disjoint windows (exact for ANY
span — a pathological group just pays more windows). The (R, LANES)
accumulator is the kernel's output block, revisited across the frame's
grid steps (grid = (B, T), T groups of P=256 pixels), so it lives in VMEM
for the whole frame and is written back to HBM once.

Arithmetic: ~6.3 MMACs + ~0.4M VPU ops per window, ~1.2 windows/group
=> ~2 ms/step at the protocol shape vs 79 ms for the XLA scatter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 256  # pixels per group (one camera raster tile at tile=16)
WR = 32  # accumulator window rows per matmul


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(yc_ref, xc_ref, upd_ref, out_ref, *, k_max: int, lanes: int):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    yc = yc_ref[0, 0, 0, :].reshape(1, P)  # (1, P) int32, in [1, Hl+3]
    xc = xc_ref[0, 0, 0, :].reshape(P, 1)  # (P, 1) int32

    # Touched rows of this group: [min(yc)-1, max(yc)+1]. Window starts are
    # sublane-aligned (multiple of 8) so the accumulator RMW slices cheaply.
    lo = ((jnp.min(yc) - 1) // 8) * 8
    hi = jnp.max(yc) + 1
    nwin = (hi - lo) // WR + 1  # cdiv(hi - lo + 1, WR) for aligned lo

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (WR, P), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (P, lanes), 1)

    for k in range(k_max):
        @pl.when(k < nwin)
        def _():
            w0 = pl.multiple_of(lo + k * WR, 8)
            for dj in (-1, 0, 1):
                # B_dj[p, c] = [xc[p] + dj == c]
                bm = (col_iota == xc + dj).astype(jnp.float32)
                # A_dj^T[r, p] = sum_di [yc[p] + di == w0 + r] * upd[tap]
                a_t = jnp.zeros((WR, P), jnp.float32)
                for di in (-1, 0, 1):
                    tap = 3 * (di + 1) + (dj + 1)
                    u = upd_ref[0, 0, tap, :].reshape(1, P)
                    a_t = a_t + jnp.where(
                        row_iota == (yc + di - w0), u, 0.0
                    )
                # HIGHEST: the MXU's default f32 handling rounds operands
                # to one bf16 pass (measured ~1e-3 rel error on real TPU);
                # with B one-hot (exact in bf16) the 3-pass decomposition
                # of A reproduces the f32 scatter bit-exactly.
                out_ref[0, pl.ds(w0, WR), :] += jax.lax.dot_general(
                    a_t, bm,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )


@partial(jax.jit, static_argnames=("hl", "interpret"))
def pallas_pcf_scatter(yc, xc, upd, hl: int, interpret: bool = False):
    """Scatter 3x3 tap gradients into the padded light-depth gradient.

    yc, xc: (B, N) int32 CENTER tap coordinates in the twice-edge-padded
    map, i.e. clip(y, -1, Hl) + 2 (so taps yc+di stay in [1, Hl+3]).
    upd: (B, N, 9) f32 per-tap gradients, tap order t = 3*(di+1) + (dj+1)
    for di, dj in (-1, 0, 1). hl: light-map size Hl.

    Returns dpad (B, Hl+4, Hl+4) f32 with
    dpad[b, yc+di, xc+dj] += upd[b, i, 3*(di+1)+(dj+1)] — exactly the
    transpose of the 9-plane tap-stack gather in shadow._tap_stack,
    expressed on the padded map (the caller folds the edge padding).
    """
    B, N = yc.shape
    hp4 = hl + 4
    lanes = _round_up(hp4, 128)
    if N % P:
        pad = P - N % P
        # Zero updates contribute exactly zero wherever they land.
        yc = jnp.pad(yc, ((0, 0), (0, pad)), constant_values=2)
        xc = jnp.pad(xc, ((0, 0), (0, pad)), constant_values=2)
        upd = jnp.pad(upd, ((0, 0), (0, pad), (0, 0)))
        N += pad
    T = N // P
    # The unit axis keeps the block's last two dims equal to the array's
    # (Mosaic requires (8, 128)-divisible or dim-equal trailing block dims).
    yc = yc.reshape(B, T, 1, P)
    xc = xc.reshape(B, T, 1, P)
    # Taps on sublanes: extracting tap t in-kernel is a sublane slice.
    upd = jnp.moveaxis(upd.reshape(B, T, P, 9), 3, 2)  # (B, T, 9, P)

    # Rows: window starts are 8-aligned in [0, Hl+3]; the last window
    # reaches at most round_down(Hl+3, 8) + WR <= Hl + 3 + WR.
    rows = _round_up(hp4 + WR, WR)
    k_max = rows // WR

    out = pl.pallas_call(
        partial(_kernel, k_max=k_max, lanes=lanes),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, P), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, rows, lanes), jnp.float32),
        interpret=interpret,
    )(yc, xc, upd)
    return out[:, :hp4, :hp4]


def fold_pad2(dpad):
    """Transpose of jnp.pad(depth, 2, mode="edge"): fold the 2 border
    rows/cols of the (B, Hl+4, Hl+4) padded gradient into the nearest core
    row/col -> (B, Hl, Hl)."""
    def fold_rows(x):
        first = x[:, 2:3] + x[:, 0:2].sum(axis=1, keepdims=True)
        last = x[:, -3:-2] + x[:, -2:].sum(axis=1, keepdims=True)
        return jnp.concatenate([first, x[:, 3:-3], last], axis=1)

    x = fold_rows(dpad)
    return fold_rows(x.swapaxes(1, 2)).swapaxes(1, 2)
