"""Pallas TPU kernel: sorted-point rasterization as one-hot MXU matmuls.

TPU-native replacement for the scatter-reduction form of
``GroundSegmentation::insert_cloud`` (``GroundSegmentation.cpp:200-311``).
XLA lowers gather/scatter to ~10 ns/element serial loops on TPU, so the two
rasterize scatters (the 5-column sum and the min-height) dominate the
per-scan device time. This kernel removes both: with points *sorted by flat
cell id* the scatter becomes a dense block-local reduction,

    sums[c, k] = sum_p onehot[p, c] * vals[p, k],

and the one-hot factorizes over c = 128*hi + lo as

    sums[lo, C*(hi mod NW) + j] += A[lo, p] * B[p, C*(hi mod NW) + j]
    A[lo, p] = (cell[p] mod 128 == lo) & (cell[p] // CB == block)
    B[p, C*w + j] = (cell[p] // 128 mod NW == w) * parts[j][p]

so each 256-point chunk is a handful of bf16 MXU passes -- both one-hot
factors build in their natural (sublane, lane) orientations, no transposes
anywhere. A is exactly 0/1 (exact in bf16); each value column ships as a
COLUMN-AWARE exact bf16 split (see :func:`build_parts`): 0/1 indicator
columns are bf16-exact in ONE part, real-valued columns take the exact
3-way round-to-nearest split. The packing matters for speed, not just
memory: the standard 6-column call packs into 14 parts, padded to 16 (an
8-multiple, so the (NW, C, P) reshape stays a bitcast) = NW*16 = 128
B-rows -- still a single 128-lane MXU N-tile -- where a uniform 3-way
split needs 18 parts padded to 24 = 192 rows and two N-tiles. The MXU pass count (the kernel's measured wall: per-chunk
matmuls with fresh weights run far below peak) halves: 210 -> 130 us/scan.
Per-cell min/max layers do NOT run in the kernel: on sorted input they are
segmented scans whose run-end values ride the same matmul as extra columns
(exactly one nonzero term per cell -- see core/rasterize.py), keeping them
bitwise exact through the split.

Work partitioning: kernel grid over blocks of CB=1024 cells; each block
processes the (chunk-aligned, slightly overlapping) range of 256-point
chunks containing its points, located by a fused vectorized count on the
sorted cell ids (XLA searchsorted is a ~56 us serial while-loop). The
A-mask's block test makes the chunk overlap exact: foreign points in a
shared boundary chunk contribute zero. B rows stream from HBM with a
4-deep double-buffered async copy; the buffer slots are *static* --
dynamic ``.at[slot]`` scratch indexing miscompiles on this toolchain
(silent data corruption, observed).

Inputs must be sorted by ``cell``; the pipeline verifies monotonicity on
device and falls back to the XLA scatter path otherwise (see
core/rasterize.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = np.float32(np.finfo(np.float32).max)
FLT_TINY = np.float32(np.finfo(np.float32).tiny)  # C++ FLT_MIN (max-layer reset quirk)

ROW = 128  # input row width: the (P,) -> (P/ROW, ROW) reshape is a pure
# bitcast only at 128 lanes (1-D T(1024) tiling == 2-D T(8,128) row-major);
# wider minor dims drag serial relayout copies into the pipeline
CHUNK = 512  # points per matmul chunk (= 4 input rows, lane-concatenated;
# 512 over 256 halves the per-chunk fixed costs -- accumulate add, dot
# issue, loop management -- at the same MXU pass count)
CB = 1024  # cells per kernel-grid block
NW = 8  # hi-groups per block (CB / 128)
NBUF = 4  # DMA pipeline depth (static slots)


def _num_blocks(n_cells_padded: int) -> int:
    return (n_cells_padded + CB - 1) // CB


def padded_cells(n2: int) -> int:
    """Cells padded so the overflow cell (id n2) lands inside the last block."""
    return _num_blocks(n2 + 1) * CB


def build_parts(cell, cols, exact):
    """(NW*C, P) bf16 split-B with a column-aware exact decomposition.

    ``cols``: value columns (each (P,) f32). ``exact``: per-column bool --
    True promises the column's values are exactly bf16-representable (0/1
    indicators, small integers), shipping in ONE part; False takes the
    exact 3-way bf16 split (b2 = fl(v - b1), b3 = fl(v - b1 - b2) are exact
    f32 subtractions, so the three parts sum to v exactly).

    Returns ``(b, spans)``: ``b`` is the (NW*C_pad, P) bf16 matrix with row
    ``C_pad*w + j`` = (cell//128 % NW == w) * parts[j], and ``spans`` the
    number of parts per column (in order), ``C = sum(spans)``. C is padded
    to a multiple of 8 with zero parts (C_pad) so the final
    (NW, C_pad, P) -> (NW*C_pad, P) reshape is a pure BITCAST under the
    (8, 128) tiling -- an unpadded middle dim makes XLA materialize a
    ~40 us relayout copy of the whole B matrix.
    """
    parts = []
    spans = []
    for v, ex in zip(cols, exact):
        if ex:
            parts.append(v)
            spans.append(1)
        else:
            # reduce_precision, NOT a bf16->f32 roundtrip: XLA's fusion pass
            # elides convert(convert(x, bf16), f32) back to x (observed),
            # silently zeroing the correction parts. reduce_precision is the
            # same rounding and cannot be elided.
            b1 = lax.reduce_precision(v, 8, 7)
            r1 = v - b1
            b2 = lax.reduce_precision(r1, 8, 7)
            b3 = r1 - b2
            parts += [b1, b2, b3]
            spans.append(3)
    c = len(parts)
    w = (cell // 128) % NW
    wm = (
        jnp.arange(NW, dtype=cell.dtype)[:, None] == w[None, :]
    ).astype(jnp.float32)  # (NW, P)
    if c == 1:
        # single column: (NW, P) directly, no middle dim to pad
        b = wm * parts[0][None, :]
        return b.astype(jnp.bfloat16), tuple(spans)
    c_pad = -(-c // 8) * 8
    parts += [jnp.zeros_like(parts[0])] * (c_pad - c)
    pv = jnp.stack(parts, axis=0)  # (C_pad, P)
    b = (wm[:, None, :] * pv[None, :, :]).reshape(NW * c_pad, cell.shape[0])
    return b.astype(jnp.bfloat16), tuple(spans)


def _make_kernel(rows: int, spans: tuple):
    c_pad = rows // NW
    offs = []  # static (offset, span) per logical column
    o = 0
    for span in spans:
        offs.append((o, span))
        o += span

    def _kernel(row_lo_ref, row_hi_ref, cell_ref, b_hbm, *refs):
        out_refs = refs[: len(spans)]
        acc_ref, b_buf, sems = refs[len(spans) :]
        g = pl.program_id(0)
        lo = row_lo_ref[g]
        nch = row_hi_ref[g] - lo

        acc_ref[:] = jnp.zeros_like(acc_ref)

        r_iota = lax.broadcasted_iota(jnp.int32, (128, ROW), 0)

        def dma(i, slot):
            return pltpu.make_async_copy(
                b_hbm.at[:, pl.ds((lo + i) * CHUNK, CHUNK)],
                b_buf.at[slot],
                sems.at[slot],
            )

        def compute(i, slot):
            nrow = CHUNK // ROW
            row = (lo + i) * nrow
            cells = cell_ref[pl.ds(row, nrow), :]  # (CHUNK/ROW, ROW) i32
            in_blk = (cells // CB) == g
            # per-input-row masks in natural layout, lane-concat for the matmul
            lo_eq = (cells % 128)
            a = jnp.concatenate(
                [
                    (lo_eq[r : r + 1] == r_iota) & in_blk[r : r + 1]
                    for r in range(nrow)
                ],
                axis=1,
            ).astype(jnp.bfloat16)  # (128, CHUNK)
            # NT matmul (contract lanes x lanes): B arrives transposed
            # (rows, CHUNK) because (rows, P) is the orientation the B build
            # produces in natural row-major layout (P on lanes). A is exactly
            # 0/1 and every B part is bf16-exact, so the bf16 products are
            # exact and part-sums reconstruct the f32 matmul exactly.
            # B is the LEFT operand so the accumulator lands part-major
            # (rows, 128-lo): the per-column part combine then happens on
            # SUBLANE slices in-kernel, and each logical column streams out
            # as its own contiguous cell-major array -- no (g, 128, NW,
            # c_pad) transpose relayout and no width-1 lane extracts in the
            # XLA unpack (O(N^2) costs that dominated the 1200^2 grid).
            s = lax.dot_general(
                b_buf[slot], a,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (rows, 128)
            acc_ref[:] += s

        # 4-deep DMA pipeline, statically unrolled (slots MUST be static:
        # dynamic .at[slot] scratch indexing miscompiles -- see module
        # docstring). Measured ~9% faster than 2-deep; 8-deep is not better.
        for w in range(NBUF - 1):
            @pl.when(w < nch)
            def _(w=w):
                dma(w, w).start()

        def body(j, _):
            i = NBUF * j
            for t in range(NBUF):
                @pl.when(i + t + NBUF - 1 < nch)
                def _(t=t):
                    dma(i + t + NBUF - 1, (t + NBUF - 1) % NBUF).start()

                @pl.when(i + t < nch)
                def _(t=t):
                    dma(i + t, t).wait()
                    compute(i + t, t)
            return 0

        lax.fori_loop(0, (nch + NBUF - 1) // NBUF, body, 0)

        # part combine + store: out[k][w] = sum_j acc[w*c_pad + off_k + j]
        # (static sublane slices; add order matches the old XLA unpack's
        # left-to-right part sum, so results are bitwise identical)
        for k, (off, span) in enumerate(offs):
            for w in range(NW):
                col = acc_ref[w * c_pad + off : w * c_pad + off + 1, :]
                for j in range(1, span):
                    col = col + acc_ref[
                        w * c_pad + off + j : w * c_pad + off + j + 1, :
                    ]
                out_refs[k][w : w + 1, :] = col

    return _kernel


def raster_sums(cell_sorted, cols, exact, n2: int, interpret: bool = False):
    """Per-cell column sums from cell-sorted points.

    Args:
      cell_sorted: (P,) int32 flat cell ids, **nondecreasing**, in [0, n2]
        (n2 = overflow/padding bin).
      cols: list of (P,) f32 value columns.
      exact: list of bool, one per column -- True marks columns whose values
        are exactly bf16-representable (single-part shipping; see
        :func:`build_parts`).
      n2: number of real cells (grid N*N).

    Returns:
      tuple of (n2,) f32 per-cell column sums, exactly
      ``sum_p onehot[c, p] * cols[k][p]`` up to f32 summation-order rounding
      (products are exact). Columns with at most one accepted point per cell
      (run-end min/max columns) are bitwise exact. (A tuple, not a stacked
      (n2, k) array: the stack is a measurable 17 us interleave write and
      every caller immediately unstacks.)
    """
    p = cell_sorted.shape[0]
    if p % CHUNK:
        raise ValueError(f"point count {p} must be a multiple of {CHUNK}")
    if len(cols) != len(exact):
        raise ValueError("cols and exact must have equal length")
    nch_total = p // CHUNK
    n_pad = padded_cells(n2)
    g_blocks = _num_blocks(n2 + 1)

    b_all, spans = build_parts(cell_sorted, cols, exact)
    rows = b_all.shape[0]
    c_pad = rows // NW  # includes the build's zero-padding parts

    # chunk-row range per block: points with cell in [g*CB, (g+1)*CB).
    # searchsorted is NOT used: XLA lowers it to a ~56 us serial while-loop.
    # The ranges are only needed at CHUNK granularity, so the count compares
    # per-chunk first/last cells (sorted input: chunk min/max) against the
    # block bounds -- (g_blocks+1, n_chunks) elements instead of the
    # (g_blocks+1, P) point-level compare, which is O(N^2 * P) and costs
    # ~190 us at the 1200^2 stress grid (~17 us at 364^2).
    #   row_lo[g] = #chunks entirely below g*CB   (= pt[g] // CHUNK)
    #   row_hi[g] = #chunks with any cell < (g+1)*CB (= ceil-div of pt[g+1])
    bounds = jnp.arange(g_blocks + 1, dtype=jnp.int32) * CB
    # sorted: a chunk's first/last element are its min/max (strided 1-D
    # slices, not a (nch, CHUNK) reshape -- minor dim 512 would relayout)
    cmin = lax.slice(cell_sorted, (0,), (p,), (CHUNK,))
    cmax = lax.slice(cell_sorted, (CHUNK - 1,), (p,), (CHUNK,))
    row_lo = jnp.sum(
        (cmax[None, :] < bounds[:-1, None]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    row_hi = jnp.sum(
        (cmin[None, :] < bounds[1:, None]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    row_hi = jnp.maximum(row_hi, row_lo)

    # minor dim ROW=128: these reshapes are bitcasts, not relayout copies
    cell2d = cell_sorted.reshape(p // ROW, ROW)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # b_all off-core; DMA'd
    ]
    # one contiguous cell-major output PER logical column: block g covers
    # cells [g*CB, (g+1)*CB) as an (NW, 128) tile; the (n_pad//128, 128) ->
    # (n_pad,) reshape below is a pure bitcast, so callers read each column
    # without any relayout (the old single (g_blocks*128, rows) output
    # needed an O(N^2) transpose + width-1 lane extracts to unpack)
    outs = pl.pallas_call(
        _make_kernel(rows, spans),
        grid=(g_blocks,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.float32)
            for _ in spans
        ),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((NW, 128), lambda g: (g, 0), memory_space=pltpu.VMEM)
            for _ in spans
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, 128), jnp.float32),  # part-major accumulator
            pltpu.VMEM((NBUF, rows, CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(row_lo, row_hi, cell2d, b_all)
    return tuple(o.reshape(n_pad)[:n2] for o in outs)
