"""Pallas TPU kernel: sorted-point rasterization as one-hot MXU matmuls.

TPU-native replacement for the scatter-reduction form of
``GroundSegmentation::insert_cloud`` (``GroundSegmentation.cpp:200-311``).
XLA lowers gather/scatter to ~10 ns/element serial loops on TPU, so the two
rasterize scatters (the 5-column sum and the min-height) dominate the
per-scan device time. This kernel removes both: with points *sorted by flat
cell id* the scatter becomes a dense block-local reduction,

    sums[c, k] = sum_p onehot[p, c] * vals[p, k],

and the one-hot factorizes over c = 128*hi + lo as

    sums[lo, NK*(hi mod NW) + k] += A[lo, p] * B[p, NK*(hi mod NW) + k]
    A[lo, p] = (cell[p] mod 128 == lo) & (cell[p] // CB == block)
    B[p, NK*w + k] = (cell[p] // 128 mod NW == w) * vals[k][p]

so each 256-point chunk is a handful of bf16 MXU passes -- both one-hot
factors build in their natural (sublane, lane) orientations, no transposes
anywhere. A is exactly 0/1 (exact in bf16); B ships as an exact 3-way bf16
split (see :func:`build_bt`), so the f32 matmul is reconstructed exactly at
roughly half the MXU cost of ``Precision.HIGHEST`` f32 emulation and with
no VPU work in the loop. Per-cell min/max layers do NOT run in the kernel:
on sorted input they are segmented scans whose run-end values ride the same
matmul as two extra B columns (exactly one nonzero term per cell -- see
core/rasterize.py), which removed a ~0.12 ms masked-reduce pass.

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
CHUNK = 256  # points per matmul chunk (= 2 input rows, lane-concatenated)
CB = 1024  # cells per kernel-grid block
NW = 8  # hi-groups per block (CB / 128)
NK = 8  # value columns (5 used + 3 pad). The transposed (BL, P) B layout
# puts points on lanes, so DMA chunk slices stay 128-lane-aligned for any
# BL and the half-size B (vs the original NK=16) just halves HBM traffic.
BL = NW * NK  # B sublane height == 64
NBUF = 4  # DMA pipeline depth (static slots)


def _num_blocks(n_cells_padded: int) -> int:
    return (n_cells_padded + CB - 1) // CB


def padded_cells(n2: int) -> int:
    """Cells padded so the overflow cell (id n2) lands inside the last block."""
    return _num_blocks(n2 + 1) * CB


def _kernel(row_lo_ref, row_hi_ref, cell_ref, b_hbm, sums_ref, b_buf, sems):
    g = pl.program_id(0)
    lo = row_lo_ref[g]
    nch = row_hi_ref[g] - lo

    sums_ref[:] = jnp.zeros_like(sums_ref)

    r_iota = lax.broadcasted_iota(jnp.int32, (128, ROW), 0)

    def dma(i, slot):
        return pltpu.make_async_copy(
            b_hbm.at[:, pl.ds((lo + i) * CHUNK, CHUNK)],
            b_buf.at[slot],
            sems.at[slot],
        )

    def compute(i, slot):
        row = (lo + i) * (CHUNK // ROW)
        cells = cell_ref[pl.ds(row, 2), :]  # (2, ROW) i32
        in_blk = (cells // CB) == g
        # two half-chunk masks in natural layout, lane-concat for the matmul
        lo_eq = (cells % 128)
        m0 = (lo_eq[0:1] == r_iota) & in_blk[0:1]  # (128, ROW)
        m1 = (lo_eq[1:2] == r_iota) & in_blk[1:2]
        a = jnp.concatenate([m0, m1], axis=1).astype(jnp.bfloat16)  # (128, CHUNK)
        # NT matmul (contract lanes x lanes): B arrives transposed (3*BL,
        # CHUNK) because (3*BL, P) is the orientation the B build produces in
        # natural row-major layout (P on lanes). A is exactly 0/1 (exact in
        # bf16) and B is an exact 3-way bf16 split (see build_bt), so three
        # single-pass bf16 products reconstruct the exact-f32 matmul at half
        # the MXU passes of Precision.HIGHEST f32 emulation.
        s = lax.dot_general(
            a, b_buf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, 3*BL)
        sums_ref[:] += (s[:, :BL] + s[:, BL : 2 * BL]) + s[:, 2 * BL :]

    # 4-deep DMA pipeline, statically unrolled (slots MUST be static: dynamic
    # .at[slot] scratch indexing miscompiles -- see module docstring).
    # Measured ~9% faster than 2-deep; 8-deep is not better.
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


def raster_sums(cell_sorted, b_all, n2: int, interpret: bool = False):
    """Per-cell column sums from cell-sorted points.

    Args:
      cell_sorted: (P,) int32 flat cell ids, **nondecreasing**, in [0, n2]
        (n2 = overflow/padding bin).
      b_all: (3*BL, P) bf16 split B-matrix from :func:`build_bt`.
      n2: number of real cells (grid N*N).

    Returns:
      sums: (n2, NK) f32 -- per-cell column sums (column k = vals[k]),
      exactly ``sum_p onehot[c, p] * vals[k][p]`` up to f32 summation-order
      rounding (products are exact; see build_bt).
    """
    p = cell_sorted.shape[0]
    if p % CHUNK:
        raise ValueError(f"point count {p} must be a multiple of {CHUNK}")
    nch_total = p // CHUNK
    n_pad = padded_cells(n2)
    g_blocks = _num_blocks(n2 + 1)

    # chunk-row range per block: points with cell in [g*CB, (g+1)*CB).
    # searchsorted is NOT used: XLA lowers it to a ~56 us serial while-loop;
    # on sorted input the insertion point is just a count, and the broadcast
    # compare + reduce fuses into one ~17 us vector op.
    bounds = jnp.arange(g_blocks + 1, dtype=jnp.int32) * CB
    pt = jnp.sum(
        (cell_sorted[None, :] < bounds[:, None]).astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    row_lo = pt[:-1] // CHUNK
    row_hi = jnp.minimum((pt[1:] + CHUNK - 1) // CHUNK, nch_total)
    row_hi = jnp.maximum(row_hi, row_lo)

    # minor dim ROW=128: these reshapes are bitcasts, not relayout copies
    cell2d = cell_sorted.reshape(p // ROW, ROW)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),  # b_all off-core; DMA'd
    ]
    sums = pl.pallas_call(
        _kernel,
        grid=(g_blocks,),
        out_shape=jax.ShapeDtypeStruct((g_blocks * 128, BL), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((128, BL), lambda g: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, 3 * BL, CHUNK), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(row_lo, row_hi, cell2d, b_all)

    # unpack [g*128 + lo, NK*w + k] -> cell-major (n_pad, NK)
    sums = sums.reshape(g_blocks, 128, NW, NK).transpose(0, 2, 1, 3)
    sums = sums.reshape(n_pad, NK)[:n2]
    return sums


def build_bt(cell, *vals):
    """(3*BL, P) bf16 split-B: exact 3-way bf16 decomposition of
    ``B[NK*w + k, p] = (cell[p]//128 % NW == w) * vals[k][p]``.

    bf16 keeps 8 mantissa bits per part; three parts with round-to-nearest
    splitting reconstruct any f32 exactly (b2 = fl(v - b1) and
    b3 = fl(v - b1 - b2) are exact f32 subtractions), so the kernel's three
    bf16 MXU passes against the exact 0/1 A mask are bit-equivalent to an
    exact-f32 matmul at half the passes of Precision.HIGHEST.
    """
    if len(vals) > NK:
        raise ValueError(f"at most {NK} value columns, got {len(vals)}")
    w = (cell // 128) % NW
    wm = (
        jnp.arange(NW, dtype=cell.dtype)[:, None] == w[None, :]
    ).astype(jnp.float32)  # (NW, P)
    v = jnp.stack(
        list(vals) + [jnp.zeros_like(vals[0])] * (NK - len(vals)), axis=0
    )  # (NK, P)
    b = (wm[:, None, :] * v[None, :, :]).reshape(BL, cell.shape[0])
    # reduce_precision, NOT a bf16->f32 roundtrip: XLA's fusion pass elides
    # convert(convert(x, bf16), f32) back to x (observed), silently zeroing
    # the correction parts. reduce_precision is semantically the same
    # rounding and cannot be elided.
    b1f = lax.reduce_precision(b, 8, 7)
    r1 = b - b1f
    b2f = lax.reduce_precision(r1, 8, 7)
    b3 = (r1 - b2f).astype(jnp.bfloat16)
    return jnp.concatenate(
        [b1f.astype(jnp.bfloat16), b2f.astype(jnp.bfloat16), b3], axis=0
    )  # (3*BL, P)
