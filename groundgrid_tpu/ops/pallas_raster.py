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

so each 256-point chunk is ONE (128, 256) @ (256, 128) MXU matmul -- both
one-hot factors build in their natural (sublane, lane) orientations, no
transposes anywhere. The per-cell min rides the same A mask as a VPU masked
min-reduction. Cost is ~2 MXU passes per chunk instead of 256 serial
scatter updates; measured ~5x faster than the two XLA scatters combined.

Work partitioning: kernel grid over blocks of CB=1024 cells; each block
processes the (chunk-aligned, slightly overlapping) range of 256-point
chunks containing its points, located via an XLA-side ``searchsorted`` on
the sorted cell ids. The A-mask's block test makes the chunk overlap exact:
foreign points in a shared boundary chunk contribute zero. B rows stream
from HBM with a double-buffered async copy; the buffer slots are *static*
(the loop is unrolled 2x) -- dynamic ``.at[slot]`` scratch indexing
miscompiles on this toolchain (silent data corruption, observed).

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


def _kernel(with_max, row_lo_ref, row_hi_ref, cell_ref, minv_ref, *rest):
    if with_max:
        maxv_ref, b_hbm, sums_ref, mins_ref, maxs_ref, b_buf, sems = rest
    else:
        maxv_ref, maxs_ref = None, None
        b_hbm, sums_ref, mins_ref, b_buf, sems = rest
    g = pl.program_id(0)
    lo = row_lo_ref[g]
    nch = row_hi_ref[g] - lo

    sums_ref[:] = jnp.zeros_like(sums_ref)
    mins_ref[:] = jnp.full_like(mins_ref, FLT_MAX)
    if with_max:
        maxs_ref[:] = jnp.full_like(maxs_ref, FLT_TINY)

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
        a = jnp.concatenate([m0, m1], axis=1).astype(jnp.float32)  # (128, CHUNK)
        # NT matmul (contract lanes x lanes): B arrives transposed (BL, CHUNK)
        # because (BL, P) is the orientation the B build produces in natural
        # row-major layout (P on lanes) -- the (P, BL) form cost a ~0.1 ms
        # XLA relayout copy per scan.
        # HIGHEST: the MXU's default bf16 input rounding would corrupt the
        # f32 value columns; A is exactly 0/1 so f32-emulation is exact.
        sums_ref[:] += lax.dot_general(
            a, b_buf[slot],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )

        minrow = minv_ref[pl.ds(row, 2), :]  # (2, ROW)
        w_all = (cells // 128) % NW
        cols = []
        for w in range(NW):
            v0 = jnp.where(m0 & (w_all[0:1] == w), minrow[0:1], FLT_MAX)
            v1 = jnp.where(m1 & (w_all[1:2] == w), minrow[1:2], FLT_MAX)
            cols.append(
                jnp.min(jnp.minimum(v0, v1), axis=1, keepdims=True)
            )  # (128, 1)
        mins_ref[:] = jnp.minimum(mins_ref[:], jnp.concatenate(cols, axis=1))

        if with_max:  # aux-layer mode: maxGroundHeight rides the same masks
            maxrow = maxv_ref[pl.ds(row, 2), :]
            mcols = []
            for w in range(NW):
                v0 = jnp.where(m0 & (w_all[0:1] == w), maxrow[0:1], FLT_TINY)
                v1 = jnp.where(m1 & (w_all[1:2] == w), maxrow[1:2], FLT_TINY)
                mcols.append(jnp.max(jnp.maximum(v0, v1), axis=1, keepdims=True))
            maxs_ref[:] = jnp.maximum(maxs_ref[:], jnp.concatenate(mcols, axis=1))

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


def raster_sums_min(cell_sorted, b_all, minv_sorted, n2: int,
                    interpret: bool = False, maxv_sorted=None):
    """Per-cell sums + min (and optionally max) from cell-sorted points.

    Args:
      cell_sorted: (P,) int32 flat cell ids, **nondecreasing**, in [0, n2]
        (n2 = overflow/padding bin).
      b_all: (BL, P) f32 transposed B-matrix from :func:`build_bt`.
      minv_sorted: (P,) f32 min-candidates (+FLT_MAX where not accepted).
      n2: number of real cells (grid N*N).
      maxv_sorted: optional (P,) f32 max-candidates (FLT_TINY where not
        accepted); when given, a per-cell max output is added (aux-layer
        mode: the reference's dead-but-published maxGroundHeight).

    Returns:
      sums: (n2, NK) f32 -- per-cell column sums (column k = vals[k]).
      mins: (n2,) f32 -- per-cell minimum of minv (+FLT_MAX where empty).
      maxs: (n2,) f32 -- only when ``maxv_sorted`` is given.
    """
    p = cell_sorted.shape[0]
    if p % CHUNK:
        raise ValueError(f"point count {p} must be a multiple of {CHUNK}")
    with_max = maxv_sorted is not None
    nch_total = p // CHUNK
    n_pad = padded_cells(n2)
    g_blocks = _num_blocks(n2 + 1)

    # chunk-row range per block: points with cell in [g*CB, (g+1)*CB)
    bounds = jnp.arange(g_blocks + 1, dtype=jnp.int32) * CB
    pt = jnp.searchsorted(cell_sorted, bounds, side="left").astype(jnp.int32)
    row_lo = pt[:-1] // CHUNK
    row_hi = jnp.minimum((pt[1:] + CHUNK - 1) // CHUNK, nch_total)
    row_hi = jnp.maximum(row_hi, row_lo)

    # minor dim ROW=128: these reshapes are bitcasts, not relayout copies
    cell2d = cell_sorted.reshape(p // ROW, ROW)
    minv2d = minv_sorted.reshape(p // ROW, ROW)

    grid_spec = pl.BlockSpec((128, NW), lambda g: (g, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((g_blocks * 128, BL), jnp.float32),
        jax.ShapeDtypeStruct((g_blocks * 128, NW), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((128, BL), lambda g: (g, 0), memory_space=pltpu.VMEM),
        grid_spec,
    ]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [row_lo, row_hi, cell2d, minv2d]
    if with_max:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(maxv_sorted.reshape(p // ROW, ROW))
        out_shape.append(jax.ShapeDtypeStruct((g_blocks * 128, NW), jnp.float32))
        out_specs.append(grid_spec)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # b_all off-core; DMA'd
    operands.append(b_all)

    outs = pl.pallas_call(
        functools.partial(_kernel, with_max),
        grid=(g_blocks,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((NBUF, BL, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        interpret=interpret,
    )(*operands)
    sums, mins = outs[0], outs[1]

    def uncol(a):  # [g*128 + lo, w] -> cell-major; c = CB*g + 128*w + lo
        return a.reshape(g_blocks, 128, NW).transpose(0, 2, 1).reshape(n_pad)[:n2]

    # unpack [g*128 + lo, NK*w + k] -> cell-major (n_pad, NK)
    sums = sums.reshape(g_blocks, 128, NW, NK).transpose(0, 2, 1, 3)
    sums = sums.reshape(n_pad, NK)[:n2]
    if with_max:
        return sums, uncol(mins), uncol(outs[2])
    return sums, uncol(mins)


def build_bt(cell, *vals):
    """(BL, P) transposed B: ``B[NK*w + k, p] = (cell[p]//128 % NW == w) * vals[k][p]``.

    Points ride the LANE dimension throughout, so every broadcast builds in
    its natural row-major layout and XLA hands the kernel the array with no
    relayout copy (the (P, BL) orientation cost a ~0.1 ms copy per scan plus
    a slower minor-dim-16 build).
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
    return (wm[:, None, :] * v[None, :, :]).reshape(BL, cell.shape[0])
