"""Pallas TPU kernel: per-point table lookups for cell-sorted points.

TPU-native replacement for the per-point grid reads of the reference's
classification loop and outlier candidate test (``GroundSegmentation.cpp:
146-189`` reads ground/variance per point; ``:242-246`` reads the terrain
estimate per point). XLA lowers those (P,) row gathers to ~1.8 ns/element
serial loops, which made classify + the candidate test the single largest
cost block of the pipeline (~0.85 ms of a 2.3 ms scan).

With points *sorted by flat cell id* (the flagship sorted-scan mode), each
GROUP of 1024 consecutive points touches a narrow contiguous range of
1024-cell table blocks, so the gather collapses to a per-group loop over
that block range:

    for b in [min(cell)//CB, max(cell)//CB]:
        tile = table[b]                     # (8, 128): cell = CB*b + 128*w + lo
        for w in 0..7:
            vals = lane_gather(tile[w], lo)  # take_along_axis, per-row
            acc  = where(in_block & (w_of(cell) == w), vals, acc)

Total tile visits are bounded by n_groups + n_blocks (the block ranges of
consecutive groups telescope), so the whole (P,) gather is ~250 cheap VPU
tile passes instead of 131k serial gather rows. Correctness does NOT depend
on sortedness (the loop covers [min, max] of each group's blocks and masks
exact matches), only the visit bound does -- unsorted input degrades to a
slow-but-correct sweep, matching the pipeline's fallback philosophy.

The whole table stays VMEM-resident: ncols * padded_cells * 4 bytes
(~1 MB for two columns at the default 364x364 grid, ~12 MB at the 1200^2
stress config -- still within v5e VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groundgrid_tpu.ops.pallas_raster import CB, padded_cells

GROUP = 1024  # points per grid step: one (8, 128) register tile
NW = 8  # 128-cell groups per table block (CB / 128)


def _unroll(g_blocks: int) -> int:
    """Table blocks per loop iteration.

    The block loop is ITERATION-overhead-bound at large grids (the 1200^2
    stress table spans ~1400 blocks and the span term dominates the visit
    bound): unroll=4 measured 200 -> 123 us/call there, while the default
    364^2 grid is flat across 1/2/4 (40.3/39.8/43.4 us). Blocks past b1 (or
    the table end, which the clamped read keeps in-bounds) contribute
    nothing because the ``blk == b`` membership mask uses the UNclamped id.
    """
    return 4 if g_blocks > 256 else 2


def _kernel(ncols, g_blocks, b0_ref, b1_ref, cell_ref, tbl_ref, *out_refs):
    i = pl.program_id(0)
    cells = cell_ref[...]  # (8, 128) int32, any values in [0, G*CB)
    w = (cells // 128) % NW
    lo = cells % 128
    blk = cells // CB

    unroll = _unroll(g_blocks)

    def body(t, accs):
        accs = list(accs)
        for u in range(unroll):
            b = unroll * t + u
            tile = tbl_ref[jnp.minimum(b, g_blocks - 1)]  # (NW * ncols, 128)
            inb = blk == b
            for wi in range(NW):
                m = inb & (w == wi)
                for c in range(ncols):
                    row = tile[c * NW + wi : c * NW + wi + 1, :]  # (1, 128)
                    vals = jnp.take_along_axis(
                        jnp.broadcast_to(row, (GROUP // 128, 128)), lo, axis=1
                    )
                    accs[c] = jnp.where(m, vals, accs[c])
        return tuple(accs)

    init = tuple(jnp.zeros((GROUP // 128, 128), jnp.float32) for _ in range(ncols))
    accs = lax.fori_loop(
        b0_ref[i] // unroll, b1_ref[i] // unroll + 1, body, init
    )
    for c in range(ncols):
        out_refs[c][...] = accs[c]


def sorted_lookup(cell_sorted, tables, n2: int, interpret: bool = False):
    """Per-point ``table[cell]`` for cell-sorted points.

    Args:
      cell_sorted: (P,) int32 flat cell ids in ``[0, n2]`` (n2 = overflow
        bin), nondecreasing for full speed (correct regardless).
      tables: sequence of f32 arrays, each (n2,) flat or (N, N).
      n2: number of real cells (grid N*N).

    Returns:
      tuple of (P,) f32 arrays, ``out[c][p] == tables[c].flat[cell[p]]``
      (overflow/padding bins read 0.0).
    """
    p = cell_sorted.shape[0]
    if p % GROUP:
        raise ValueError(f"point count {p} must be a multiple of {GROUP}")
    ncols = len(tables)
    if ncols < 1:
        raise ValueError("need at least one table")
    n_pad = padded_cells(n2)
    g_blocks = n_pad // CB

    stacked = jnp.concatenate(
        [
            jnp.pad(t.reshape(-1), (0, n_pad - n2)).reshape(g_blocks, NW, 128)
            for t in tables
        ],
        axis=1,
    )  # (G, NW * ncols, 128); cell c -> [c // CB, col*NW + (c//128) % NW, c % 128]

    ng = p // GROUP
    groups = cell_sorted.reshape(ng, GROUP)
    b0 = (jnp.min(groups, axis=1) // CB).astype(jnp.int32)
    b1 = (jnp.max(groups, axis=1) // CB).astype(jnp.int32)
    cell2d = cell_sorted.reshape(p // 128, 128)

    outs = pl.pallas_call(
        functools.partial(_kernel, ncols, g_blocks),
        grid=(ng,),
        out_shape=tuple(
            jax.ShapeDtypeStruct((p // 128, 128), jnp.float32) for _ in range(ncols)
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((GROUP // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((GROUP // 128, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(ncols)
        ),
        interpret=interpret,
    )(b0, b1, cell2d, stacked)
    return tuple(o.reshape(p) for o in outs)
