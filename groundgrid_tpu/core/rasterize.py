"""Point-cloud rasterization: scatter points into per-cell accumulators.

TPU-native replacement for ``GroundSegmentation::insert_cloud``
(``GroundSegmentation.cpp:200-311``). The reference mutates shared per-cell
running accumulators from 8 racing threads (count, running mean z, Welford
mean/M2 of z - origin.z, min z with a -1e-4 epsilon, max z, raw count); here
the same statistics are produced by *deterministic* fused scatter reductions.

In exact arithmetic every layer equals the reference's sequential formulas
(the Welford M2 becomes the shifted two-pass form
``m2 = sum pd'^2 - (sum pd')^2 / n`` with a per-scan conditioning shift);
determinism is a behavioral improvement over the reference's tolerated data
races (SURVEY.md section 2.2).

Layout: everything point-indexed is a flat (P,) array (SoA). On TPU, (P, k)
arrays with tiny minor dimensions tile to (8, 128) with ~97% padding and
drag multi-millisecond relayout copies into the pipeline; 1-D arrays ride the
vectorized fast paths for elementwise, gather AND scatter ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import exactf32

FLT_MAX = np.float32(np.finfo(np.float32).max)
FLT_TINY = np.float32(np.finfo(np.float32).tiny)  # C++ FLT_MIN


class RasterLayers(NamedTuple):
    """Per-scan scratch layers, names as in the reference grid map (2.3)."""

    points: jax.Array  # accepted point count per cell
    points_raw: jax.Array  # all in-map points (evaluation layer)
    ground_candidates: jax.Array  # mean z (dead-but-published in reference)
    plane_dist: jax.Array  # mean (z - origin.z) (dead-but-published)
    mean_variance: jax.Array  # Welford mean == mean pd (dead-but-published)
    m2: jax.Array  # Welford M2 == sum (pd - mean)^2
    min_ground_height: jax.Array
    max_ground_height: jax.Array
    variance: jax.Array  # m2 / (points + FLT_MIN)  (GroundSegmentation.cpp:323)


class Binning(NamedTuple):
    """Per-point cell assignment shared by all stages (all (P,) flat)."""

    gi0: jax.Array  # (P,) int32 row index
    gi1: jax.Array  # (P,) int32 col index
    cell: jax.Array  # (P,) int32 flat cell id; == n*n for out-of-map/padding
    inmap: jax.Array  # (P,) bool valid & inside grid
    ignored: jax.Array  # (P,) bool in-map but ring/near-field ignored
    sqdist: jax.Array  # (P,) f32 squared xy distance to sensor origin


def faithful_cells(config: GroundGridConfig, center, center_lo, x, y, xp=jnp):
    """(gi0, gi1) int32 cell indices, faithful to the f64 oracle binning.

    Evaluates grid_map's double-precision ``getIndexFromPosition`` --
    ``floor((center + half - coord) / res)`` in f64 (golden.py ``_index``) --
    via double-single arithmetic (core/exactf32.ds_bin): exact outside a
    ~2^-46|center| band around each cell edge, the same order as the f64
    oracle's own rounding. Backend-agnostic and bit-identical between
    ``xp=jnp`` (the device pipeline) and ``xp=np`` (the sorted-scan host
    prep, pipeline.predict_cells) by running the identical f32 op sequence.

    ``center_lo``: the ds tail of the f64 center (GridState.center_lo);
    ``None`` degrades to a zero tail (an exactly-f32 center).
    """
    rh, rl, inv = exactf32.res_ds(config.resolution)
    # half_length (cells * res / 2) is an f64 product the oracle adds at
    # full precision; 60.06 etc. are NOT f32-exact, so the ds image of the
    # f64 half must be added (a plain f32 half cost 1.4e-6 m of edge error
    # -- the residual mis-binning seed after the round-3 ds_bin fix)
    hh, hl = exactf32.f64_to_ds(np.float64(config.half_length))
    if center_lo is None:
        cl0 = cl1 = np.float32(0.0)
    else:
        cl0, cl1 = center_lo[0], center_lo[1]
    sh0, sl0 = exactf32.ds_add(center[0], cl0, hh, hl)
    sh1, sl1 = exactf32.ds_add(center[1], cl1, hh, hl)
    gi0 = exactf32.ds_bin(sh0, sl0, x, rh, rl, inv, xp)
    gi1 = exactf32.ds_bin(sh1, sl1, y, rh, rl, inv, xp)
    return gi0, gi1


def bin_points(config: GroundGridConfig, center, x, y, z, rings, valid, origin,
               center_lo=None) -> Binning:
    """Assign points to cells, flag ignored points.

    Ignore rule (GroundSegmentation.cpp:237-240): ring > max_ring or squared
    xy distance to the sensor below 12 m^2; such points skip all statistics
    but are still classified at the end (re-added, :150).

    Binning is the f64-faithful ds form (:func:`faithful_cells`) -- the
    round-2 f32 reciprocal-multiply form mis-binned 4-8 near-edge points per
    ~100k-point scan vs the oracle, the dominant accuracy-divergence seed
    (ACCURACY.md). The sorted-scan host prep (pipeline.predict_cells) runs
    the identical op sequence, so host and device cell ids stay bitwise
    equal. The squared-distance products are barrier-pinned: the oracle sums
    two separately-rounded f32 squares, and an XLA FMA contraction here
    would flip the 12 m^2 near-field ignore test one ulp early.
    """
    n = config.cell_count
    gi0, gi1 = faithful_cells(config, center, center_lo, x, y)
    inmap = (gi0 >= 0) & (gi0 < n) & (gi1 >= 0) & (gi1 < n) & valid
    cell = jnp.where(inmap, gi0 * n + gi1, n * n).astype(jnp.int32)
    dx = x - origin[0]
    dy = y - origin[1]
    dx2, dy2 = exactf32.barrier((dx * dx, dy * dy))
    sqdist = dx2 + dy2
    ignored = inmap & (
        (rings > config.max_ring) | (sqdist < np.float32(config.min_dist_squared))
    )
    return Binning(gi0=gi0, gi1=gi1, cell=cell, inmap=inmap, ignored=ignored, sqdist=sqdist)


def _plane_shift_point(config: GroundGridConfig, center, t_base_map, origin,
                       gi0, gi1):
    """Per-point conditioning shift: ego base-plane pd at the point's CELL.

    The m2 accumulator is computed as a shifted sum of squares; any shift
    that is CONSTANT WITHIN A CELL leaves m2 exactly invariant in real
    arithmetic, and the f32 cancellation error scales with the shifted
    magnitude. A global (scalar) shift fails on grades: pd = z - origin.z
    varies by +-(slope * half_grid) ~ 5-20 m across the grid, and the
    resulting ~1e-3 variance noise straddles detect's varThreshold band
    (5e-4..5e-3), flipping patch decisions wholesale (found by the round-3
    accuracy benchmark on adversarial terrain, AUDIT.md addendum). The
    base-plane height at the cell CENTER -- the damage-fill linear form,
    GroundGrid.cpp:121-133 -- tracks terrain to ~cm locally, is computable
    from the integer cell index with no gathers, and is identical for every
    point of a cell by construction.
    """
    res = np.float32(config.resolution)
    half = np.float32(config.half_length)
    xc = (center[0] + half) - (gi0.astype(jnp.float32) + np.float32(0.5)) * res
    yc = (center[1] + half) - (gi1.astype(jnp.float32) + np.float32(0.5)) * res
    zb = t_base_map[2, 0] * xc + t_base_map[2, 1] * yc + t_base_map[2, 3]
    return (-zb) - origin[2]


def _plane_shift_map(config: GroundGridConfig, center, t_base_map, origin):
    """(N*N,) flat map of :func:`_plane_shift_point` over all cells."""
    n = config.cell_count
    gi0 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    gi1 = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return _plane_shift_point(config, center, t_base_map, origin, gi0, gi1).reshape(-1)


def rasterize(
    config: GroundGridConfig,
    binning: Binning,
    z,
    origin,
    accept,  # (P,) bool: in-map, not ignored, not outlier
    with_max: bool = True,
    psum_axis: str | None = None,
    center=None,
    t_base_map=None,
) -> RasterLayers:
    """Scatter-accumulate all per-cell statistics (1-D scatters).

    ``with_max=False`` skips the maxGroundHeight scatter: the layer is
    dead-but-published in the reference (SURVEY.md 2.3) and scatters are
    serial on this backend, so the hot path omits it unless aux layers are
    requested.

    ``psum_axis``: when the scan's points are split over a mesh axis
    (parallel/spatial.py), each shard scatters its slice and the per-cell
    accumulators recombine with ``psum``/``pmin``/``pmax`` -- the serial
    per-point scatter cost divides by the shard count.

    ``center``/``t_base_map``: enable the per-cell base-plane conditioning
    shift for the m2 sums (see :func:`_plane_shift_point`; strongly
    recommended -- the scalar fallback mis-conditions on sloped terrain).
    """
    n = config.cell_count
    n2 = n * n
    pd = z - origin[2]

    acc = accept.astype(jnp.float32)
    if center is not None and t_base_map is not None:
        s_pt = _plane_shift_point(
            config, center, t_base_map, origin, binning.gi0, binning.gi1
        )
        shift = _plane_shift_map(config, center, t_base_map, origin)
        pdc = jnp.where(accept, pd - s_pt, 0.0)
    else:
        total = jnp.sum(acc)
        sum_pd = jnp.sum(jnp.where(accept, pd, 0.0))
        if psum_axis is not None:
            total = jax.lax.psum(total, psum_axis)
            sum_pd = jax.lax.psum(sum_pd, psum_axis)
        total = jnp.maximum(total, 1.0)
        shift = sum_pd / total  # scalar conditioning shift
        pdc = jnp.where(accept, pd - shift, 0.0)

    cell = binning.cell
    # ONE multi-column scatter-add: device profiling shows the combined form
    # costs ~the same as a single-column scatter, i.e. 5x cheaper than five.
    vals = jnp.stack(
        [
            binning.inmap.astype(jnp.float32),
            acc,
            jnp.where(accept, z, 0.0),
            pdc,
            pdc * pdc,
        ],
        axis=-1,
    )
    sums = jnp.zeros((n2 + 1, 5), jnp.float32).at[cell].add(vals)

    minv = jnp.where(accept, z - np.float32(1e-4), FLT_MAX)  # epsilon (:308)
    min_gh = jnp.full((n2 + 1,), FLT_MAX, jnp.float32).at[cell].min(minv)
    # per-cell pd spread test (both extrema over ACCEPTED pd): feeds the
    # exact-zero m2 gate in _finish_layers (golden Welford parity)
    min_pd = jnp.full((n2 + 1,), FLT_MAX, jnp.float32).at[cell].min(
        jnp.where(accept, pd, FLT_MAX)
    )
    max_pd = jnp.full((n2 + 1,), -FLT_MAX, jnp.float32).at[cell].max(
        jnp.where(accept, pd, -FLT_MAX)
    )
    if with_max:
        maxv = jnp.where(accept, z, FLT_TINY)  # init FLT_MIN quirk (:73)
        max_gh = jnp.full((n2 + 1,), FLT_TINY, jnp.float32).at[cell].max(maxv)
    else:
        max_gh = jnp.full((n2 + 1,), FLT_TINY, jnp.float32)

    if psum_axis is not None:
        sums = jax.lax.psum(sums, psum_axis)
        min_gh = jax.lax.pmin(min_gh, psum_axis)
        min_pd = jax.lax.pmin(min_pd, psum_axis)
        max_pd = jax.lax.pmax(max_pd, psum_axis)
        if with_max:
            max_gh = jax.lax.pmax(max_gh, psum_axis)
    has_spread = min_pd[:n2] < max_pd[:n2]

    # one transpose instead of five strided column extractions
    sums_t = sums[:n2].T
    return _finish_layers(
        config,
        points_raw=sums_t[0],
        count=sums_t[1],
        sum_z=sums_t[2],
        sum_pdc=sums_t[3],
        sum_pdc2=sums_t[4],
        min_gh=min_gh[:n2],
        max_gh=max_gh[:n2],
        shift=shift,
        has_spread=has_spread,
    )


# Sentinel for "no accepted point" in the min column: an exact power of two
# (bf16-splits to a single part) far above any real height but far below
# FLT_MAX (whose bf16 rounding overflows to inf and would poison the split).
MIN_SENT = np.float32(2.0 ** 126)


def seg_end_reduce(cell, v, combine):
    """Run-reduction of ``v`` over equal-``cell`` runs, placed at run ends.

    ``cell`` must be nondecreasing; returns (P,) f32 that holds the combined
    value of each run at the run's LAST position and 0 elsewhere. A
    hand-rolled segmented Hillis-Steele scan: ``lax.associative_scan`` on
    this backend materializes per-level slices (~0.3 ms); this roll+mask
    form runs in ~14 us for 131k points.
    """
    p = v.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    same = jnp.concatenate([jnp.zeros((1,), bool), cell[1:] == cell[:-1]])
    ok = same  # ok[i] after level d: positions i-d+1..i share i's run
    d = 1
    while d < p:
        ok = ok & (idx >= d)  # mask the roll's wrap-around lanes
        v = jnp.where(ok, combine(v, jnp.roll(v, d)), v)
        ok = ok & jnp.roll(ok, d)
        d *= 2
    is_end = jnp.concatenate([cell[1:] != cell[:-1], jnp.ones((1,), bool)])
    return jnp.where(is_end, v, 0.0)


def seg_first_valid(cell, v, missing):
    """Per-position first non-``missing`` value of the run prefix.

    ``cell`` nondecreasing. Returns (P,) f32 where out[i] is the earliest
    v[j] != missing with j <= i in i's equal-cell run (or ``missing`` if
    none). Same Hillis-Steele roll+mask structure as :func:`seg_end_reduce`;
    the combine prefers the EARLIER window's value when it is valid --
    associative, so the doubling scan is exact.
    """
    p = v.shape[0]
    idx = jnp.arange(p, dtype=jnp.int32)
    same = jnp.concatenate([jnp.zeros((1,), bool), cell[1:] == cell[:-1]])
    ok = same
    d = 1
    while d < p:
        ok = ok & (idx >= d)
        earlier = jnp.roll(v, d)
        v = jnp.where(ok & (earlier != missing), earlier, v)
        ok = ok & jnp.roll(ok, d)
        d *= 2
    return v


def rasterize_sorted(
    config: GroundGridConfig,
    binning: Binning,
    z,
    origin,
    accept,
    with_max: bool = False,
    center=None,
    t_base_map=None,
) -> RasterLayers:
    """Scatter-free rasterization for **cell-sorted** scans (Pallas kernel).

    Numerically equivalent to :func:`rasterize` (summation tree order
    differs at the ~1 ulp level); the min/max layers are bitwise identical.
    Requires ``binning.cell`` to be nondecreasing -- the pipeline verifies
    this on device and falls back to :func:`rasterize` otherwise.

    The min (and, with ``with_max``, max) layer rides the sum kernel: on
    sorted input the per-cell min is a segmented cummin whose run-end value
    is the only nonzero entry of an extra B column, so the one-hot matmul
    extracts it EXACTLY (one product of an exact 0/1 bf16 mask with an
    exactly-split value; see ops/pallas_raster.build_parts).
    """
    from groundgrid_tpu.ops.pallas_raster import raster_sums

    n = config.cell_count
    n2 = n * n
    pd = z - origin[2]

    acc = accept.astype(jnp.float32)
    if center is not None and t_base_map is not None:
        # per-cell base-plane conditioning shift (see _plane_shift_point)
        s_pt = _plane_shift_point(
            config, center, t_base_map, origin, binning.gi0, binning.gi1
        )
        shift = _plane_shift_map(config, center, t_base_map, origin)
        pdc = jnp.where(accept, pd - s_pt, 0.0)
    else:
        total = jnp.maximum(jnp.sum(acc), 1.0)
        shift = jnp.sum(jnp.where(accept, pd, 0.0)) / total
        pdc = jnp.where(accept, pd - shift, 0.0)

    cell = binning.cell
    minv = jnp.where(accept, z - np.float32(1e-4), MIN_SENT)
    min_col = seg_end_reduce(cell, minv, jnp.minimum)
    # pd-spread flag for the exact-zero m2 gate (_finish_layers): neq marks
    # accepted points whose pd differs from the cell's FIRST accepted pd,
    # so the cell's neq sum is > 0 iff any two accepted pds differ. 0/1 --
    # bf16-exact, ONE extra part (15 of the padded 16): free in the kernel.
    first_pd = seg_first_valid(
        cell, jnp.where(accept, pd, np.float32(np.inf)), np.float32(np.inf)
    )
    neq = (accept & (pd != first_pd)).astype(jnp.float32)
    # the 0/1 indicator columns are bf16-exact and ship as single split
    # parts -- this is what keeps the standard call inside one MXU N-tile
    # (see ops/pallas_raster.build_parts)
    cols = [
        binning.inmap.astype(jnp.float32),
        acc,
        jnp.where(accept, z, 0.0),
        pdc,
        pdc * pdc,
        min_col,
        neq,
    ]
    exact = [True, True, False, False, False, False, True]
    if with_max:
        maxv = jnp.where(accept, z, FLT_TINY)  # init FLT_MIN quirk (:73)
        cols.append(seg_end_reduce(cell, maxv, jnp.maximum))
        exact.append(False)

    out = raster_sums(cell, cols, exact, n2)
    raw = out[0]
    # cells with no points extract 0; all-ignored cells extract the sentinel
    mins = jnp.where((raw > 0) & (out[5] < np.float32(1e30)), out[5], FLT_MAX)
    has_spread = out[6] > 0
    if with_max:
        # the reset value FLT_TINY participates in every cell's max (the
        # reference's +FLT_MIN init quirk beats all-negative-z cells)
        maxs = jnp.maximum(jnp.where(raw > 0, out[7], FLT_TINY), FLT_TINY)
    else:
        maxs = jnp.full((n2,), FLT_TINY, jnp.float32)

    return _finish_layers(
        config,
        points_raw=raw,
        count=out[1],
        sum_z=out[2],
        sum_pdc=out[3],
        sum_pdc2=out[4],
        min_gh=mins,
        max_gh=maxs,
        shift=shift,
        has_spread=has_spread,
    )


def _finish_layers(
    config, points_raw, count, sum_z, sum_pdc, sum_pdc2, min_gh, max_gh, shift,
    has_spread=None,
) -> RasterLayers:
    """Shared moment -> layer math on flat (N*N,) accumulator columns."""
    n = config.cell_count

    def grid(a):
        return a.reshape(n, n)

    points_raw = grid(points_raw)
    count = grid(count)
    sum_z = grid(sum_z)
    sum_pdc = grid(sum_pdc)
    sum_pdc2 = grid(sum_pdc2)

    safe = jnp.maximum(count, 1.0)
    mean_pdc = sum_pdc / safe
    ground_candidates = sum_z / safe  # == running mean (:296), 0 for empty cells
    # shift is a scalar (legacy global) or an (N*N,) per-cell map
    shift_g = grid(jnp.broadcast_to(jnp.asarray(shift), (n * n,)))
    mean_pd = jnp.where(count > 0, mean_pdc + shift_g, 0.0)
    # count <= 1 => m2 is EXACTLY zero (one sample has no spread). The
    # subtraction below is FMA-contracted by XLA: sum_pdc2 is the ROUNDED
    # pdc^2 while the fused product is exact, leaving a phantom residue
    # ~ulp(pdc^2) > 0 for single-point cells. detect then sees maxVar > 0
    # (GroundSegmentation.cpp:382) and takes the main update on cells the
    # reference skips -- hundreds of sparse far cells per scan (AUDIT.md #4
    # forensic; this one comparison was the bulk of the round-3 residual
    # pipeline-vs-golden divergence).
    #
    # ``has_spread`` (any two ACCEPTED pd values in the cell differ) extends
    # the exact-zero gate to multi-point cells: sequential Welford (the
    # oracle, GroundSegmentation.cpp:298-305) yields m2 == 0.0 EXACTLY for
    # all-identical pd, while the shifted-sum form leaves the same ~1e-9
    # residue -- and symmetrically its max(.., 0) clamp can zero a cell
    # whose true spread is 1-2 ulps where Welford keeps a ~1e-13 residue.
    # Both directions flip detect's maxVar > 0 gate (measured: 10 of the 10
    # surviving >0.1 m scan-0 detect flips after the ds-binning fix). The
    # gate makes the pipeline's m2 ZERONESS exact: 0 iff no spread, else at
    # least M2_FLOOR (the magnitude is irrelevant to every consumer --
    # maxVar^2 < var_thr_sq passes for any tiny positive, and the classify
    # tolerance clamps 1/variance at h_thr -- but it must survive the
    # variance division: FLT_TINY / count is subnormal and FLUSHED TO ZERO
    # on this backend, silently re-zeroing the variance; 2^-80 / 2^17 stays
    # normal).
    residue = sum_pdc2 - sum_pdc * mean_pdc
    if has_spread is not None:
        spread = grid(has_spread.reshape(-1))
        m2 = jnp.where(
            (count > 1.0) & spread,
            jnp.maximum(residue, np.float32(2.0 ** -80)), 0.0,
        )
    else:
        m2 = jnp.where(count > 1.0, jnp.maximum(residue, 0.0), 0.0)
    variance = m2 / (count + FLT_TINY)

    return RasterLayers(
        points=count,
        points_raw=points_raw,
        ground_candidates=ground_candidates,
        plane_dist=mean_pd,
        mean_variance=mean_pd,
        m2=m2,
        min_ground_height=grid(min_gh),
        max_ground_height=grid(max_gh),
        variance=variance,
    )
