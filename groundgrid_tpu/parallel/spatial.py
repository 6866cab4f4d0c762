"""Spatial grid sharding: stencil stages with halo exchange over ICI.

The fleet axis (parallel/sharding.py) scales the number of vehicles; this
module scales the *grid itself* for configurations where one chip can't hold
or chew through it -- e.g. the 0.1 m / 120 m stress config (1200^2 cells,
BASELINE.json config 4) pushed to city-scale extents. The grid is sharded
row-block-wise over a ``space`` mesh axis; the ground-patch detection stencil
(the widest-window stage: 5x5 reductions, GroundSegmentation.cpp:343-395)
runs per-shard after exchanging 2-row halos with grid neighbors via
``jax.lax.ppermute`` -- the ring-style collective this workload maps onto
(SURVEY.md section 5.7).

Exactness: with halos exchanged, the sharded result matches the single-chip
stencil to float32 rounding (window reductions reassociate at shard
boundaries; verified in tests/test_spatial.py on the virtual CPU mesh). The
only communication is 2 rows x N cells per neighbor per step, which rides
ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import detect as detectlib

HALO = 2  # 5x5 window -> 2 rows each side


def _exchange_halo(block, axis: str):
    """Append 2 ghost rows from each grid-neighbor shard (edges zero-padded).

    block: (rows_per_shard, N). Returns (rows_per_shard + 4, N).
    """
    n_shards = lax.axis_size(axis)
    idx = lax.axis_index(axis)

    top = block[:HALO]  # my first rows -> needed by previous shard
    bottom = block[-HALO:]  # my last rows -> needed by next shard

    # send bottom to next (i -> i+1), receive previous shard's bottom
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    from_prev = lax.ppermute(bottom, axis, fwd)
    # send top to prev (i -> i-1), receive next shard's top
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_next = lax.ppermute(top, axis, bwd)

    zeros = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zeros, from_prev)  # no wraparound at edges
    from_next = jnp.where(idx == n_shards - 1, zeros, from_next)
    return jnp.concatenate([from_prev, block, from_next], axis=0)


def make_sharded_detect(config: GroundGridConfig, mesh: Mesh, axis: str = "space"):
    """Build a row-sharded drop-in for detect_ground_patches.

    Returns ``f(points, variance, min_gh, ground, groundpatch) -> (ground',
    groundpatch')`` operating on (N, N) arrays sharded P(axis, None); the
    result carries the same sharding. N must be divisible by the axis size.
    """
    n = config.cell_count
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"grid rows {n} not divisible by {n_shards} shards")
    rows = n // n_shards
    tables = detectlib.make_tables(config)

    # static tables, pre-split by shard row-block (indexed via axis_index);
    # kept as host numpy so they embed as literals (see detect.make_tables)
    tables_stacked = jax.tree.map(
        lambda t: np.stack([t[i * rows : (i + 1) * rows] for i in range(n_shards)]),
        tables,
    )

    def local(points, variance, min_gh, ground, groundpatch):
        i = lax.axis_index(axis)
        # jnp.asarray at trace time embeds the numpy stacks as literals;
        # dynamic row-select picks this shard's block
        local_tables = jax.tree.map(lambda t: jnp.asarray(t)[i], tables_stacked)

        # stencil inputs need halos; per-cell state layers don't
        pts_h = _exchange_halo(points, axis)
        var_h = _exchange_halo(variance, axis)
        min_h = _exchange_halo(min_gh, axis)

        new_g, new_c = _detect_block(
            config, local_tables, pts_h, var_h, min_h, ground, groundpatch
        )
        return new_g, new_c

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(f)


def _detect_block(config, tables, pts_h, var_h, min_h, ground, groundpatch):
    """detect_ground_patches on one row block whose stencil inputs carry
    HALO ghost rows top+bottom; state layers are halo-free."""
    cfg = config

    def windows(x, size):
        w = lax.reduce_window(x, 0.0, lax.add, (size, size), (1, 1), "SAME")
        return w[HALO:-HALO]

    def minpool(x, size):
        w = lax.reduce_window(x, jnp.inf, lax.min, (size, size), (1, 1), "SAME")
        return w[HALO:-HALO]

    pv_h = pts_h * var_h
    pm_h = pts_h * min_h

    use3 = tables.use3
    psum = jnp.where(use3, windows(pts_h, 3), windows(pts_h, 5))
    pvsum = jnp.where(use3, windows(pv_h, 3), windows(pv_h, 5))
    pmsum = jnp.where(use3, windows(pm_h, 3), windows(pm_h, 5))
    localmin = jnp.where(use3, minpool(min_h, 3), minpool(min_h, 5))

    points = pts_h[HALO:-HALO]
    variance = var_h[HALO:-HALO]

    process = tables.interior & (psum >= tables.skip_thr)
    safe = jnp.maximum(psum, 1.0)
    max_var = jnp.where(
        points >= np.float32(cfg.point_count_cell_variance_threshold),
        variance,
        pvsum / safe,
    )
    groundlevel = pmsum / safe
    ground_diff = jnp.maximum((groundlevel - ground) * (2.0 * groundpatch), 1.0)
    guard = (groundpatch > 0.5) & (
        groundlevel >= ground + np.float32(cfg.outlier_tolerance)
    )
    ocpcf = np.float32(cfg.occupied_cells_point_count_factor)
    branch1 = (
        (tables.var_thr_sq > max_var * max_var)
        & (max_var > 0)
        & (psum > ground_diff * tables.min_expected_s)
    )
    new_c = jnp.minimum(psum / ocpcf, 1.0)
    h1 = (groundlevel * new_c + groundpatch * ground * 2.0) / (new_c + groundpatch * 2.0)
    c1 = jnp.minimum((psum / (ocpcf * 2.0) + groundpatch) / 2.0, 1.0)
    branch2 = localmin < ground
    take1 = process & ~guard & branch1
    take2 = process & ~guard & ~branch1 & branch2

    new_ground = jnp.where(take1, h1, jnp.where(take2, localmin, ground))
    new_conf = jnp.where(
        take1, c1, jnp.where(take2, jnp.minimum(groundpatch + 0.1, 0.5), groundpatch)
    )
    return new_ground, new_conf


def spatial_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """Sharding for (N, N) grid layers split row-wise."""
    return NamedSharding(mesh, P(axis, None))


def make_spatial_step(config: GroundGridConfig, mesh: Mesh, axis: str = "space",
                      with_scan_center: bool = False,
                      spiral_mode: str = "replicated"):
    """Full per-scan step with the compute spatially sharded over ``axis``.

    The multi-chip strategy for ONE grid too heavy for one chip (SURVEY.md
    5.7, BASELINE config 4 pushed further):

      * points split P(axis): each shard transforms, ray-marches and
        classifies ``max_points / S`` points; the rasterize scatter -- the
        serial per-point cost on this backend -- divides by S and recombines
        with an ICI ``psum``/``pmin``;
      * the detect stencil runs row-sharded (existing ``_detect_block``; the
        halo comes for free from the psum-replicated raster layers);
      * grid relocation runs replicated (cheap / inherently global);
        per-shard state keeps only this shard's rows;
      * the sequential spiral runs replicated by default, or as the exact
        annular-band relay with ``spiral_mode="banded"`` (1/S of the sweep's
        compute per chip, one boundary-ring ppermute per shard handoff --
        parallel/spiral_shard.py; bit-identical to the single-chip XLA
        sweep, Amdahl-bound in wall time as documented there).

    Returns ``step(g_rows, c_rows, center, scan) -> (g_rows', c_rows',
    center', labels, outlier)`` jitted over the mesh: ``g_rows``/``c_rows``
    are the (N/S, N) row blocks sharded P(axis, None); ``scan`` is a
    pipeline Scan whose point arrays are sharded P(axis) and whose poses /
    center are replicated; ``labels``/``outlier`` come back P(axis)
    (concatenated point order == input order).
    """
    from groundgrid_tpu.core import classify as classifylib
    from groundgrid_tpu.core import grid as gridlib
    from groundgrid_tpu.core import interpolate as interplib
    from groundgrid_tpu.core import outliers as outlierlib
    from groundgrid_tpu.core import rasterize as rasterlib
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.core.grid import GridState
    from groundgrid_tpu.pipeline import Scan

    n = config.cell_count
    n_shards = mesh.shape[axis]
    if n % n_shards:
        raise ValueError(f"grid rows {n} not divisible by {n_shards} shards")
    if config.max_points % n_shards:
        raise ValueError(
            f"max_points {config.max_points} not divisible by {n_shards}")
    rows = n // n_shards
    tables = detectlib.make_tables(config)
    tables_stacked = jax.tree.map(
        lambda t: np.stack([t[i * rows : (i + 1) * rows] for i in range(n_shards)]),
        tables,
    )

    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if spiral_mode == "banded":
        from groundgrid_tpu.parallel.spiral_shard import banded_spiral

        banded_fn = banded_spiral(config, axis, n_shards)
        spiral_fn = lambda cfg, g, c, z: banded_fn(g, c, z)
    elif use_pallas:
        from groundgrid_tpu.ops.pallas_spiral import spiral_interpolation_pallas as spiral_fn
    else:
        spiral_fn = interplib.spiral_interpolation

    def local_step(g_rows, c_rows, center, scan: Scan):
        idx = lax.axis_index(axis)
        ground = lax.all_gather(g_rows, axis, tiled=True)  # (N, N) replicated
        conf = lax.all_gather(c_rows, axis, tiled=True)
        state = GridState(ground=ground, groundpatch=conf, center=center,
                          center_lo=scan.center_lo)

        if config.sorted_scans:
            x, y, z = scan.px, scan.py, scan.pz
        else:
            x, y, z = tf.transform_points_soa(scan.t_map_velo, scan.px, scan.py, scan.pz)
        origin = scan.t_map_velo[:3, 3]

        state = gridlib.move(
            config, state, origin[:2], scan.t_base_map, new_center=scan.center,
            new_center_lo=scan.center_lo)

        binning = rasterlib.bin_points(
            config, state.center, x, y, z, scan.rings, scan.valid > 0, origin,
            center_lo=state.center_lo)
        outlier = outlierlib.detect_outliers(
            config, state.center, state.ground, state.groundpatch,
            binning, x, y, z, origin, center_lo=state.center_lo)
        accept = binning.inmap & ~binning.ignored & ~outlier
        raster = rasterlib.rasterize(
            config, binning, z, origin, accept, with_max=False, psum_axis=axis,
            center=state.center, t_base_map=scan.t_base_map)

        # detect: raster layers are psum-replicated, so each shard slices its
        # own halo'd row block -- no further exchange needed
        def halo_slice(full):
            padded = jnp.pad(full, ((HALO, HALO), (0, 0)))
            return lax.dynamic_slice_in_dim(padded, idx * rows, rows + 2 * HALO, 0)

        def row_slice(full):
            return lax.dynamic_slice_in_dim(full, idx * rows, rows, 0)

        local_tables = jax.tree.map(lambda t: jnp.asarray(t)[idx], tables_stacked)
        g_det, c_det = _detect_block(
            config, local_tables,
            halo_slice(raster.points), halo_slice(raster.variance),
            halo_slice(raster.min_ground_height),
            row_slice(state.ground), row_slice(state.groundpatch),
        )

        # spiral: inherently global + sequential -> gather, run replicated
        g_full = lax.all_gather(g_det, axis, tiled=True)
        c_full = lax.all_gather(c_det, axis, tiled=True)
        g_full, c_full = spiral_fn(config, g_full, c_full, scan.t_map_base[2, 3])

        result = classifylib.classify(
            config, binning, z, g_full, raster.variance, outlier,
            with_counts=False)

        return (
            row_slice(g_full), row_slice(c_full), state.center,
            result.labels, outlier.astype(jnp.int32),
        )

    pt = P(axis)
    rep = P()
    scan_spec = Scan(
        px=pt, py=pt, pz=pt, rings=pt, valid=pt,
        t_map_velo=rep, t_map_base=rep, t_base_map=rep,
        center=rep if with_scan_center else None,
        center_lo=rep if with_scan_center else None,
    )
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), rep, scan_spec),
        out_specs=(P(axis, None), P(axis, None), rep, pt, pt),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))
