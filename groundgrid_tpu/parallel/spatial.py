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
