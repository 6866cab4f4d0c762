"""Ground-patch detection: whole-grid stencil update.

TPU-native replacement for ``GroundSegmentation::detect_ground_patches`` /
``detect_ground_patch<3|5>`` (``GroundSegmentation.cpp:314-395``). The
reference walks every interior cell with Eigen 3x3/5x5 block reductions split
over four quadrant threads; since each cell writes only itself and reads
neighbor blocks of layers that this stage never writes, the loop is
embarrassingly parallel and maps exactly onto windowed reductions
(``lax.reduce_window``) + ``jnp.where`` selects -- no approximation.

All distance-derived quantities (expected point density, patch size select,
variance threshold, interior mask, early-skip threshold) depend only on the
cell coordinates and the config, so they are precomputed once as host-side
tables (see :func:`make_tables`) and closed over by the jitted pipeline,
mirroring the reference's one-time ``expectedPoints`` precompute
(``GroundSegmentation.cpp:37-48``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.golden import expected_points_table

FLT_TINY = np.float32(np.finfo(np.float32).tiny)


class DetectTables(NamedTuple):
    """Static per-cell tables (host precomputed, device constants)."""

    expected: jax.Array  # expected points per laser per cell
    use3: jax.Array  # bool: 3x3 patch (inside patch_size_change_distance)
    var_thr_sq: jax.Array  # clamped squared variance threshold
    skip_thr: jax.Array  # early-skip point count threshold
    interior: jax.Array  # bool: cells the reference iterates ([2, N-2)^2)
    min_expected_s: jax.Array  # expected * S * threshold (branch-1 gate factor)


def make_tables(config: GroundGridConfig) -> DetectTables:
    n = config.cell_count
    res = config.resolution
    ii, jj = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij")
    sqdist = ((ii - n / 2.0) ** 2 + (jj - n / 2.0) ** 2) * res * res

    use3 = sqdist <= config.patch_size_change_distance**2
    s = np.where(use3, 3.0, 5.0)
    expected = expected_points_table(config).astype(np.float64)
    thr = config.ground_patch_detection_minimum_point_count_threshold

    # early skip (GroundSegmentation.cpp:364): psum < max(floor(thr*S*exp), 3)
    skip_thr = np.maximum(np.floor(thr * s * expected), 3.0)

    # variance threshold (GroundSegmentation.cpp:369)
    var_thr_sq = np.minimum(
        np.maximum(sqdist * config.distance_factor**2, config.minimum_distance_factor**2),
        (config.minimum_distance_factor * 10) ** 2,
    )

    interior = np.zeros((n, n), dtype=bool)
    interior[2 : n - 2, 2 : n - 2] = True

    min_expected_s = expected * s * thr  # branch gate (cpp:382), sans groundDiff

    # NOTE: tables stay host-side numpy so jit tracing embeds them as HLO
    # literal constants. Pre-committed jnp device arrays captured by a jitted
    # function become runtime buffer parameters, which (on the axon TPU
    # backend) force scalar-serial codegen for every fusion touching them --
    # a ~1000x slowdown observed on the outlier march.
    return DetectTables(
        expected=expected.astype(np.float32),
        use3=use3,
        var_thr_sq=var_thr_sq.astype(np.float32),
        skip_thr=skip_thr.astype(np.float32),
        interior=interior,
        min_expected_s=min_expected_s.astype(np.float32),
    )


def _box(x, size):
    return lax.reduce_window(x, 0.0, lax.add, (size, size), (1, 1), "SAME")


def _minpool(x, size):
    return lax.reduce_window(x, jnp.inf, lax.min, (size, size), (1, 1), "SAME")


def detect_ground_patches(
    config: GroundGridConfig,
    tables: DetectTables,
    points,
    variance,
    min_ground_height,
    ground,
    groundpatch,
):
    """One detection sweep; returns updated (ground, groundpatch).

    Exact formulas from GroundSegmentation.cpp:343-395; the 3x3/5x5 window
    selection per cell follows the patch_size_change_distance rule (:330-338).
    """
    cfg = config

    pv = points * variance
    pm = points * min_ground_height  # empty cells: 0 * FLT_MAX == 0

    def windows(size):
        return (
            _box(points, size),
            _box(pv, size),
            _box(pm, size),
            _minpool(min_ground_height, size),
        )

    p3, pv3, pm3, mn3 = windows(3)
    p5, pv5, pm5, mn5 = windows(5)

    use3 = tables.use3
    psum = jnp.where(use3, p3, p5)
    pvsum = jnp.where(use3, pv3, pv5)
    pmsum = jnp.where(use3, pm3, pm5)
    localmin = jnp.where(use3, mn3, mn5)

    process = tables.interior & (psum >= tables.skip_thr)

    safe = jnp.maximum(psum, 1.0)
    center_var = variance
    max_var = jnp.where(
        points >= np.float32(cfg.point_count_cell_variance_threshold),
        center_var,
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
