"""Point-cloud rasterization: scatter points into per-cell accumulators.

TPU-native replacement for ``GroundSegmentation::insert_cloud``
(``GroundSegmentation.cpp:200-311``). The reference mutates shared per-cell
running accumulators from 8 racing threads (count, running mean z, Welford
mean/M2 of z - origin.z, min z with a -1e-4 epsilon, max z, raw count); here
the same statistics are produced by *deterministic* fused scatter reductions:

  * one scatter-add producing [rawCount, count, sum z, sum pd', sum pd'^2]
  * one scatter-min (min z - 1e-4) and one scatter-max (max z)

where pd = z - origin.z and pd' = pd - s with a per-scan scalar shift s (the
global mean of pd) so the Welford-equivalent ``m2 = sum pd'^2 - (sum pd')^2/n``
stays well-conditioned in float32. In exact arithmetic every layer equals the
reference's sequential formulas; determinism is a behavioral improvement over
the reference's tolerated data races (SURVEY.md section 2.2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import grid as gridlib

FLT_MAX = jnp.float32(jnp.finfo(jnp.float32).max)
FLT_TINY = jnp.float32(jnp.finfo(jnp.float32).tiny)  # C++ FLT_MIN


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
    """Per-point cell assignment shared by all stages."""

    gi: jax.Array  # (P, 2) int32 cell index
    cell: jax.Array  # (P,) int32 flat cell id; == n*n for out-of-map/padding
    inmap: jax.Array  # (P,) bool valid & inside grid
    ignored: jax.Array  # (P,) bool in-map but ring/near-field ignored
    sqdist: jax.Array  # (P,) f32 squared xy distance to sensor origin


def bin_points(config: GroundGridConfig, center, points, rings, valid, origin) -> Binning:
    """Assign points to cells, flag ignored points.

    Ignore rule (GroundSegmentation.cpp:237-240): ring > max_ring or squared
    xy distance to the sensor below 12 m^2; such points skip all statistics
    but are still classified at the end (re-added, :150).
    """
    n = config.cell_count
    gi = gridlib.position_to_index(config, center, points[:, :2])
    inmap = gridlib.index_valid(config, gi) & valid
    cell = jnp.where(inmap, gi[:, 0] * n + gi[:, 1], n * n).astype(jnp.int32)
    dx = points[:, 0] - origin[0]
    dy = points[:, 1] - origin[1]
    sqdist = dx * dx + dy * dy
    ignored = inmap & (
        (rings > config.max_ring) | (sqdist < jnp.float32(config.min_dist_squared))
    )
    return Binning(gi=gi, cell=cell, inmap=inmap, ignored=ignored, sqdist=sqdist)


def rasterize(
    config: GroundGridConfig,
    binning: Binning,
    points,
    origin,
    accept,  # (P,) bool: in-map, not ignored, not outlier
) -> RasterLayers:
    """Scatter-accumulate all per-cell statistics in three fused scatters."""
    n = config.cell_count
    n2 = n * n
    z = points[:, 2]
    pd = z - origin[2]

    acc = accept.astype(jnp.float32)
    total = jnp.maximum(jnp.sum(acc), 1.0)
    shift = jnp.sum(jnp.where(accept, pd, 0.0)) / total  # conditioning shift s
    pdc = jnp.where(accept, pd - shift, 0.0)

    vals = jnp.stack(
        [
            binning.inmap.astype(jnp.float32),  # pointsRaw counts every in-map pt
            acc,
            jnp.where(accept, z, 0.0),
            pdc,
            pdc * pdc,
        ],
        axis=-1,
    )
    sums = jnp.zeros((n2 + 1, 5), jnp.float32).at[binning.cell].add(vals)
    sums = sums[:n2].reshape(n, n, 5)

    points_raw = sums[..., 0]
    count = sums[..., 1]
    sum_z = sums[..., 2]
    sum_pdc = sums[..., 3]
    sum_pdc2 = sums[..., 4]

    safe = jnp.maximum(count, 1.0)
    mean_pdc = sum_pdc / safe
    ground_candidates = sum_z / safe  # == running mean (:296), 0 for empty cells
    mean_pd = jnp.where(count > 0, mean_pdc + shift, 0.0)
    m2 = jnp.maximum(sum_pdc2 - sum_pdc * mean_pdc, 0.0)

    minv = jnp.where(accept, z - jnp.float32(1e-4), FLT_MAX)  # epsilon (:308)
    maxv = jnp.where(accept, z, FLT_TINY)  # init FLT_MIN quirk (:73)
    min_gh = jnp.full((n2 + 1,), FLT_MAX, jnp.float32).at[binning.cell].min(minv)
    max_gh = jnp.full((n2 + 1,), FLT_TINY, jnp.float32).at[binning.cell].max(maxv)

    variance = m2 / (count + FLT_TINY)

    return RasterLayers(
        points=count,
        points_raw=points_raw,
        ground_candidates=ground_candidates,
        plane_dist=mean_pd,
        mean_variance=mean_pd,
        m2=m2,
        min_ground_height=min_gh[:n2].reshape(n, n),
        max_ground_height=max_gh[:n2].reshape(n, n),
        variance=variance,
    )
