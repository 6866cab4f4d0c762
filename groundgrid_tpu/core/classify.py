"""Per-point ground/non-ground classification against the terrain estimate.

TPU-native replacement for the final loop of
``GroundSegmentation::filter_cloud`` (``GroundSegmentation.cpp:146-189``):
a distance/variance-adaptive height tolerance per point, flat 1-D gathers +
compares instead of a 130k-iteration host loop.

Label convention (reference overwrites the PCL ``intensity`` channel,
``GroundSegmentation.cpp:175,180``): 99 = non-ground, 49 = ground, and 0 for
points the reference silently drops from its output cloud (out-of-map points
and the within-3-cells-of-max-border quirk, :167-168, :230-231).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.rasterize import Binning

LABEL_GROUND = 49
LABEL_NONGROUND = 99
LABEL_DROPPED = 0


class ClassifyResult(NamedTuple):
    labels: jax.Array  # (P,) int32: 49 / 99 / 0
    nonground_count: jax.Array  # (N, N) f32, reference's reused "points" layer


def classify(
    config: GroundGridConfig,
    binning: Binning,
    z,
    ground,
    variance,
    outlier,
    with_counts: bool = True,
    gh_var=None,
) -> ClassifyResult:
    """Classify every surviving point.

    tolerance = max(min((5*min_dist_factor*dist)/var * h_thr, h_thr), h_obs)
    and non-ground iff ground + tolerance < z (GroundSegmentation.cpp:170-173).
    var == 0 yields tolerance h_thr (inf-clamp) and 0/0 NaN propagates to a
    "ground" verdict -- both matching C++ float semantics.

    Outliers are force-labeled ground and bypass the border drop, exactly as
    the re-add loop at :184-189 does.

    ``gh_var``: optional precomputed per-point ``(ground[cell], var[cell])``
    pair -- the sorted-scan pipeline supplies it from the Pallas lookup
    kernel (ops/pallas_lookup.py), which replaces the serial XLA row gather
    below. Values at non-inmap points may differ (they are masked out of
    every consumer).
    """
    n = config.cell_count

    considered = binning.inmap & ~outlier
    if config.border_drop:
        considered &= (binning.gi0 + 3 < n) & (binning.gi1 + 3 < n)

    if gh_var is not None:
        gh, var = gh_var
    else:
        flat = jnp.clip(binning.gi0, 0, n - 1) * n + jnp.clip(binning.gi1, 0, n - 1)
        # one 2-wide row gather instead of two 1-wide gathers (3x cheaper on
        # this backend: per-index overhead dominates serial gathers)
        table = jnp.stack([ground.reshape(-1), variance.reshape(-1)], axis=-1)
        pair = table[flat]
        gh = pair[:, 0]
        var = pair[:, 1]
    dist = jnp.sqrt(binning.sqdist)

    min_dist_fac = np.float32(config.minimum_distance_factor * 5)
    h_thr = np.float32(config.miminum_point_height_threshold)
    h_obs = np.float32(config.minimum_point_height_obstacle_threshold)

    tol = jnp.maximum(jnp.minimum((min_dist_fac * dist) / var * h_thr, h_thr), h_obs)
    nonground = tol + gh < z

    labels = jnp.where(
        considered,
        jnp.where(nonground, LABEL_NONGROUND, LABEL_GROUND),
        LABEL_DROPPED,
    )
    labels = jnp.where(outlier, LABEL_GROUND, labels).astype(jnp.int32)

    # non-ground per-cell count (reference reuses the zeroed "points" layer,
    # GroundSegmentation.cpp:147,176; published in grid images only, so it is
    # skipped on the hot path unless aux layers were requested).
    if with_counts:
        nonground_count = nonground_counts(config, binning, labels)
    else:
        nonground_count = jnp.zeros((n, n), jnp.float32)
    return ClassifyResult(labels=labels, nonground_count=nonground_count)


def nonground_counts(config: GroundGridConfig, binning: Binning, labels) -> jax.Array:
    """(N, N) per-cell count of non-ground-labeled points (scatter form).

    ``labels == 99`` is exactly the reference's increment condition
    (considered & above-tolerance, GroundSegmentation.cpp:176). The sorted
    pipeline replaces this serial scatter with the one-hot-matmul kernel
    (see pipeline.make_step_fn).
    """
    n = config.cell_count
    ng = labels == LABEL_NONGROUND
    inc = ng.astype(jnp.float32)
    cell = jnp.where(ng, binning.cell, n * n)
    return (
        jnp.zeros((n * n + 1,), jnp.float32).at[cell].add(inc)[: n * n].reshape(n, n)
    )
