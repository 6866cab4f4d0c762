"""Occlusion-based outlier rejection (vectorized ray-march).

TPU-native replacement for the per-point while-loop inside
``GroundSegmentation::insert_cloud`` (``GroundSegmentation.cpp:242-275``):
points that fall >= 0.2 m below the current terrain estimate are traced from
the sensor origin in whole-metre steps along the (unit) ray; if the line of
sight crosses a cell whose 3x3 ground-confidence block sum exceeds
``min_outlier_detection_ground_confidence`` (plus the cell-level confidence
and height tests), the point is an occluded-return outlier and is force
labeled ground.

Design notes:
  * The test reads the **previous scan's** ``ground``/``groundpatch`` --
    identical to the reference, where those layers are only written by later
    stages (detection/interpolation), so insert-threads always saw the prior
    scan's terrain.
  * Candidates (z < ground - 0.2) are rare (<~1% of a scan), so they are
    compacted into a fixed ``max_outlier_candidates`` buffer with ``top_k``
    and only those rays are marched: ~8k x ray_steps gathers instead of
    130k x ray_steps. Overflow candidates degrade gracefully to "not outlier".
  * The loop bound ``step^2 < len^2`` with a unit direction means step < len;
    rays are capped by the grid half-diagonal, so ``config.ray_steps`` is a
    static bound and steps are masked, not data-dependent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.rasterize import Binning


def detect_outliers(
    config: GroundGridConfig,
    center,
    ground,
    groundpatch,
    binning: Binning,
    points,
    origin,
) -> jax.Array:
    """Returns (P,) bool: True for occluded-return outliers.

    ``ground``/``groundpatch`` must be the pre-update (previous scan) layers.
    """
    n = config.cell_count
    res = jnp.float32(config.resolution)
    half = jnp.float32(config.half_length)
    k_max = config.max_outlier_candidates

    g0 = jnp.clip(binning.gi[:, 0], 0, n - 1)
    g1 = jnp.clip(binning.gi[:, 1], 0, n - 1)
    old_h = ground[g0, g1]
    cand = (
        binning.inmap
        & ~binning.ignored
        & (points[:, 2] < old_h - jnp.float32(0.2))
    )

    # 3x3 confidence block sums with the reference's low-side index clamp:
    # block<3,3>(max(i-1,2), max(j-1,2)) == centered sum at (max(i,3), max(j,3))
    # (GroundSegmentation.cpp:268).
    box = lax.reduce_window(
        groundpatch, 0.0, lax.add, (3, 3), (1, 1), "SAME"
    )

    # Compact candidate points into a fixed-size buffer.
    scores = cand.astype(jnp.int32)
    vals, pidx = lax.top_k(scores, k_max)
    active = vals > 0  # (K,)
    p = points[pidx]  # (K, 3)

    vec = p - origin
    length = jnp.sqrt(jnp.sum(vec * vec, axis=-1))
    vec = vec / jnp.maximum(length, 1e-12)[:, None]
    marching = active & (vec[:, 2] < jnp.float32(-0.01))  # loop-invariant test

    steps = jnp.arange(3, config.ray_steps, dtype=jnp.float32)  # (S,)
    within = marching[:, None] & (steps[None, :] < length[:, None])  # (K, S)

    # Ray sample positions and their cell indices, all steps at once.
    sx = origin[0] + steps[None, :] * vec[:, 0:1]
    sy = origin[1] + steps[None, :] * vec[:, 1:2]
    i0 = jnp.floor(((center[0] + half) - sx) / res).astype(jnp.int32)
    i1 = jnp.floor(((center[1] + half) - sy) / res).astype(jnp.int32)
    inside = (i0 > 0) & (i1 > 0) & (i0 < n - 1) & (i1 < n - 1)

    c0 = jnp.clip(i0, 0, n - 1)
    c1 = jnp.clip(i1, 0, n - 1)
    flat = c0 * n + c1
    gp = groundpatch.reshape(-1)[flat]
    gl = ground.reshape(-1)[flat]
    bs = box.reshape(-1)[jnp.clip(i0, 3, n - 1) * n + jnp.clip(i1, 3, n - 1)]

    ray_z = steps[None, :] * vec[:, 2:3] + origin[2]
    hit = (
        within
        & inside
        & (bs > jnp.float32(config.min_outlier_detection_ground_confidence))
        & (gp > jnp.float32(0.01))
        & (gl >= ray_z + jnp.float32(config.outlier_tolerance))
    )
    outlier_k = jnp.any(hit, axis=1) & active  # (K,)

    out = jnp.zeros(points.shape[0], dtype=bool)
    return out.at[pidx].set(outlier_k)
