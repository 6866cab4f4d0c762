"""Spiral terrain interpolation: concentric-ring scan, center outward.

TPU-native replacement for ``GroundSegmentation::spiral_ground_interpolation``
/ ``interpolate_cell`` (``GroundSegmentation.cpp:398-465``). The reference
walks every cell of each concentric rectangle ring sequentially; outer rings
read already-updated inner rings, so the sweep is genuinely order-dependent --
the only sequential stage in the pipeline (SURVEY.md section 7).

The sweep is nevertheless *exactly* parallelizable:

  1. Rings are processed inner -> outer with ``lax.scan`` (180 steps for the
     default grid), and each ring's four side segments run sequentially in the
     reference's walk order: top row, left column, bottom row (descending),
     right column (descending) -- including the corner cells (i, i) and
     (2c-i, 2c-i) that the reference's loop bounds visit twice per ring.
  2. Within a segment, a cell's 3x3 stencil reads already-updated values only
     from its *predecessor along the walk*; every other neighbor holds a value
     known before the segment starts. The confidence layer evolves
     independently of heights (pure per-cell decay), so the predecessor's new
     confidence is also known upfront. The height chain therefore reduces to a
     first-order affine recurrence  h[y] = a[y] + b[y] * h[y-1]  with
     precomputable coefficients, solved in log-depth with
     ``lax.associative_scan``. No Jacobi relaxation, no approximation beyond
     float32 reassociation.

Each segment touches only a 3-wide band (fixed-shape ``dynamic_slice``), so a
ring step costs O(N), not O(N^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from groundgrid_tpu.config import GroundGridConfig

FLT_TINY = np.float32(np.finfo(np.float32).tiny)


def _affine_scan(a, b):
    """h[y] = a[y] + b[y] * h[y-1] with h[-1] := 0 (b[0] must be 0)."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 + b2 * a1, b2 * b1

    h, _ = lax.associative_scan(combine, (a, b))
    return h


def _segment_update(config: GroundGridConfig, h, c, fixed, lo, hi, transposed, descending):
    """Update one ring segment *exactly* as the sequential walk does.

    Row segment (``transposed=False``): row ``fixed``, cells [lo, hi).
    Column segment (``transposed=True``): column ``fixed``, cells [lo, hi).
    ``descending`` selects the walk direction along the segment
    (GroundSegmentation.cpp:421-439: top/left ascend, bottom/right descend).
    """
    n = config.cell_count
    c_idx = config.center_cell
    res2 = np.float32(config.resolution**2)
    dec = np.float32(config.occupied_cells_decrease_factor)

    h_view = h.T if transposed else h
    c_view = c.T if transposed else c

    bh = lax.dynamic_slice(h_view, (fixed - 1, 0), (3, n))
    bc = lax.dynamic_slice(c_view, (fixed - 1, 0), (3, n))

    ys = jnp.arange(n, dtype=jnp.int32)
    in_seg = (ys >= lo) & (ys < hi)

    # confidence decay (GroundSegmentation.cpp:462-464): per-cell, independent
    # of heights and of neighbors -> computable for the whole segment upfront.
    d2 = ((fixed - c_idx).astype(jnp.float32) ** 2 + (ys - c_idx).astype(jnp.float32) ** 2) * res2
    decay_applies = d2 > np.float32(config.min_dist_squared)
    occ = bc[1]
    c_dec = jnp.where(decay_applies, jnp.maximum(occ - occ / dec, np.float32(0.001)), occ)
    c_new_row = jnp.where(in_seg, c_dec, occ)

    if descending:
        flip = lambda x: x[..., ::-1]
        bh, bc = flip(bh), flip(bc)
        in_seg_f, c_new_f, occ_f = flip(in_seg), flip(c_new_row), flip(occ)
    else:
        in_seg_f, c_new_f, occ_f = in_seg, c_new_row, occ

    hh = bh[1]

    def left(x):  # value at walk-predecessor position
        return jnp.roll(x, 1, axis=-1)

    def right(x):  # walk-successor position
        return jnp.roll(x, -1, axis=-1)

    # Stencil contributions known before the cell is visited: the two
    # neighbor rows of the band (inner ring already final, outer ring still
    # old -- both are simply the current carry), the cell itself (confidence
    # pre-decay), and the walk-successor (visited after us -> carry value).
    w = bc * bh
    num_known = (
        left(w[0]) + w[0] + right(w[0])
        + left(w[2]) + w[2] + right(w[2])
        + w[1] + right(w[1])
    )
    den_known = (
        left(bc[0]) + bc[0] + right(bc[0])
        + left(bc[2]) + bc[2] + right(bc[2])
        + bc[1] + right(bc[1])
    )

    # Walk-predecessor: if it belongs to this segment it was just updated
    # (new confidence, recurrent height); otherwise it is a carry value.
    pred_in_seg = left(in_seg_f)
    c_pred = jnp.where(pred_in_seg, left(c_new_f), left(bc[1]))
    den = den_known + c_pred + FLT_TINY

    blend = jnp.where(in_seg_f, 1.0 - occ_f, 0.0)
    b_coef = jnp.where(pred_in_seg, blend * c_pred / den, 0.0)
    num_static = num_known + jnp.where(pred_in_seg, 0.0, c_pred * left(bh[1]))
    a_coef = jnp.where(in_seg_f, blend * num_static / den + occ_f * hh, hh)

    h_new = _affine_scan(a_coef, b_coef)

    if descending:
        h_new = h_new[::-1]

    h_view = lax.dynamic_update_slice(h_view, h_new[None, :], (fixed, 0))
    c_view = lax.dynamic_update_slice(c_view, c_new_row[None, :], (fixed, 0))
    if transposed:
        return h_view.T, c_view.T
    return h_view, c_view


def spiral_interpolation(config: GroundGridConfig, ground, groundpatch, base_z):
    """Full center-outward sweep; returns updated (ground, groundpatch).

    Seeds the center cell with the vehicle base height at confidence 1
    (GroundSegmentation.cpp:405-411), then scans rings i = center-1 .. 1.
    """
    c_idx = config.center_cell

    ground = ground.at[c_idx, c_idx].set(jnp.asarray(base_z, jnp.float32))
    groundpatch = groundpatch.at[c_idx, c_idx].set(1.0)

    def ring(carry, i):
        h, c = carry
        outer = 2 * c_idx - i  # == rectangle_pos + side_length
        # reference walk order (GroundSegmentation.cpp:421-439):
        h, c = _segment_update(config, h, c, i, i, outer, False, False)  # top row ->
        h, c = _segment_update(config, h, c, i, i, outer, True, False)  # left col v
        h, c = _segment_update(config, h, c, outer, i, outer + 1, False, True)  # bottom <-
        h, c = _segment_update(config, h, c, outer, i, outer + 1, True, True)  # right ^
        return (h, c), None

    rings = jnp.arange(c_idx - 1, 0, -1, dtype=jnp.int32)
    (ground, groundpatch), _ = lax.scan(ring, (ground, groundpatch), rings)
    return ground, groundpatch
