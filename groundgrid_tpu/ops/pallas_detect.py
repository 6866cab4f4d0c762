"""Pallas TPU kernel: fused ground-patch detection stencil.

Optional replacement (``config.fused_detect``) for the XLA path in
``core/detect.py`` (``GroundSegmentation.cpp:314-395``: per-cell 3x3/5x5
Eigen block reductions + the branch ladder). The XLA path spends the stage
in eight ``lax.reduce_window`` calls (box sums of points, points*variance,
points*min_ground_height at both window sizes, plus two min-pools), each a
separate fusion root that round-trips the full grid through HBM, measured
at ~35% of HBM peak at 1200^2 (PERFORMANCE.md stage table). This kernel
computes all eight windowed quantities AND the branch ladder in one VMEM
pass: ~11 grid-sized HBM reads + 2 writes total instead of ~25.

Layout: grid over row blocks of ``ROWS`` rows x the full grid width. The
+/-2-row halo comes from passing each windowed input three times with
prev/self/next block index maps (clamped at the edges); the +/-2-column
halo is free because a 5-wide window at any *interior* column (the only
cells the reference updates, cpp:343) never crosses the array edge, so
in-block ``jnp.roll`` column shifts wrap only into rows/columns whose
outputs the interior mask discards anyway. Clamp-duplicated halo blocks at
the top/bottom edges feed garbage exclusively into the first/last two
rows' windows -- non-interior, discarded by the same mask.

Numerics: box sums accumulate rows-then-columns, left to right
(``(x[r-2]+x[r-1]+x[r]+x[r+1]+x[r+2])`` then the same over columns), which
differs from both ``lax.reduce_window``'s implementation-defined tree and
the golden oracle's flat row-major order by <= a few ulps of the window
sum. Min-pools are order-free (exact). The threshold tables
(``var_thr_sq``, ``skip_thr``, ``min_expected_s``, ``use3``) ship from the
same f64 host precompute as the XLA path (core/detect.py:make_tables), so
every comparison uses bit-identical thresholds; only the summands can
differ, i.e. divergence vs the XLA path is confined to the same
near-threshold-tie class the accuracy campaigns already bound. The flag is
opt-in and carries its own fuzz campaign (scripts/config_fuzz.py --fused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 32  # rows per grid block: 15 double-buffered (ROWS, N) VMEM operands
# + the concat slabs + ~8 live elementwise temps stay well under the 16 MB
# VMEM budget even at N=1200 (~8 MB); larger blocks (64/128) were measured
# no faster at 364^2/1200^2 -- the kernel is HBM-read-bound, not
# per-step-overhead-bound.


def _rows_for(n: int) -> int:
    if n >= ROWS:
        return ROWS
    return ((n + 7) // 8) * 8  # tiny test grids: one sublane-aligned block


def _col3(t):
    # column box sum over c-1..c+1; roll(+1)[c] = t[c-1]
    return jnp.roll(t, 1, axis=1) + t + jnp.roll(t, -1, axis=1)


def _col5(t):
    return (
        jnp.roll(t, 2, axis=1) + jnp.roll(t, 1, axis=1) + t
        + jnp.roll(t, -1, axis=1) + jnp.roll(t, -2, axis=1)
    )


def _colmin3(t):
    return jnp.minimum(jnp.minimum(jnp.roll(t, 1, axis=1), t), jnp.roll(t, -1, axis=1))


def _colmin5(t):
    m = _colmin3(t)
    return jnp.minimum(jnp.minimum(jnp.roll(t, 2, axis=1), m), jnp.roll(t, -2, axis=1))


def _detect_kernel(
    n, r, pccvt, out_tol, ocpcf,
    pP, pS, pN, vP, vS, vN, mP, mS, mN,
    g, cf, vt, sk, me, u3, og, oc,
):
    i = pl.program_id(0)

    def slab(prev, self_, nxt):
        return jnp.concatenate([prev[r - 2:, :], self_[:, :], nxt[:2, :]], axis=0)

    sp = slab(pP, pS, pN)  # (r+4, n) points
    sv = slab(vP, vS, vN)
    sm = slab(mP, mS, mN)
    spv = sp * sv
    spm = sp * sm  # empty cells: 0 * FLT_MAX == 0 (matches core/detect.py)

    def row3(x):
        return x[1 : r + 1] + x[2 : r + 2] + x[3 : r + 3]

    def row5(x):
        return x[0:r] + x[1 : r + 1] + x[2 : r + 2] + x[3 : r + 3] + x[4 : r + 4]

    def rmin3(x):
        return jnp.minimum(jnp.minimum(x[1 : r + 1], x[2 : r + 2]), x[3 : r + 3])

    def rmin5(x):
        return jnp.minimum(
            jnp.minimum(jnp.minimum(jnp.minimum(x[0:r], x[1 : r + 1]), x[2 : r + 2]),
                        x[3 : r + 3]),
            x[4 : r + 4],
        )

    use3 = u3[:, :] > 0.5
    psum = jnp.where(use3, _col3(row3(sp)), _col5(row5(sp)))
    pvsum = jnp.where(use3, _col3(row3(spv)), _col5(row5(spv)))
    pmsum = jnp.where(use3, _col3(row3(spm)), _col5(row5(spm)))
    localmin = jnp.where(use3, _colmin3(rmin3(sm)), _colmin5(rmin5(sm)))

    # interior mask [2, n-2)^2 recomputed from the (exact-integer) cell
    # coordinates; rows beyond n in a partial last block fall outside it.
    gr = i * r + lax.broadcasted_iota(jnp.int32, (r, n), 0)
    gc = lax.broadcasted_iota(jnp.int32, (r, n), 1)
    interior = (gr >= 2) & (gr < n - 2) & (gc >= 2) & (gc < n - 2)

    ground = g[:, :]
    conf = cf[:, :]
    points_c = pS[:, :]  # center-cell point count (slab rows 2..r+1 == pS)
    var_c = vS[:, :]

    process = interior & (psum >= sk[:, :])
    safe = jnp.maximum(psum, 1.0)
    max_var = jnp.where(points_c >= pccvt, var_c, pvsum / safe)
    groundlevel = pmsum / safe

    ground_diff = jnp.maximum((groundlevel - ground) * (2.0 * conf), 1.0)
    guard = (conf > 0.5) & (groundlevel >= ground + out_tol)

    branch1 = (
        (vt[:, :] > max_var * max_var)
        & (max_var > 0)
        & (psum > ground_diff * me[:, :])
    )
    new_c = jnp.minimum(psum / ocpcf, 1.0)
    h1 = (groundlevel * new_c + conf * ground * 2.0) / (new_c + conf * 2.0)
    c1 = jnp.minimum((psum / (ocpcf * 2.0) + conf) / 2.0, 1.0)

    branch2 = localmin < ground
    take1 = process & ~guard & branch1
    take2 = process & ~guard & ~branch1 & branch2

    og[:, :] = jnp.where(take1, h1, jnp.where(take2, localmin, ground))
    oc[:, :] = jnp.where(
        take1, c1, jnp.where(take2, jnp.minimum(conf + 0.1, 0.5), conf)
    )


def detect_ground_patches_fused(
    config, tables, points, variance, min_ground_height, ground, groundpatch,
    interpret: bool = False,
):
    """Drop-in replacement for core.detect.detect_ground_patches."""
    n = config.cell_count
    r = _rows_for(n)
    nb = pl.cdiv(n, r)

    self_spec = pl.BlockSpec((r, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    prev_spec = pl.BlockSpec(
        (r, n), lambda i: (jnp.maximum(i - 1, 0), 0), memory_space=pltpu.VMEM
    )
    next_spec = pl.BlockSpec(
        (r, n), lambda i: (jnp.minimum(i + 1, nb - 1), 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _detect_kernel, n, r,
        np.float32(config.point_count_cell_variance_threshold),
        np.float32(config.outlier_tolerance),
        np.float32(config.occupied_cells_point_count_factor),
    )
    out = jax.ShapeDtypeStruct((n, n), jnp.float32)
    # NOTE: tables stay host-side numpy (core/detect.py make_tables) so they
    # trace as HLO literals; as pallas operands they stream like any input.
    u3 = np.asarray(tables.use3, np.float32)
    new_ground, new_conf = pl.pallas_call(
        kernel,
        grid=(nb,),
        out_shape=(out, out),
        in_specs=(
            [prev_spec, self_spec, next_spec] * 3  # points, variance, min_gh
            + [self_spec] * 6  # ground, conf, var_thr_sq, skip, mes, use3
        ),
        out_specs=(self_spec, self_spec),
        interpret=interpret,
    )(
        points, points, points,
        variance, variance, variance,
        min_ground_height, min_ground_height, min_ground_height,
        ground, groundpatch,
        tables.var_thr_sq, tables.skip_thr, tables.min_expected_s, u3,
    )
    return new_ground, new_conf
