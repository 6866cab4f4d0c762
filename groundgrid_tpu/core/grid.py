"""Ego-centric moving grid state.

TPU-native replacement for the reference's ``grid_map::GridMap`` circular
buffer (``src/GroundGrid.cpp:50-147``). Instead of a circular start index +
``convertToDefaultStartIndex`` normalization, the grid lives as dense arrays
and relocation is a ``jnp.roll`` plus a freshly-exposed-region masked fill --
static shapes, jit-friendly, no host logic.

Persistent state is deliberately minimal: the reference's ``move()`` NaNs all
layers in the exposed ("damage") region and only ``ground``/``groundpatch``
are re-initialized (``GroundGrid.cpp:121-133``); every other layer is reset at
the top of each scan (``GroundSegmentation.cpp:61-75``), so the only state
that survives across scans is ``ground``, ``groundpatch`` and the grid center.

Index convention matches grid_map: index 0 is the **max**-position corner on
both axes, ``idx = floor((center + half - pos) / res)``, so driving forward
(+x) exposes new terrain at low row indices.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import exactf32


class GridState(NamedTuple):
    """Recurrent scene state (a pytree; trivially checkpointable).

    Attributes:
      ground:      (N, N) f32 terrain height estimate [m, map frame].
      groundpatch: (N, N) f32 ground confidence in [0, 1].
      center:      (2,) f32 grid center position [m, map frame]; moves on a
                   cell-aligned lattice after creation (grid_map semantics).
      center_lo:   (2,) f32 double-single tail of the f64 grid center
                   (``center + center_lo`` tracks grid_map's double-precision
                   center to ~2^-48 relative). Consumed only by the
                   discontinuous decisions -- cell binning and the ray-march
                   lattice (core/exactf32.ds_bin); all smooth math reads the
                   f32 ``center``. ``None`` degrades to a zero tail (legacy
                   f32-center construction).
    """

    ground: jax.Array
    groundpatch: jax.Array
    center: jax.Array
    center_lo: jax.Array | None = None


def create(config: GroundGridConfig, center_xy, center_z) -> GridState:
    """Initial grid, equivalent to ``GroundGrid::initGroundGrid``.

    ground := odom z everywhere, groundpatch := 1e-7
    (GroundGrid.cpp:71-75). ``points``/min/max layers of the reference are
    per-scan scratch here and have no persistent equivalent.

    ``center_xy``: pass the float64 odometry position (as the reference's
    grid_map does, GroundGrid.cpp:58) to seed the ds center exactly; an f32
    input seeds a zero tail.
    """
    n = config.cell_count
    lo = np.zeros((2,), np.float32)
    if isinstance(center_xy, np.ndarray) and center_xy.dtype == np.float64:
        hi, lo = exactf32.f64_to_ds(center_xy)
        center_xy = hi
    center_xy = jnp.asarray(center_xy, dtype=jnp.float32)
    ground = jnp.full((n, n), jnp.asarray(center_z, jnp.float32))
    groundpatch = jnp.full((n, n), 1e-7, dtype=jnp.float32)
    return GridState(
        ground=ground, groundpatch=groundpatch, center=center_xy,
        center_lo=jnp.asarray(lo, jnp.float32),
    )


def _snap_cells(x, xp=jnp):
    """Round positions-in-cells to whole cells, half away from zero.

    grid_map's ``getIndexShiftFromPositionShift`` computes
    ``static_cast<int>(x + 0.5*sign(x))`` -- half-AWAY-from-zero, not the
    round-half-to-even of ``jnp.round`` (audit finding AUDIT.md #1; an
    exactly-half-cell odometry delta snaps differently under the two rules).

    ``xp``: array module -- ``jnp`` on device, ``np`` for the host-side
    ``pipeline.CenterTracker`` replica (one rule, one implementation; only
    the golden oracle keeps its own deliberately independent copy).
    """
    return xp.sign(x) * xp.floor(xp.abs(x) + 0.5)


def index_shift(config: GroundGridConfig, center, new_position):
    """Cell-aligned shift from the current center towards ``new_position``.

    grid_map rounds the position delta to whole cells
    (``getIndexShiftFromPositionShift``); the center therefore trails odometry
    by at most half a cell. Returns (shift_ij (2,) i32, new_center (2,) f32).
    Note the sign: position *increase* shifts content toward *higher* indices
    (index 0 is the max-position corner).
    """
    res = np.float32(config.resolution)
    delta = jnp.asarray(new_position, jnp.float32) - center
    k = _snap_cells(delta / res).astype(jnp.int32)
    new_center = center + k.astype(jnp.float32) * res
    return k, new_center


def index_shift_ds(config: GroundGridConfig, center, center_lo, new_position):
    """:func:`index_shift` with the ds center recurrence.

    Mirrors grid_map's double-precision ``center += k * resolution``
    (GroundGrid.cpp:97 via getPosition math) to ~2^-47: k times the ds image
    of the f64 resolution, accumulated into the (hi, lo) center pair.

    CAVEAT (device fallback only): the shift ``k`` snaps from the f32
    position delta, so an odometry step of exactly half a cell -- a tie
    grid_map resolves in f64 -- can misround once |position| is large enough
    that f32 loses the tie (the r4 half-cell campaign measured a one-cell
    transient misalignment). Production paths avoid this: the drivers track
    the center in f64 on the host (pipeline.CenterTracker) and ship it via
    ``Scan.center``, which ``move`` prefers over this recurrence.
    Returns (k (2,) i32, new_center (2,) f32, new_center_lo (2,) f32).
    """
    res = np.float32(config.resolution)
    delta = jnp.asarray(new_position, jnp.float32) - center
    k = _snap_cells(delta / res).astype(jnp.int32)
    kf = k.astype(jnp.float32)
    rh, rl, _ = exactf32.res_ds(config.resolution)
    rhh, rhl = exactf32.split(rh, xp=np)
    rlh, rll = exactf32.split(rl, xp=np)
    if center_lo is None:
        center_lo = jnp.zeros_like(center)
    p1h, p1l = exactf32.two_prod_int_const(kf, rh, rhh, rhl)
    p2h, p2l = exactf32.two_prod_int_const(kf, rl, rlh, rll)
    nh, nl = exactf32.ds_add(center, center_lo, p1h, p1l)
    nh, nl = exactf32.ds_add(nh, nl, p2h, p2l)
    return k, nh, nl


def move(config: GroundGridConfig, state: GridState, new_position, t_base_map,
         new_center=None, new_center_lo=None) -> GridState:
    """Relocate the grid to track the ego vehicle (``GroundGrid::update``).

    * content shifts by whole cells via ``jnp.roll`` (replaces grid_map's
      circular-buffer move + convertToDefaultStartIndex, GroundGrid.cpp:97,143)
    * freshly exposed cells are re-initialized to the base_link plane height:
      ``ground := -z_base(cell)``, ``groundpatch := 0``
      (GroundGrid.cpp:121-133). For a cell at map position (x, y, 0) the base
      frame z is the linear form R[2,0]x + R[2,1]y + t[2] of ``t_base_map``.

    The no-movement case degenerates to shift 0 with an empty exposed mask --
    the same early-return semantics as GroundGrid.cpp:136-137, without host
    control flow.

    ``new_center`` / ``new_center_lo`` (optional, (2,) f32 each): the
    host-authoritative ds center for this step. In sorted-scan mode the host
    pre-sorts points by their cell id, so the device must bin against the
    *exact same* ds center pair the host used -- fp-identical recomputation
    on device cannot be guaranteed (XLA may form FMAs under
    --xla_allow_excess_precision). The shift is derived from the hi-center
    delta instead (robust: centers differ by exact cell multiples).
    """
    n = config.cell_count
    if new_center is None:
        k, new_center, new_center_lo = index_shift_ds(
            config, state.center, state.center_lo, new_position
        )
    else:
        new_center = jnp.asarray(new_center, jnp.float32)
        if new_center_lo is None:
            new_center_lo = jnp.zeros((2,), jnp.float32)
        else:
            new_center_lo = jnp.asarray(new_center_lo, jnp.float32)
        res = np.float32(config.resolution)
        k = _snap_cells((new_center - state.center) / res).astype(jnp.int32)

    ground = jnp.roll(state.ground, shift=(k[0], k[1]), axis=(0, 1))
    groundpatch = jnp.roll(state.groundpatch, shift=(k[0], k[1]), axis=(0, 1))

    exposed = exposed_mask(n, k)

    # Base-plane height at each cell center.
    px, py = cell_positions(config, new_center)
    t_base_map = jnp.asarray(t_base_map, jnp.float32)
    z_base = t_base_map[2, 0] * px + t_base_map[2, 1] * py + t_base_map[2, 3]

    ground = jnp.where(exposed, -z_base, ground)
    groundpatch = jnp.where(exposed, 0.0, groundpatch)
    return GridState(
        ground=ground, groundpatch=groundpatch, center=new_center,
        center_lo=new_center_lo,
    )


def exposed_mask(n: int, k):
    """(N, N) bool mask of cells newly exposed by a roll of (k0, k1).

    A shift of +k exposes indices [0, k); a shift of -k exposes [N-k, N).
    The union over both axes mirrors grid_map's damage regions.
    """
    idx = jnp.arange(n)

    def axis_mask(kk):
        return jnp.where(kk >= 0, idx < kk, idx >= n + kk)

    # |k| >= n wipes the whole grid (teleport); mirror that.
    m0 = axis_mask(k[0]) | (jnp.abs(k[0]) >= n)
    m1 = axis_mask(k[1]) | (jnp.abs(k[1]) >= n)
    return m0[:, None] | m1[None, :]


def cell_positions(config: GroundGridConfig, center):
    """Map-frame (x, y) coordinates of every cell center.

    grid_map convention: pos = center + half - (idx + 0.5) * res
    (axis 0 <-> x, axis 1 <-> y, both reversed). Returns two (N, N) arrays.
    """
    n = config.cell_count
    res = np.float32(config.resolution)
    half = np.float32(config.half_length)
    coord = half - (jnp.arange(n, dtype=jnp.float32) + 0.5) * res
    px = jnp.broadcast_to(center[0] + coord[:, None], (n, n))
    py = jnp.broadcast_to(center[1] + coord[None, :], (n, n))
    return px, py


def position_to_index(config: GroundGridConfig, center, xy):
    """World position -> (i, j) cell index, grid_map convention.

    ``idx = floor((center + half - pos) / res)``; callers mask validity with
    :func:`index_valid`. ``xy`` is (..., 2).
    """
    res = np.float32(config.resolution)
    half = np.float32(config.half_length)
    rel = (center + half) - jnp.asarray(xy)
    return jnp.floor(rel / res).astype(jnp.int32)


def index_valid(config: GroundGridConfig, idx):
    """Bool mask for indices inside the grid (reference: map.isInside)."""
    n = config.cell_count
    return jnp.all((idx >= 0) & (idx < n), axis=-1)
