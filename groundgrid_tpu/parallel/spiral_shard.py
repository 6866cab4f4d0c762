"""Sharded spiral interpolation: exact annular-band relay over the mesh.

The spiral sweep (``GroundSegmentation.cpp:398-465``) is the one genuinely
sequential stage: ring i's blend reads ring i+1's *final* values, so the
inner->outer chain cannot be reordered. What CAN be distributed exactly is
the *work and memory*: partition the rings into S contiguous annular bands,
one per shard along the mesh axis; shard s runs its band only, receiving the
single boundary ring (finals of shard s-1's outermost ring) via
``lax.ppermute`` -- the distributed sequential ring walk of VERDICT r2
item 3.

Exactness: each band executes the identical ``core/interpolate`` ring scan
over the identical values the monolithic sweep would see (a ring reads only
ring i+1, pre-state, and its own band), so the relay is **bit-identical** to
the single-chip XLA sweep -- not merely within f32 rounding. Verified at the
high-res 1200^2 geometry in tests/test_spiral_shard.py on the 8-device CPU
mesh.

Latency analysis (honest): the relay is Amdahl-bound -- shard s cannot start
before shard s-1 finishes, so wall time equals the single-chip sweep plus
S-1 ppermute hops (~KB each). What sharding buys is 1/S of the *compute and
working set per chip* (the replicated spiral was the last stage forcing every
chip to hold and chew the full grid): at mega-grid configs the per-chip
spiral footprint now scales down with the mesh, and the redundant S-1 copies
of the sweep's FLOPs/energy are gone. For raw single-scan wall time on one
chip, the Pallas kernel (ops/pallas_spiral.py) remains the default; banded
mode is selected in ``make_spatial_step(spiral_mode="banded")``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.interpolate import _segment_update


def ring_bands(config: GroundGridConfig, n_shards: int) -> list[np.ndarray]:
    """Partition the walked rings (center-1 .. 1, inner->outer) into
    ``n_shards`` contiguous descending bands (some may be empty on tiny
    grids)."""
    c_idx = config.center_cell
    rings = np.arange(c_idx - 1, 0, -1, dtype=np.int32)
    return [np.asarray(b, np.int32) for b in np.array_split(rings, n_shards)]


def _band_scan(config: GroundGridConfig, ground, groundpatch, band: np.ndarray):
    """Run the exact ring walk over one static band of ring indices."""

    def ring(carry, i):
        h, c = carry
        outer = 2 * config.center_cell - i
        h, c = _segment_update(config, h, c, i, i, outer, False, False)
        h, c = _segment_update(config, h, c, i, i, outer, True, False)
        h, c = _segment_update(config, h, c, outer, i, outer + 1, False, True)
        h, c = _segment_update(config, h, c, outer, i, outer + 1, True, True)
        return (h, c), None

    (ground, groundpatch), _ = lax.scan(
        ring, (ground, groundpatch), jnp.asarray(band)
    )
    return ground, groundpatch


def _pack_ring(g, c, i: int, n2c: int):
    """(8, N) bundle of ring i's rows/cols from both layers (static i)."""
    j = n2c - i
    return jnp.stack([g[i], g[j], g[:, i], g[:, j], c[i], c[j], c[:, i], c[:, j]])


def _unpack_ring(g, c, pkg, i: int, n2c: int):
    j = n2c - i
    g = g.at[i].set(pkg[0]).at[j].set(pkg[1])
    g = g.at[:, i].set(pkg[2]).at[:, j].set(pkg[3])
    c = c.at[i].set(pkg[4]).at[j].set(pkg[5])
    c = c.at[:, i].set(pkg[6]).at[:, j].set(pkg[7])
    return g, c


def banded_spiral(config: GroundGridConfig, axis: str, n_shards: int):
    """Build the in-shard_map banded sweep.

    Returns ``f(ground, groundpatch, base_z) -> (ground', groundpatch')``
    to be called INSIDE an existing ``shard_map`` over ``axis`` with
    replicated (N, N) inputs; the outputs are again replicated (one masked
    ``psum`` recombines the disjoint annuli).
    """
    c_idx = config.center_cell
    n = config.cell_count
    n2c = 2 * c_idx
    bands = ring_bands(config, n_shards)
    # per-shard annulus bounds (inclusive ring-id range; empty -> lo > hi)
    los = np.array([b.min() if len(b) else 1 for b in bands], np.int32)
    his = np.array([b.max() if len(b) else 0 for b in bands], np.int32)

    def f(ground, groundpatch, base_z):
        idx = lax.axis_index(axis)
        ground = ground.at[c_idx, c_idx].set(jnp.asarray(base_z, jnp.float32))
        groundpatch = groundpatch.at[c_idx, c_idx].set(1.0)
        pre_g, pre_c = ground, groundpatch

        g, c = ground, groundpatch
        for s, band in enumerate(bands):
            if len(band):
                g, c = lax.cond(
                    idx == s,
                    lambda gc: _band_scan(config, gc[0], gc[1], band),
                    lambda gc: gc,
                    (g, c),
                )
            if s < n_shards - 1 and len(band):
                # hand the boundary ring (band's outermost = smallest i) on
                i_b = int(band[-1])
                pkg = _pack_ring(g, c, i_b, n2c)
                received = lax.ppermute(
                    pkg, axis, [(d, d + 1) for d in range(n_shards - 1)]
                )
                g, c = lax.cond(
                    idx == s + 1,
                    lambda gc: _unpack_ring(gc[0], gc[1], received, i_b, n2c),
                    lambda gc: gc,
                    (g, c),
                )

        # recombine the disjoint annuli: ring_id = min(x, y, 2c-x, 2c-y)
        ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        ring_id = jnp.minimum(
            jnp.minimum(ii, jj), jnp.minimum(n2c - ii, n2c - jj)
        )
        walked = (ring_id >= 1) & (ring_id <= c_idx - 1) & (
            (ii != c_idx) | (jj != c_idx)
        )
        lo = jnp.asarray(los)[idx]
        hi = jnp.asarray(his)[idx]
        mine = walked & (ring_id >= lo) & (ring_id <= hi)
        out_g = lax.psum(jnp.where(mine, g, 0.0), axis)
        out_c = lax.psum(jnp.where(mine, c, 0.0), axis)
        out_g = jnp.where(walked, out_g, pre_g)
        out_c = jnp.where(walked, out_c, pre_c)
        return out_g, out_c

    return f
