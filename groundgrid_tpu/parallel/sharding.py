"""Multi-chip scaling: fleet (batch) data parallelism over a device mesh.

The reference is a single-process robotics node; its only parallelism is
point-chunk threading and grid-quadrant threading (SURVEY.md section 2.2),
both of which vanish into vectorized ops here. The TPU-native scaling axis is
the *fleet* dimension from BASELINE.json config 5: B independent ego vehicles
(sequences) stepped in lock-step, one grid state each, sharded across chips
with ``shard_map`` so each chip owns B/n_devices vehicles and all collectives
ride ICI.

The per-scan pipeline itself stays single-chip (a 364x364 grid is ~1 MB --
far below the point where spatial sharding pays); cross-chip communication is
limited to an optional ``psum`` fleet summary, which also serves as the
collective the multi-chip dry-run exercises.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.grid import GridState
from groundgrid_tpu.pipeline import Scan, make_step_fn


class FleetSummary(NamedTuple):
    """Globally psum-reduced per-step fleet statistics."""

    ground_points: jax.Array  # scalar f32
    nonground_points: jax.Array
    outliers: jax.Array


def make_mesh(n_devices: int | None = None, axis: str = "fleet") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_fleet_step(config: GroundGridConfig, mesh: Mesh, axis: str = "fleet"):
    """Build a sharded, batched step: (B, ...) states x scans -> states, outs.

    B must be divisible by the mesh axis size. Each chip runs B/n local
    pipelines (vmap) and the fleet summary is an ICI ``psum``.
    """
    # The raw (unjitted) single-step implementation, batched per chip.
    # Sorted-scan pipelines batch with lax.map (a compiled loop over the
    # chip's vehicles): their Pallas kernels cannot be vmap-lifted, the
    # sortedness-fallback cond would run both branches under vmap, and the
    # serialized indexed ops mean vmap buys no cross-vehicle vectorization
    # anyway (measured: batch=8 vmap is slower than 8 sequential steps).
    inner = make_step_fn(config)
    batcher = (
        (lambda f: lambda s, sc: jax.lax.map(lambda t: f(*t), (s, sc)))
        if config.sorted_scans
        else (lambda f: jax.vmap(f))
    )

    def local_step(states: GridState, scans: Scan):
        new_states, outs = batcher(inner)(states, scans)
        g = jnp.sum(outs.labels == 49)
        ng = jnp.sum(outs.labels == 99)
        ol = jnp.sum(outs.outlier)
        summary = FleetSummary(
            ground_points=jax.lax.psum(g, axis),
            nonground_points=jax.lax.psum(ng, axis),
            outliers=jax.lax.psum(ol, axis),
        )
        return new_states, outs, summary

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def fleet_sharding(mesh: Mesh, axis: str = "fleet") -> NamedSharding:
    """Sharding for batched fleet pytrees (leading batch dim split)."""
    return NamedSharding(mesh, P(axis))


def shard_fleet_pytree(tree, mesh: Mesh, axis: str = "fleet"):
    """Place a host-built batched pytree with the fleet dim sharded."""
    sh = fleet_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
