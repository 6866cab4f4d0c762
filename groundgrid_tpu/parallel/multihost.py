"""Multi-host (DCN) fleet scaling: the cross-host half of BASELINE config 5.

Single-host fleet parallelism (``parallel/sharding.py``) shards the vehicle
batch over one process's chips via ICI. This module extends the same fleet
step across *processes* (TPU pods / multi-host slices, coordinated over DCN):

  * :func:`init_multihost` wraps ``jax.distributed.initialize`` (idempotent,
    env-driven) so ``jax.devices()`` becomes the global device list;
  * :class:`MultiHostFleet` builds the global mesh, compiles the SAME
    ``make_fleet_step`` program over it (XLA routes the fleet ``psum``
    across ICI within a host and DCN between hosts -- no NCCL/MPI analog
    needed, SURVEY.md section 2.2), and assembles global arrays from
    process-local shards with ``jax.make_array_from_process_local_data``;
  * :func:`all_hosts_agree` / :func:`aggregate_host_counts` cover the
    eval-side reductions (confusion-count merge across hosts).

Each process feeds only its own vehicles (B_local = B_global / n_processes):
the host-side loaders (``data/native_loader.py``) stay per-process, exactly
like the reference's one-publisher-per-robot layout scaled out.

There is no multi-host hardware in CI; the data-path (local-shard assembly,
global mesh construction, step parity vs the single-host fleet) is covered
single-process on the virtual CPU mesh in ``tests/test_multihost.py``, which
is exactly what ``jax.make_array_from_process_local_data`` degenerates to at
``process_count() == 1``.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.parallel.sharding import make_fleet_step


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Returns True when running multi-process afterwards. With no arguments it
    defers to the environment (``JAX_COORDINATOR_ADDRESS`` etc. or the cloud
    TPU metadata service); a bare single-process run stays uninitialized and
    this is a no-op returning False, so all call sites can run unmodified on
    one host.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if explicit is None:
        return False
    jax.distributed.initialize(
        coordinator_address=explicit,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


class FleetShardInfo(NamedTuple):
    """Static shape bookkeeping for one process's slice of the fleet."""

    global_batch: int
    local_batch: int
    process_index: int
    process_count: int


class MultiHostFleet:
    """Global-mesh fleet stepper fed from process-local shards.

    Usage (identical on 1 or N hosts)::

        fleet = MultiHostFleet(config, vehicles_per_device=2)
        states = fleet.from_local(local_states)   # leading dim = local_batch
        scans = fleet.from_local(local_scans)
        states, outs, summary = fleet.step(states, scans)
        my_outs = fleet.to_local(outs)            # this host's vehicles only
    """

    def __init__(
        self,
        config: GroundGridConfig,
        vehicles_per_device: int = 1,
        axis: str = "fleet",
        devices=None,
    ):
        devs = list(devices) if devices is not None else jax.devices()
        self.mesh = Mesh(np.array(devs), (axis,))
        self.axis = axis
        self.sharding = NamedSharding(self.mesh, P(axis))
        n_proc = max(jax.process_count(), 1)
        n_dev = len(devs)
        if n_dev % n_proc:
            raise ValueError(f"{n_dev} devices not divisible by {n_proc} processes")
        self.info = FleetShardInfo(
            global_batch=n_dev * vehicles_per_device,
            local_batch=(n_dev // n_proc) * vehicles_per_device,
            process_index=jax.process_index(),
            process_count=n_proc,
        )
        self.step = make_fleet_step(config, self.mesh, axis)

    def from_local(self, tree):
        """Assemble global fleet arrays from this process's local shard.

        Every leaf must have leading dim ``info.local_batch``; the result is
        a global array of leading dim ``info.global_batch`` sharded over the
        fleet axis, with this process's vehicles at block
        ``process_index * local_batch``.
        """
        lb = self.info.local_batch

        def leaf(x):
            x = np.asarray(x)
            if x.shape[0] != lb:
                raise ValueError(f"leading dim {x.shape[0]} != local_batch {lb}")
            return jax.make_array_from_process_local_data(self.sharding, x)

        return jax.tree.map(leaf, tree)

    def to_local(self, tree):
        """Extract this process's vehicles from a global fleet pytree.

        Uses only addressable shards -- no cross-host transfer.
        """
        lb = self.info.local_batch
        start = self.info.process_index * lb

        def leaf(x):
            if not hasattr(x, "addressable_shards"):
                return np.asarray(x)
            shards = sorted(
                x.addressable_shards, key=lambda s: s.index[0].start or 0
            )
            return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

        del start  # addressable shards ARE this process's block
        return jax.tree.map(leaf, tree)


def aggregate_host_counts(counts: np.ndarray) -> np.ndarray:
    """Sum per-host evaluator count arrays across processes.

    The eval module's confusion counters (``eval/metrics.py``) are plain
    integer arrays per host; multi-host lock-step evaluation merges them with
    one ``process_allgather`` + sum. Single-process: identity.
    """
    if jax.process_count() <= 1:
        return np.asarray(counts)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(counts))
    return np.asarray(gathered).sum(axis=0)


def all_hosts_agree(value: int) -> bool:
    """True iff every process supplies the same scalar (sync sanity check)."""
    if jax.process_count() <= 1:
        return True
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(value))
    return bool((np.asarray(gathered) == np.asarray(gathered)[0]).all())
