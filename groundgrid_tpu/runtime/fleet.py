"""Fleet driver: B ego vehicles stepped in lock-step, sharded over the mesh.

BASELINE.json config 5 ("batched streaming: 64 scans/step across a
multi-sequence batch dim") as a runtime API: each vehicle owns its own grid
state; one dispatch advances every vehicle one scan. States and scans are
sharded over the ``fleet`` mesh axis (parallel/sharding.py) so collectives
ride ICI; per-tick fleet statistics arrive via an on-device ``psum``.

On a tunneled/remote TPU this also amortizes the per-dispatch host round trip
over B scans -- one device-to-host fetch per tick instead of per scan.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.data.semantickitti import ScanRecord
from groundgrid_tpu.parallel.sharding import (
    make_fleet_step,
    make_mesh,
    shard_fleet_pytree,
)
from groundgrid_tpu.pipeline import CenterTracker, Scan, init_state, prepare_scan


@dataclasses.dataclass
class FleetTickResult:
    """One lock-step tick: per-vehicle labels + psum'd fleet stats."""

    indices: List[int]
    labels: np.ndarray  # (B, P) int32
    outlier: np.ndarray  # (B, P) int32
    n_points: List[int]
    ground_points: int
    nonground_points: int
    outliers: int


class FleetDriver:
    """Drives B vehicles in lock-step; one jitted dispatch per tick."""

    def __init__(
        self,
        config: GroundGridConfig,
        batch: int,
        mesh=None,
        axis: str = "fleet",
    ):
        from groundgrid_tpu.utils.compilation_cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh(axis=axis)
        n_dev = self.mesh.devices.size
        if batch % n_dev:
            raise ValueError(f"batch {batch} not divisible by {n_dev} devices")
        self.batch = batch
        self.axis = axis
        self.step = make_fleet_step(config, self.mesh, axis)
        self.states = None  # batched GridState, fleet-sharded
        # per-vehicle f64 host center trackers (all modes; tie-exact snap
        # authority) + the last applied per-vehicle sort permutations
        # (sorted-scan mode; see pipeline.prepare_scan)
        self._trackers: List[CenterTracker] | None = None
        self._orders: np.ndarray | None = None

    def _batch_scans(self, records: Sequence[ScanRecord]) -> Scan:
        cfg = self.config
        cap = cfg.max_points
        b = self.batch
        # per-vehicle center trackers run in f64 in BOTH modes: grid_map
        # resolves half-cell snap ties in double precision, and an f32-cast
        # position can land on the other side of the tie (same fix as
        # StreamingDriver.make_scan, found by the r4 half-cell campaign)
        if self._trackers is None:
            self._trackers = [
                CenterTracker(cfg, r.t_map_velo[:2, 3].astype(np.float64))
                for r in records
            ]
        if cfg.sorted_scans:
            scans, orders = [], []
            for k, rec in enumerate(records):
                center = self._trackers[k].update(
                    rec.t_map_velo[:2, 3].astype(np.float64)
                )
                scan, order = prepare_scan(
                    cfg, rec.points[:, :3], rec.labels, rec.t_map_velo, center
                )
                scans.append(jax.tree.map(np.asarray, scan))
                orders.append(order)
            self._orders = np.stack(orders)
            batched = jax.tree.map(lambda *xs: np.stack(xs), *scans)
            return shard_fleet_pytree(batched, self.mesh, self.axis)
        px = np.zeros((b, cap), np.float32)
        py = np.zeros((b, cap), np.float32)
        pz = np.zeros((b, cap), np.float32)
        rng = np.zeros((b, cap), np.int32)
        msk = np.zeros((b, cap), np.int32)
        mv = np.zeros((b, 4, 4), np.float32)
        mb = np.zeros((b, 4, 4), np.float32)
        bm = np.zeros((b, 4, 4), np.float32)
        chi = np.zeros((b, 2), np.float32)
        clo = np.zeros((b, 2), np.float32)
        for k, rec in enumerate(records):
            t_mv, t_mb, t_bm = tf.scan_poses(rec.t_map_velo)
            self._trackers[k].update(rec.t_map_velo[:2, 3].astype(np.float64))
            chi[k], clo[k] = self._trackers[k].center_ds()
            count = min(rec.points.shape[0], cap)
            px[k, :count] = rec.points[:count, 0]
            py[k, :count] = rec.points[:count, 1]
            pz[k, :count] = rec.points[:count, 2]
            rng[k, :count] = rec.labels[:count]
            msk[k, :count] = 1
            mv[k], mb[k], bm[k] = t_mv, t_mb, t_bm
        scan = Scan(px=px, py=py, pz=pz, rings=rng, valid=msk,
                    t_map_velo=mv, t_map_base=mb, t_base_map=bm,
                    center=chi, center_lo=clo)
        return shard_fleet_pytree(scan, self.mesh, self.axis)

    def process(self, records: Sequence[ScanRecord]) -> FleetTickResult:
        """Advance every vehicle by one scan (len(records) == batch)."""
        if len(records) != self.batch:
            raise ValueError(f"expected {self.batch} records, got {len(records)}")
        if self.states is None:
            # Host loop, not vmap: init_state seeds the ds grid center from
            # the f64 odometry on the host (grid_map stores doubles), which
            # cannot run under a tracer. One-time cost at fleet creation.
            per_vehicle = [init_state(self.config, r.t_map_velo) for r in records]
            states = jax.tree.map(lambda *xs: jnp.stack(xs), *per_vehicle)
            self.states = shard_fleet_pytree(states, self.mesh, self.axis)
        scans = self._batch_scans(records)
        self.states, outs, summary = self.step(self.states, scans)
        labels = np.asarray(jax.device_get(outs.labels))
        outlier = np.asarray(jax.device_get(outs.outlier))
        if self.config.sorted_scans and self._orders is not None:
            restored_l = np.empty_like(labels)
            restored_o = np.empty_like(outlier)
            rows = np.arange(labels.shape[0])[:, None]
            restored_l[rows, self._orders] = labels
            restored_o[rows, self._orders] = outlier
            labels, outlier = restored_l, restored_o
        return FleetTickResult(
            indices=[r.index for r in records],
            labels=labels,
            outlier=outlier,
            n_points=[min(r.points.shape[0], self.config.max_points) for r in records],
            ground_points=int(summary.ground_points),
            nonground_points=int(summary.nonground_points),
            outliers=int(summary.outliers),
        )

    def run(
        self, sources: Sequence[Iterable[ScanRecord]]
    ) -> Iterator[FleetTickResult]:
        """Lock-step over B record streams until the shortest is exhausted."""
        if len(sources) != self.batch:
            raise ValueError(f"expected {self.batch} sources, got {len(sources)}")
        iterators = [iter(s) for s in sources]
        while True:
            records = []
            for it in iterators:
                rec = next(it, None)
                if rec is None:
                    return
                records.append(rec)
            yield self.process(records)
