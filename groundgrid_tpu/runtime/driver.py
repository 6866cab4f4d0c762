"""Streaming driver: plays a LiDAR sequence through the jitted pipeline.

Replaces the reference's runtime plumbing -- nodelet callbacks, /clock-driven
player and the lock-step NextCloud service (``GroundGridNodelet.cpp:107-232``,
``kitti_data_publisher.py:80-115``, SURVEY.md section 3.4) -- with a pull
loop: each iteration pads the next scan, runs one jitted step and yields the
results, so scan delivery is deterministic by construction.

Degraded-mode semantics preserved as explicit states: a record with no pose
is dropped (reference drops clouds when transforms are missing,
GroundGridNodelet.cpp:124-136); the grid persists in the GridState pytree and
can be checkpointed/restored at any scan boundary (the reference keeps it
only in RAM, SURVEY.md section 5.4).

Observability: per-scan wall time with running averages (the reference's
chrono spans + avg scans/sec logs, GroundGridNodelet.cpp:186-209).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.core.grid import GridState
from groundgrid_tpu.data.semantickitti import ScanRecord
from groundgrid_tpu.pipeline import Scan, init_state, make_step


@dataclasses.dataclass
class ScanResult:
    index: int
    timestamp: float
    labels: np.ndarray  # (P,) 49/99 per original point; 0 = dropped
    outlier: np.ndarray  # (P,) bool
    n_points: int
    wall_ms: float
    aux: Optional[dict] = None  # grid layers when with_aux


@dataclasses.dataclass
class TimingStats:
    """Running averages like the reference's logs (GroundGridNodelet.cpp:205)."""

    scans: int = 0
    total_ms: float = 0.0
    avg_ms: float = 0.0

    def update(self, ms: float) -> None:
        self.avg_ms = (ms + self.scans * self.avg_ms) / (self.scans + 1)
        self.scans += 1
        self.total_ms += ms

    @property
    def scans_per_sec(self) -> float:
        return 1000.0 / self.avg_ms if self.avg_ms > 0 else 0.0


class StreamingDriver:
    """One ego vehicle / one sequence; owns the grid state."""

    def __init__(self, config: GroundGridConfig, with_aux: bool = False):
        self.config = config
        self.with_aux = with_aux
        self.step = make_step(config, with_aux=with_aux)
        self.state: GridState | None = None
        self.stats = TimingStats()

    def reset(self) -> None:
        self.state = None
        self.stats = TimingStats()

    def _make_scan(self, rec: ScanRecord) -> Scan:
        import jax.numpy as jnp

        mv, mb, bm = tf.scan_poses(rec.t_map_velo)
        cfg = self.config
        cap = cfg.max_points
        pts = np.zeros((3, cap), np.float32)  # SoA (see pipeline.Scan)
        rng = np.zeros((cap,), np.int32)
        msk = np.zeros((cap,), bool)
        count = min(rec.points.shape[0], cap)
        pts[:, :count] = rec.points[:count, :3].T
        rng[:count] = rec.labels[:count]
        msk[:count] = True
        return Scan(
            points=jnp.asarray(pts), rings=jnp.asarray(rng), valid=jnp.asarray(msk),
            t_map_velo=jnp.asarray(mv), t_map_base=jnp.asarray(mb), t_base_map=jnp.asarray(bm),
        )

    def process(self, rec: ScanRecord) -> ScanResult:
        """Run one scan (odometry update + segmentation), blocking."""
        t0 = time.perf_counter()
        if self.state is None:
            self.state = init_state(self.config, rec.t_map_velo.astype(np.float32))
        scan = self._make_scan(rec)
        out = self.step(self.state, scan)
        if self.with_aux:
            self.state, step_out, aux = out
        else:
            self.state, step_out = out
            aux = None
        labels = np.asarray(jax.device_get(step_out.labels))
        outlier = np.asarray(jax.device_get(step_out.outlier))
        ms = (time.perf_counter() - t0) * 1000.0
        self.stats.update(ms)

        n = rec.points.shape[0]
        if n > labels.shape[0]:
            # scan exceeded config.max_points: overflow points were never
            # processed; report them as dropped (label 0) so the output
            # always aligns 1:1 with the input cloud.
            pad = n - labels.shape[0]
            labels = np.concatenate([labels, np.zeros(pad, labels.dtype)])
            outlier = np.concatenate([outlier, np.zeros(pad, outlier.dtype)])
        aux_np = None
        if aux is not None:
            aux_np = {k: np.asarray(v) for k, v in aux._asdict().items()}
        return ScanResult(
            index=rec.index,
            timestamp=rec.timestamp,
            labels=labels[:n],
            outlier=outlier[:n],
            n_points=n,
            wall_ms=ms,
            aux=aux_np,
        )

    def run(
        self,
        records: Iterable[ScanRecord],
        callback: Optional[Callable[[ScanResult], None]] = None,
    ) -> Iterator[ScanResult]:
        for rec in records:
            result = self.process(rec)
            if callback is not None:
                callback(result)
            yield result
