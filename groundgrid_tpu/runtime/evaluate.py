"""High-throughput sequence evaluation: step + on-device scoring.

The lock-step evaluation loop (SURVEY.md 3.4) with no per-scan device-to-host
traffic: the jitted pipeline step and the confusion accumulation both run on
device; the host only feeds scans. On a remote/tunneled TPU this is ~5x
faster than fetching labels every scan (each D2H is a synchronous ~35 ms
round trip); on locally-attached hardware it simply removes the fetch from
the critical path.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional, Tuple

import jax
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.data.semantickitti import ScanRecord
from groundgrid_tpu.eval.device import DeviceEvaluator
from groundgrid_tpu.eval.metrics import Evaluator
from groundgrid_tpu.runtime.driver import StreamingDriver, TimingStats


def evaluate_records(
    config: GroundGridConfig,
    records: Iterable[ScanRecord],
    sequence: str = "00",
    evaluator: Optional[DeviceEvaluator] = None,
    progress_every: int = 500,
    progress=print,
) -> Tuple[Evaluator, TimingStats]:
    """Stream records through the pipeline, scoring entirely on device.

    Returns the populated host :class:`Evaluator` and per-scan timing stats.
    """
    from groundgrid_tpu.pipeline import init_state

    from groundgrid_tpu.eval.device import safe_drain_interval

    driver = StreamingDriver(config)
    dev_eval = (
        evaluator if evaluator is not None
        else DeviceEvaluator(
            sequence, drain_every=safe_drain_interval(config.max_points)
        )
    )

    # Timing: per-iteration spans here would measure async dispatch only (the
    # axon runtime defers execution past block_until_ready), so we report the
    # amortized wall time of the whole pipelined run, closed by the forced
    # device-to-host read in to_host() -- the same forced-completion
    # methodology as runtime/bench.py. Compile/warm-up is excluded by
    # restarting the clock after the first scan completes.
    n = 0
    t0 = time.perf_counter()
    for rec in records:
        if not np.isfinite(rec.t_map_velo).all():
            continue
        prepared = getattr(rec, "scan", None)  # native sorted loader output
        driver.ensure_step(rec, prepared)
        if driver.state is None:
            driver.state = init_state(config, rec.t_map_velo)
        scan = prepared if prepared is not None else driver.make_scan(rec)
        driver.state, out = driver.step(driver.state, scan)
        dev_eval.add_cloud_device(out.labels, scan.rings)
        n += 1
        if n == 1:
            _ = np.asarray(jax.device_get(out.labels))  # drain warm-up
            t0 = time.perf_counter()
        if progress_every and dev_eval.clouds % progress_every == 0:
            # one D2H checkpoint, mirroring the reference's 500-cloud print
            progress(dev_eval.to_host().format_statistics())

    host_eval = dev_eval.to_host()  # forces completion of the whole stream
    elapsed_ms = (time.perf_counter() - t0) * 1000.0
    stats = TimingStats()
    if n > 1:
        stats.scans = n - 1
        stats.total_ms = elapsed_ms
        stats.avg_ms = elapsed_ms / (n - 1)
    return host_eval, stats
