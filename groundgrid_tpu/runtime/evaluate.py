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
    driver = StreamingDriver(config)
    dev_eval = evaluator if evaluator is not None else DeviceEvaluator(sequence)
    stats = TimingStats()

    for rec in records:
        if not np.isfinite(rec.t_map_velo).all():
            continue
        prepared = getattr(rec, "scan", None)  # native sorted loader output
        if driver.step is None and prepared is None:
            driver._compile(rec)
        elif driver.step is None:
            import jax

            from groundgrid_tpu.pipeline import (
                compile_step_verified, init_state, make_step,
            )

            if jax.default_backend() == "tpu":
                probe = init_state(config, rec.t_map_velo.astype(np.float32))
                driver.step, _ = compile_step_verified(config, probe, prepared)
            else:
                driver.step = make_step(config)
        t0 = time.perf_counter()
        if driver.state is None:
            from groundgrid_tpu.pipeline import init_state

            driver.state = init_state(config, rec.t_map_velo.astype(np.float32))
        scan = prepared if prepared is not None else driver._make_scan(rec)
        driver.state, out = driver.step(driver.state, scan)
        dev_eval.add_cloud_device(out.labels, scan.rings)
        stats.update((time.perf_counter() - t0) * 1000.0)
        if progress_every and dev_eval.clouds % progress_every == 0:
            # one D2H checkpoint, mirroring the reference's 500-cloud print
            progress(dev_eval.to_host().format_statistics())

    host_eval = dev_eval.to_host()
    return host_eval, stats
