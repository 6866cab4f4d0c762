"""Metric-level accuracy acceptance (VERDICT r2 item 1).

The reference's acceptance currency is F1/IoUg on seq 00 (README.md:56-94).
Without the dataset, the bound we CAN enforce is the delta between the jitted
pipeline and the sequential golden oracle when both consume the identical
adversarial sequence and both are scored by the reference scorer: |ΔF1| and
|ΔIoUg| < 0.1 pt (the remaining 0.4 pt of the 0.5 pt budget is reserved for
the racy-reference gap, SURVEY.md §7).

CI geometry keeps the pure-Python oracle affordable; the full 120-scan
364x364 run is the `groundgrid-tpu accuracy` CLI artifact (ACCURACY.md).
"""

import numpy as np
import pytest

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.eval.accuracy import HEADLINE, run_accuracy_benchmark


@pytest.fixture(scope="module")
def result():
    cfg = GroundGridConfig(dimension=60.0, resolution=0.5, max_points=32768)
    return run_accuracy_benchmark(
        cfg, n_scans=10, seed=23, n_beams=32, n_azimuth=900, step_m=2.0,
        adversarial=True,
    )


def test_headline_deltas_within_budget(result):
    assert result["max_abs_delta_pt"] < 0.1, result["delta_pt"]
    # both engines actually scored the same (nontrivial) workload
    assert result["pipeline"]["clouds"] == result["golden"]["clouds"] == 10
    assert result["workload"]["total_points"] > 100_000


def test_f1_ioug_deltas_individually(result):
    # the two acceptance metrics, named explicitly
    assert abs(result["delta_pt"]["f1"]) < 0.1, result["delta_pt"]
    assert abs(result["delta_pt"]["ioug"]) < 0.1, result["delta_pt"]
    # raw per-point disagreement stays in the fp-noise class
    assert result["label_mismatch_rate"] < 2e-3


def test_metrics_are_finite_and_sane(result):
    for eng in ("pipeline", "golden"):
        for k in HEADLINE:
            v = result[eng][k]
            assert np.isfinite(v) and 0.0 <= v <= 1.0, (eng, k, v)
    # the adversarial scene must still be mostly solvable: precision high
    # even where cold-start recall is not
    assert result["golden"]["precision"] > 0.9
