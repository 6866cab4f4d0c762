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


def _golden_pair_inputs(n_scans=4, seed=29):
    """Shared small-geometry scan stream for the chaos-control tests."""
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.synthetic import adversarial_sequence

    cfg = GroundGridConfig(dimension=60.0, resolution=0.5, max_points=32768)
    scans = []
    for pts_velo, lbl, T in adversarial_sequence(
        n_scans, seed=seed, n_beams=32, n_azimuth=900, step_m=2.0
    ):
        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        scans.append(
            (np.stack([x, y, z], -1), np.asarray(lbl), np.asarray(mv[:3, 3]),
             np.asarray(T, np.float64), np.asarray(mb, np.float64),
             np.asarray(bm, np.float64))
        )
    return cfg, scans


def test_golden_bitwise_stable_under_point_permutation():
    """Every value detect writes is order-invariant (counts, mins, their
    quotients), so feeding golden the same points in a permuted order must
    reproduce the grid state BITWISE -- the result that rules out
    accumulation-order noise as the pipeline-vs-golden divergence mechanism
    (measured at full geometry by scripts/chaos_diag.py; pinned here)."""
    from groundgrid_tpu.golden import GoldenGroundGrid

    cfg, scans = _golden_pair_inputs()
    g_a = GoldenGroundGrid(cfg)
    g_b = GoldenGroundGrid(cfg)
    for i, (pts, lbl, origin, T, mb, bm) in enumerate(scans):
        g_a.update_odom(T, bm)
        la = g_a.filter_cloud(pts, lbl, origin, mb)
        perm = np.random.default_rng(77 + i).permutation(len(pts))
        g_b.update_odom(T, bm)
        lb = g_b.filter_cloud(pts[perm], lbl[perm], origin, mb)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb)[inv])
    np.testing.assert_array_equal(g_a.state.ground, g_b.state.ground)
    np.testing.assert_array_equal(g_a.state.groundpatch, g_b.state.groundpatch)


def test_golden_chaos_variance_ulp_knob():
    """The harness knob nudges exactly the nonzero variance cells and leaves
    exact zeros (empty / single-point cells) untouched."""
    from groundgrid_tpu.golden import GoldenGroundGrid

    cfg, scans = _golden_pair_inputs(n_scans=1)
    g_a = GoldenGroundGrid(cfg)
    g_b = GoldenGroundGrid(cfg)
    g_b.chaos_variance_ulps = 1
    pts, lbl, origin, T, mb, bm = scans[0]
    g_a.update_odom(T, bm)
    g_a.filter_cloud(pts, lbl, origin, mb)
    g_b.update_odom(T, bm)
    g_b.filter_cloud(pts, lbl, origin, mb)
    va = g_a.scratch["variance"]
    vb = g_b.scratch["variance"]
    nz = va > 0
    assert nz.any() and (~nz).any()
    np.testing.assert_array_equal(va[~nz], vb[~nz])  # zeros untouched
    assert np.all(va[nz] != vb[nz])  # every nonzero cell moved
    # by exactly one ulp in some direction
    up = np.nextafter(va, np.float32(np.inf), dtype=np.float32)
    dn = np.nextafter(va, np.float32(-np.inf), dtype=np.float32)
    assert np.all((vb[nz] == up[nz]) | (vb[nz] == dn[nz]))


def test_chaos_control_modes_report_envelope():
    cfg = GroundGridConfig(dimension=40.0, resolution=0.5, max_points=16384)
    r = run_accuracy_benchmark(
        cfg, n_scans=3, seed=31, n_beams=32, n_azimuth=600, step_m=2.0,
        adversarial=True, chaos_control="ulp",
    )
    assert r["chaos_mode"] == "ulp"
    assert np.isfinite(r["max_abs_chaos_envelope_pt"])
    r2 = run_accuracy_benchmark(
        cfg, n_scans=3, seed=31, n_beams=32, n_azimuth=600, step_m=2.0,
        adversarial=True, chaos_control="perm",
    )
    assert r2["chaos_mode"] == "perm"
    # the order class is bitwise-inert: envelope exactly zero
    assert r2["max_abs_chaos_envelope_pt"] == 0.0


def test_kitti_world_via_benchmark_api():
    """`world="kitti"` routes the KITTI-operating-point generator through
    the same benchmark/CLI surface (the campaign regime, ACCURACY_r4.md),
    and parity holds there at CI geometry too."""
    cfg = GroundGridConfig(dimension=60.0, resolution=0.5, max_points=32768)
    r = run_accuracy_benchmark(
        cfg, n_scans=6, seed=1, n_beams=32, n_azimuth=900, step_m=1.2,
        world="kitti", variant="city",
    )
    assert r["workload"]["world"] == "kitti"
    assert r["workload"]["variant"] == "city"
    assert r["pipeline"]["clouds"] == r["golden"]["clouds"] == 6
    assert r["max_abs_delta_pt"] < 0.1, r["delta_pt"]
    for k in HEADLINE:
        assert np.isfinite(r["pipeline"][k])
