"""Default-geometry parity: full 364x364 grid, ~118k-point scans, grid moves.

Round-1 gap (VERDICT.md item 4): all golden-parity tests ran on an 80x80 grid
with 24-beam synthetic scans, leaving the *default* geometry -- the one the
reference's seq-00 table (README.md:56-94) is produced at -- unvalidated.
This module runs >= 3 consecutive 64-beam scans (>100k pts each) through the
full jitted pipeline at the default ``GroundGridConfig`` and asserts

  * label agreement vs the sequential golden oracle at the same <2e-3 bound
    used at 80x80 (tests/test_pipeline.py),
  * the grid actually relocated between scans (the move/damage path is on),
  * warm-scan outlier-candidate counts leave >= 2x headroom vs
    ``max_outlier_candidates`` (overflow sheds the shortest-budget candidates,
    core/outliers.py). Scan 0 is exempt: a fresh grid initializes ground at
    the sensor height, so nearly every point is "below ground" -- but the
    confidence map is all-zero, no march can fire, and the overflow is
    provably inert (asserted below via the outlier output).

Slow (~45 s CPU: 29 s golden oracle + 16 s XLA compile); kept in the default
suite on purpose -- it is the only full-scale accuracy evidence available
without the SemanticKITTI dataset.
"""

import numpy as np
import pytest

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.golden import GoldenGroundGrid
from groundgrid_tpu.pipeline import init_state, make_step, pad_scan


@pytest.fixture(scope="module")
def full_config() -> GroundGridConfig:
    return GroundGridConfig()  # true defaults: 120 m / 0.33 m => 364x364


@pytest.fixture(scope="module")
def full_scans(full_config):
    """Three consecutive 64-beam scans; step 1.2 m => ~3-4 cell grid moves."""
    from groundgrid_tpu.data.synthetic import synthetic_sequence

    out = list(
        synthetic_sequence(3, seed=11, n_beams=64, n_azimuth=2048, step_m=1.2)
    )
    for pts, lbl, T in out:
        assert pts.shape[0] > 100_000, pts.shape  # HDL-64E-scale scans
        assert pts.shape[0] <= full_config.max_points
    return out


def _candidate_count(cfg, golden, pts_map, rings, origin):
    """Outlier-candidate count exactly as core/outliers.py defines it:
    inmap & not-ignored & (z < prev_ground[cell] - 0.2)."""
    n = cfg.cell_count
    center = golden.state.center
    rel0 = (center[0] + cfg.half_length) - pts_map[:, 0].astype(np.float64)
    rel1 = (center[1] + cfg.half_length) - pts_map[:, 1].astype(np.float64)
    g0 = np.floor(rel0 / cfg.resolution).astype(np.int64)
    g1 = np.floor(rel1 / cfg.resolution).astype(np.int64)
    inmap = (g0 >= 0) & (g0 < n) & (g1 >= 0) & (g1 < n)
    sqdist = (pts_map[:, 0] - origin[0]) ** 2 + (pts_map[:, 1] - origin[1]) ** 2
    ignored = (rings > cfg.max_ring) | (sqdist < cfg.min_dist_squared)
    gc0 = np.clip(g0, 0, n - 1)
    gc1 = np.clip(g1, 0, n - 1)
    below = pts_map[:, 2] < golden.state.ground[gc0, gc1] - np.float32(0.2)
    return int((inmap & ~ignored & below).sum())


def test_full_geometry_pipeline_matches_golden(full_config, full_scans):
    cfg = full_config
    step = make_step(cfg)
    golden = GoldenGroundGrid(cfg)
    state = None
    total = mismatches = 0
    centers = []
    for scan_idx, (pts_velo, labels, T) in enumerate(full_scans):
        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        centers.append(golden.state.center.copy())

        # candidate-buffer headroom (VERDICT item 4): measured against the
        # post-move, pre-scan terrain, i.e. exactly what detect_outliers sees
        n_cand = _candidate_count(
            cfg, golden, pts_map, labels, np.asarray(mv[:3, 3])
        )
        if scan_idx > 0:  # scan 0 overflows by design (see module docstring)
            assert n_cand * 2 <= cfg.max_outlier_candidates, (
                f"scan {scan_idx}: outlier candidates {n_cand} leave <2x "
                f"headroom vs max_outlier_candidates={cfg.max_outlier_candidates}"
            )

        want = golden.filter_cloud(
            pts_map, labels, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64)
        )

        scan = pad_scan(cfg, pts_velo, labels, T)
        if state is None:
            state = init_state(cfg, np.asarray(T, np.float32))
        state, out = step(state, scan)
        got = np.asarray(out.labels)[: len(want)]

        if scan_idx == 0:
            # cold-start overflow is inert: all-zero confidence => no outliers
            assert n_cand > cfg.max_outlier_candidates  # it DID overflow
            assert int(np.asarray(out.outlier).sum()) == 0
            assert not golden.last_outliers

        total += len(want)
        mismatches += int((got != want).sum())

    # the sequence must actually exercise grid relocation
    moves = [np.abs(b - a).max() for a, b in zip(centers, centers[1:])]
    assert max(moves) >= cfg.resolution, f"grid never moved: {centers}"

    rate = mismatches / total
    assert rate < 2e-3, f"label mismatch rate {rate:.4%} ({mismatches}/{total})"
