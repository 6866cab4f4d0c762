"""Fused detect-stencil Pallas kernel vs the XLA path and the golden oracle.

The kernel (ops/pallas_detect.py) replaces the eight reduce_window calls of
core/detect.py with one VMEM pass; thresholds come from the same f64 host
tables, so divergence is confined to <=few-ulp box-sum reassociation
(near-threshold ties). Tests run the kernel in interpret mode on the CPU
mesh; the real-hardware measurement lives in PERFORMANCE.md.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import detect as detectlib
from groundgrid_tpu.ops.pallas_detect import detect_ground_patches_fused
from tests.conftest import assert_layers_close

FLT_MAX = np.float32(np.finfo(np.float32).max)


def _random_inputs(n, seed):
    """Plausible detect-stage inputs: sparse integer counts, empty-cell
    conventions matching the rasterizer (variance 0 / min_gh FLT_MAX)."""
    rng = np.random.default_rng(seed)
    points = rng.poisson(1.2, (n, n)).astype(np.float32)
    points[rng.random((n, n)) < 0.4] = 0.0
    occupied = points > 0
    variance = np.where(occupied, rng.gamma(2.0, 0.05, (n, n)), 0.0).astype(np.float32)
    min_gh = np.where(occupied, rng.normal(-1.6, 0.4, (n, n)), FLT_MAX).astype(np.float32)
    ground = rng.normal(-1.7, 0.3, (n, n)).astype(np.float32)
    conf = rng.random((n, n)).astype(np.float32)
    return points, variance, min_gh, ground, conf


@pytest.mark.parametrize(
    "dim,res",
    [
        (40.0, 0.5),   # 80 cells: ROWS-aligned multi-block
        (22.0, 0.5),   # 44 cells: partial last block (44 = 32 + 12)
        (6.0, 0.5),    # 12 cells: single sub-ROWS block (nb == 1 clamps)
        (16.65, 0.37), # 45 cells at a non-f32-exact resolution
    ],
)
def test_fused_matches_xla(dim, res):
    cfg = GroundGridConfig(dimension=dim, resolution=res, max_points=1024,
                           ray_steps=20, max_outlier_candidates=256)
    n = cfg.cell_count
    tables = detectlib.make_tables(cfg)
    mismatches = 0
    for seed in range(3):
        points, variance, min_gh, ground, conf = _random_inputs(n, seed)
        ref_g, ref_c = detectlib.detect_ground_patches(
            cfg, tables, jnp.asarray(points), jnp.asarray(variance),
            jnp.asarray(min_gh), jnp.asarray(ground), jnp.asarray(conf))
        got_g, got_c = detect_ground_patches_fused(
            cfg, tables, jnp.asarray(points), jnp.asarray(variance),
            jnp.asarray(min_gh), jnp.asarray(ground), jnp.asarray(conf),
            interpret=True)
        ref_g, ref_c = np.asarray(ref_g), np.asarray(ref_c)
        got_g, got_c = np.asarray(got_g), np.asarray(got_c)
        # branch flips from <=few-ulp box-sum reassociation are legal but must
        # be rare; same-branch values must agree to fp noise.
        flip = (~np.isclose(got_g, ref_g, atol=1e-4, rtol=1e-4)) | (
            ~np.isclose(got_c, ref_c, atol=1e-5, rtol=1e-5))
        mismatches += int(flip.sum())
    assert mismatches <= max(3, n * n // 10000), (
        f"{mismatches} branch flips across 3 seeds at n={n}")


def test_fused_noninterior_passthrough():
    """Border cells (and the clamp-duplicated halo rows) must pass ground /
    groundpatch through untouched, exactly."""
    cfg = GroundGridConfig(dimension=40.0, resolution=0.5, max_points=1024,
                           ray_steps=20, max_outlier_candidates=256)
    n = cfg.cell_count
    tables = detectlib.make_tables(cfg)
    points, variance, min_gh, ground, conf = _random_inputs(n, 7)
    got_g, got_c = detect_ground_patches_fused(
        cfg, tables, jnp.asarray(points), jnp.asarray(variance),
        jnp.asarray(min_gh), jnp.asarray(ground), jnp.asarray(conf),
        interpret=True)
    got_g, got_c = np.asarray(got_g), np.asarray(got_c)
    border = np.ones((n, n), dtype=bool)
    border[2 : n - 2, 2 : n - 2] = False
    np.testing.assert_array_equal(got_g[border], ground[border])
    np.testing.assert_array_equal(got_c[border], conf[border])


@pytest.fixture(scope="module")
def golden_detect_cases(small_config, small_scans):
    """Golden-oracle detect-stage inputs/outputs per scan (as in
    tests/test_stages_vs_golden.py, reduced to what detect needs)."""
    from groundgrid_tpu.core import rasterize as rasterlib
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.golden import GoldenGroundGrid

    cfg = small_config
    n = cfg.cell_count
    eng = GoldenGroundGrid(cfg)
    cases = []
    for pts_velo, labels, T in small_scans[:2]:
        mv, mb, bm = tf.scan_poses(T)
        pts_map = (pts_velo @ np.asarray(mv[:3, :3], np.float32).T) + np.asarray(
            mv[:3, 3], np.float32)
        origin = np.asarray(mv[:3, 3], np.float32)
        eng.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        center = eng.state.center.copy()
        eng.filter_cloud(pts_map, labels, origin, np.asarray(mb, np.float64))
        binning = rasterlib.bin_points(
            cfg, jnp.asarray(center, jnp.float32), jnp.asarray(pts_map[:, 0]),
            jnp.asarray(pts_map[:, 1]), jnp.asarray(pts_map[:, 2]),
            jnp.asarray(labels.astype(np.int32)),
            jnp.ones(pts_map.shape[0], dtype=bool), jnp.asarray(origin))
        outlier = np.zeros(pts_map.shape[0], dtype=bool)
        outlier[np.array(eng.last_outliers, dtype=np.int64)] = True
        accept = np.asarray(binning.inmap) & ~np.asarray(binning.ignored) & ~outlier
        cell = np.asarray(binning.cell)
        counts = np.bincount(cell[accept], minlength=n * n + 1)[: n * n]
        counts = counts.reshape(n, n).astype(np.float32)
        sc = eng.scratch
        g0, c0 = eng.snapshots["pre_detect"]
        g1, c1 = eng.snapshots["post_detect"]
        cases.append((counts, sc["variance"].copy(), sc["minGroundHeight"].copy(),
                      g0.copy(), c0.copy(), g1.copy(), c1.copy()))
    return cases


@pytest.mark.parametrize("scan_idx", [0, 1])
def test_fused_with_golden_inputs(small_config, golden_detect_cases, scan_idx):
    """Same certification as test_detect_with_golden_inputs, fused kernel."""
    cfg = small_config
    counts, variance, min_gh, g0, c0, g1, c1 = golden_detect_cases[scan_idx]
    tables = detectlib.make_tables(cfg)
    new_g, new_c = detect_ground_patches_fused(
        cfg, tables, jnp.asarray(counts), jnp.asarray(variance),
        jnp.asarray(min_gh), jnp.asarray(g0), jnp.asarray(c0), interpret=True)
    assert_layers_close(new_g, g1, "ground(post-detect,fused)", atol=1e-4)
    assert_layers_close(new_c, c1, "groundpatch(post-detect,fused)", atol=1e-5)


def test_fused_pipeline_parity(small_config):
    """End-to-end: the fused-detect pipeline stays within the fuzz-campaign
    acceptance envelope vs the golden oracle (same criteria as
    scripts/config_fuzz.py)."""
    from groundgrid_tpu.eval.fuzz import fuzz_one

    cfg = dataclasses.replace(small_config, fused_detect=True)
    r = fuzz_one(cfg, seed=11, n_scans=2)
    assert r["max_abs_delta_pt"] < 0.1, r
    assert r["label_mismatch_rate"] < 2e-3, r
