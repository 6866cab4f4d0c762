"""Config-space fuzz: golden parity must hold across the parameter space.

Everything else in the suite validates two pinned geometries (0.33 m/364^2
and the small test grids). This module sweeps RANDOM valid configs --
resolution, dimension, point-buffer size, march caps/chunking, ray budget at
its lower bound, border-drop off -- through a short pipeline-vs-golden
parity run, plus explicit cases at the implementation's shape boundaries:

  * ``max_points`` above the u32 single-key sort ceiling (2^17,
    core/outliers.py U32_SORT_MAX_POINTS) -> the (f32, i32) top_k
    candidate-selection fallback;
  * ``max_points`` not a multiple of the Pallas raster CHUNK (512) or the
    lookup GROUP (1024) -> the non-kernel scatter/gather paths;
  * ``ray_steps`` exactly at the half-diagonal lower bound the pipeline
    validates (pipeline._validate);
  * ``march_chunk`` larger than ``max_outlier_candidates`` (chunk clipping
    and single-chunk march).

The CI sweep keeps the pure-Python oracle affordable (small grids, 2 scans,
~6k pts/scan); ``scripts/config_fuzz.py`` runs the full >=50-config campaign
and writes the CONFIG_FUZZ.md artifact.
"""

from __future__ import annotations

import numpy as np
import pytest

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.eval.fuzz import fuzz_one, min_ray_steps, random_config


def run_parity(cfg: GroundGridConfig, seed: int, n_scans: int = 2) -> dict:
    return fuzz_one(cfg, seed=seed, n_scans=n_scans)


def assert_parity(cfg: GroundGridConfig, r: dict) -> None:
    summary = {
        "cfg": dict(dimension=cfg.dimension, resolution=cfg.resolution,
                    cells=cfg.cell_count, max_points=cfg.max_points,
                    ray_steps=cfg.ray_steps,
                    cands=cfg.max_outlier_candidates,
                    chunk=cfg.march_chunk, border_drop=cfg.border_drop),
        "delta_pt": r["delta_pt"],
        "mismatch": r["label_mismatch_rate"],
    }
    assert r["max_abs_delta_pt"] < 0.1, summary
    assert r["label_mismatch_rate"] < 2e-3, summary
    assert r["workload"]["total_points"] > 5000, summary


@pytest.mark.parametrize("seed", range(8))
def test_random_config_golden_parity(seed):
    cfg = random_config(np.random.default_rng(1000 + seed))
    assert_parity(cfg, run_parity(cfg, seed=40 + seed))


def test_u32_sort_ceiling_boundary():
    """max_points just past 2^17: candidate selection must take the top_k
    pair-sort fallback (the packed u32 key only indexes 2^17 points) and
    still match golden. Also a non-multiple of CHUNK=512 and GROUP=1024."""
    from groundgrid_tpu.core.outliers import U32_SORT_MAX_POINTS

    mp = U32_SORT_MAX_POINTS + 640
    cfg = GroundGridConfig(
        dimension=40.0, resolution=0.5, max_points=mp, ray_steps=70,
        max_outlier_candidates=2048,
    )
    assert_parity(cfg, run_parity(cfg, seed=91))


def test_u32_sort_ceiling_exact():
    """max_points exactly AT the ceiling still rides the packed-key sort
    (indices 0..2^17-1 fit) -- the boundary itself must not be off by one."""
    from groundgrid_tpu.core.outliers import U32_SORT_MAX_POINTS

    cfg = GroundGridConfig(
        dimension=40.0, resolution=0.5, max_points=U32_SORT_MAX_POINTS,
        ray_steps=70, max_outlier_candidates=2048,
    )
    assert_parity(cfg, run_parity(cfg, seed=92))


def test_ray_steps_at_lower_bound():
    """ray_steps exactly at the validated half-diagonal minimum: the march
    must still cover every in-grid lattice step the oracle walks."""
    dim, res = 50.0, 0.5
    cfg = GroundGridConfig(
        dimension=dim, resolution=res, max_points=16384,
        ray_steps=min_ray_steps(dim, res), max_outlier_candidates=2048,
    )
    assert_parity(cfg, run_parity(cfg, seed=93))
    with pytest.raises(ValueError):
        from groundgrid_tpu.pipeline import make_step_fn

        make_step_fn(GroundGridConfig(
            dimension=dim, resolution=res, max_points=16384,
            ray_steps=min_ray_steps(dim, res) - 1,
        ))


def test_march_chunk_exceeds_candidate_cap():
    """march_chunk > max_outlier_candidates: the chunk clips to the cap and
    the march runs as a single unrolled chunk."""
    cfg = GroundGridConfig(
        dimension=40.0, resolution=0.5, max_points=16384, ray_steps=70,
        max_outlier_candidates=512, march_chunk=4096,
    )
    assert_parity(cfg, run_parity(cfg, seed=94))


def test_non_exact_resolution_many_cells():
    """An awkward resolution (0.37 is not f32-exact, cells*res not integral)
    at a larger cell count: stresses the ds binning + ring walk geometry."""
    cfg = GroundGridConfig(
        dimension=44.4, resolution=0.37, max_points=16384,
        ray_steps=min_ray_steps(44.4, 0.37) + 5, max_outlier_candidates=2048,
    )
    assert_parity(cfg, run_parity(cfg, seed=95))
