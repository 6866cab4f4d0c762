"""Config-space fuzzing: random valid configs + golden-parity sweep.

The reference is only ever exercised at one geometry (120 m / 0.33 m,
``GroundGrid.h:70-71``); this engine exposes the full parameter surface
(config.py), so parity must hold across it. This module generates random
VALID configs spanning resolution 0.1-1 m, 40-128 cells/side, point-buffer
sizes (mostly non-multiples of the Pallas chunk sizes), march caps/chunking,
ray budgets down to the validated lower bound, and the border-drop flag --
then runs each through a short pipeline-vs-golden parity benchmark
(eval/accuracy.run_accuracy_benchmark).

Used by tests/test_config_fuzz.py (CI sweep: 8 configs + explicit boundary
cases) and scripts/config_fuzz.py (the >=50-config CONFIG_FUZZ.md artifact).

Found by this sweep (round 4): the golden oracle hardcoded the reference's
within-3-of-max-border drop quirk while the pipeline honors
``config.border_drop`` -- every ``border_drop=False`` config diverged at the
max border until the oracle learned the flag.
"""

from __future__ import annotations

import math

import numpy as np

from groundgrid_tpu.config import GroundGridConfig


def min_ray_steps(dimension: float, resolution: float) -> int:
    """The lower bound pipeline._validate enforces (grid half-diagonal)."""
    cells = int(round(dimension / resolution))
    half = cells * resolution / 2.0
    return int(math.ceil(half * math.sqrt(2.0))) + 8


def random_config(rng: np.random.Generator) -> GroundGridConfig:
    """One random VALID config, grid capped at ~128 cells/side so the
    pure-Python oracle stays affordable (cost ~ cells^2 per scan)."""
    resolution = float(rng.uniform(0.1, 1.0))
    cells = int(rng.integers(40, 128))
    dimension = cells * resolution
    need = min_ray_steps(dimension, resolution)
    return GroundGridConfig(
        dimension=dimension,
        resolution=resolution,
        max_points=int(rng.integers(8192, 40000)),  # mostly non-multiples
        ray_steps=need + int(rng.integers(0, 32)),
        max_outlier_candidates=int(rng.integers(1024, 8192)),
        march_chunk=int(rng.integers(128, 2048)),
        border_drop=bool(rng.integers(0, 2)),
        point_count_cell_variance_threshold=int(rng.integers(4, 20)),
        distance_factor=float(rng.uniform(0.00005, 0.0002)),
        patch_size_change_distance=float(rng.uniform(5.0, 30.0)),
        occupied_cells_decrease_factor=float(rng.uniform(2.0, 10.0)),
        outlier_tolerance=float(rng.uniform(0.05, 0.2)),
    )


def describe(cfg: GroundGridConfig) -> dict:
    return dict(
        dimension=round(cfg.dimension, 4), resolution=round(cfg.resolution, 5),
        cells=cfg.cell_count, max_points=cfg.max_points,
        ray_steps=cfg.ray_steps, max_outlier_candidates=cfg.max_outlier_candidates,
        march_chunk=cfg.march_chunk, border_drop=cfg.border_drop,
        point_count_cell_variance_threshold=cfg.point_count_cell_variance_threshold,
        distance_factor=round(cfg.distance_factor, 7),
        patch_size_change_distance=round(cfg.patch_size_change_distance, 3),
        occupied_cells_decrease_factor=round(cfg.occupied_cells_decrease_factor, 3),
        outlier_tolerance=round(cfg.outlier_tolerance, 4),
    )


def fuzz_one(cfg: GroundGridConfig, seed: int, n_scans: int = 2,
             wire: bool = False) -> dict:
    """Parity-run one config; returns the benchmark dict + config summary.

    ``wire=True``: the pipeline runs the s16 wire ingest
    (``sorted_scans + wire_format``; :func:`pipeline.wire_scales` picks the
    per-axis power-of-two quanta for the config's geometry) while golden
    stays on the exact f32 path — pricing the wire format across the
    parameter space. Sorted mode needs ``max_points`` to be a multiple of
    1024 (Pallas chunking), so both engines get the rounded-up cap (scans
    here are ~6k points, far below any cap: behavior-neutral).
    """
    import dataclasses

    from groundgrid_tpu.eval.accuracy import run_accuracy_benchmark

    pipe_cfg = None
    if wire:
        cap = ((cfg.max_points + 1023) // 1024) * 1024
        cfg = dataclasses.replace(cfg, max_points=cap)
        pipe_cfg = dataclasses.replace(
            cfg, sorted_scans=True, wire_format=True)
    r = run_accuracy_benchmark(
        cfg, n_scans=n_scans, seed=seed, n_beams=16, n_azimuth=400,
        step_m=2.0, adversarial=True, pipeline_config=pipe_cfg,
    )
    r["config"] = describe(cfg)
    return r
