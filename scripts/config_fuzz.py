"""Full config-space fuzz campaign -> CONFIG_FUZZ.md artifact.

Runs >=50 random valid configs (groundgrid_tpu/eval/fuzz.py) plus the
explicit boundary cases from tests/test_config_fuzz.py through the
pipeline-vs-golden parity benchmark and writes a table artifact.

Usage:  python scripts/config_fuzz.py [--n 50] [--out CONFIG_FUZZ.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from groundgrid_tpu.config import GroundGridConfig  # noqa: E402
from groundgrid_tpu.eval.fuzz import fuzz_one, min_ray_steps, random_config  # noqa: E402


def boundary_configs() -> list[tuple[str, GroundGridConfig]]:
    from groundgrid_tpu.core.outliers import U32_SORT_MAX_POINTS

    return [
        ("u32-sort ceiling +640 (top_k fallback, CHUNK/GROUP non-multiple)",
         GroundGridConfig(dimension=40.0, resolution=0.5,
                          max_points=U32_SORT_MAX_POINTS + 640, ray_steps=70,
                          max_outlier_candidates=2048)),
        ("u32-sort ceiling exact",
         GroundGridConfig(dimension=40.0, resolution=0.5,
                          max_points=U32_SORT_MAX_POINTS, ray_steps=70,
                          max_outlier_candidates=2048)),
        ("ray_steps at validated lower bound",
         GroundGridConfig(dimension=50.0, resolution=0.5, max_points=16384,
                          ray_steps=min_ray_steps(50.0, 0.5),
                          max_outlier_candidates=2048)),
        ("march_chunk > candidate cap (single clipped chunk)",
         GroundGridConfig(dimension=40.0, resolution=0.5, max_points=16384,
                          ray_steps=70, max_outlier_candidates=512,
                          march_chunk=4096)),
        ("non-f32-exact resolution 0.37",
         GroundGridConfig(dimension=44.4, resolution=0.37, max_points=16384,
                          ray_steps=min_ray_steps(44.4, 0.37) + 5,
                          max_outlier_candidates=2048)),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--out", default="CONFIG_FUZZ.md")
    ap.add_argument("--fused", action="store_true",
                    help="run every config with fused_detect=True (the "
                    "Pallas detect-stencil kernel's own fuzz campaign)")
    ap.add_argument("--wire", action="store_true",
                    help="pipeline runs the s16 wire ingest vs the f32 "
                    "golden at every config (prices the wire format across "
                    "the parameter space; acceptance = metric bound only, "
                    "label flips are quantization-priced and reported)")
    args = ap.parse_args()

    t0 = time.monotonic()
    rows = []
    worst = 0.0
    worst_mismatch = 0.0
    fails = 0

    runs: list[tuple[str, GroundGridConfig, int]] = [
        (name, cfg, 900 + i) for i, (name, cfg) in enumerate(boundary_configs())
    ] + [
        (f"random #{i}", random_config(np.random.default_rng(1000 + i)), 40 + i)
        for i in range(args.n)
    ]
    if args.fused:
        import dataclasses

        runs = [(name, dataclasses.replace(cfg, fused_detect=True), seed)
                for name, cfg, seed in runs]
    for name, cfg, seed in runs:
        r = fuzz_one(cfg, seed=seed, wire=args.wire)
        # wire rows: label flips are the measured price of the s16
        # quantization (reported, not bounded) and the metric bound widens
        # to 1 pt: the failure mechanism at coarse resolutions is a single
        # quantization-perturbed detect gate relabeling one whole cell
        # (diagnosed round 5: 78 flips in 9 cells, 0.8 m ground divergence
        # at one cell), and in a 2-scan ~11k-point micro-world one cell IS
        # ~0.5-1 pt of the score. The production-geometry price is bounded
        # separately at 0.0156 pt over 33.1M points (ACCURACY_r5.md).
        bound = 1.0 if args.wire else 0.1
        ok = r["max_abs_delta_pt"] < bound and (
            args.wire or r["label_mismatch_rate"] < 2e-3)
        fails += 0 if ok else 1
        worst = max(worst, r["max_abs_delta_pt"])
        worst_mismatch = max(worst_mismatch, r["label_mismatch_rate"])
        c = r["config"]
        rows.append(
            f"| {name} | {c['dimension']:.1f}/{c['resolution']:.3f} "
            f"({c['cells']}^2) | {c['max_points']} | {c['ray_steps']} | "
            f"{c['max_outlier_candidates']}/{c['march_chunk']} | "
            f"{'on' if c['border_drop'] else 'off'} | "
            f"{r['max_abs_delta_pt']:.4f} | {r['label_mismatch_rate']:.2e} | "
            f"{'ok' if ok else '**FAIL**'} |"
        )
        print(f"{name}: max|d|={r['max_abs_delta_pt']:.4f} pt "
              f"mismatch={r['label_mismatch_rate']:.2e} {'ok' if ok else 'FAIL'}",
              flush=True)

    body = "\n".join(
        [
            "# Config-space fuzz campaign: pipeline vs golden across the parameter space"
            + (" (fused_detect=True)" if args.fused else "")
            + (" (s16 wire ingest vs f32 golden)" if args.wire else ""),
            "",
            "Generated by `scripts/config_fuzz.py` (generator:",
            "`groundgrid_tpu/eval/fuzz.py`). Each row is a 2-scan adversarial",
            "parity run (~8k pts) of the jitted pipeline against the",
            "sequential golden oracle at a random or boundary config;",
            "acceptance per row: max |metric delta| < 0.1 pt and per-point",
            "label disagreement < 2e-3 (the bounds tests/test_accuracy.py",
            "pins at the reference geometry)."
            + (" WIRE MODE: acceptance = metric delta < 1 pt per 2-scan "
               "micro-run; the flip rate is the measured price of the s16 "
               "quanta (pipeline.wire_scales picks per-geometry power-of-"
               "two steps) and is reported, not bounded. The measured "
               "flips are xy-edge-driven (a ~1-2 mm xy quantum moves a "
               "point across a cell edge; a perturbed near-gate cell then "
               "relabels wholesale -- diagnosed: 78 flips in 9 cells with "
               "0.8 m ground divergence at ONE cell), and the large "
               "per-row deltas are micro-world amplification: e.g. the "
               "0.43 pt row is ONE flipped point in a tiny scored set. At "
               "the production geometry the wire price is bounded "
               "separately at 0.0156 pt over 33.1M points (ACCURACY_r5.md "
               "section 2). This fuzz also drove a prophylactic hardening: "
               "the z-span rule (one power finer than xy) left small grids "
               "only +/-4-8 m of z span, silently clamping real returns to "
               "wrong in-map heights (z-clamped points measured in the "
               "dimension<=17 m rows; their labels happened to be "
               "clamp-invariant here, so results are identical pre/post "
               "fix); wire_scales now floors the z span at +/-16 m, "
               "unchanged at the default geometry and verified to "
               "reconstruct the full scene z range at small grids."
               if args.wire else ""),
            "",
            f"- configs: {len(runs)} ({len(boundary_configs())} boundary + "
            f"{args.n} random), wall {time.monotonic() - t0:.0f} s",
            f"- worst max|delta|: **{worst:.4f} pt**; worst label mismatch: "
            f"**{worst_mismatch:.2e}**; failures: **{fails}**",
            "",
            "Finding already fixed by this campaign (round 4): every",
            "`border_drop=False` config diverged at the max-border cells --",
            "the golden oracle hardcoded the reference's within-3-of-max-",
            "border drop quirk (GroundSegmentation.cpp:167-168) while the",
            "pipeline honors the flag; the oracle now honors it too",
            "(golden.py stage 4, tests/golden_audit.py).",
            "",
            "| config | dim/res (cells) | max_points | ray_steps | cands/chunk "
            "| border | max|delta| (pt) | label mismatch | status |",
            "|---|---|---|---|---|---|---|---|---|",
            *rows,
            "",
        ]
    )
    with open(args.out, "w") as f:
        f.write(body)
    print(json.dumps(dict(configs=len(runs), worst_delta_pt=worst,
                          worst_mismatch=worst_mismatch, failures=fails,
                          wall_s=round(time.monotonic() - t0, 1))))


if __name__ == "__main__":
    main()
