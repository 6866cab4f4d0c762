"""Measure the kitti_world scored profile vs the reference seq-00 table.

Runs the pipeline (default config) over a forward cruise of the KITTI-like
world, scores with the reference scorer, and prints per-class ground%% next
to the README targets (/root/reference/README.md:56-94). Used to TUNE the
world until the operating point matches; the parity campaign then runs at
that operating point (scripts/kitti_campaign.py).

Usage: python scripts/kitti_tune.py [--scans 30] [--seed 0] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# README.md:59-94 targets: {label: ground%}
TARGET_GROUND_PCT = {
    "road": 99.93, "parking": 99.55, "sidewalk": 99.09, "other-ground": 93.57,
    "lane-marking": 99.84, "terrain": 93.32, "car": 5.58, "building": 2.67,
    "fence": 11.09, "vegetation": 6.57, "trunk": 2.12, "pole": 1.86,
    "traffic-sign": 0.13, "other-structure": 10.08, "other-object": 10.41,
    "moving-car": 3.52, "outlier": 57.49, "unlabeled": 11.26,
}
TARGET_HEADLINE = {"precision": 96.05, "recall": 98.70, "f1": 97.35,
                   "accuracy": 97.24, "ioug": 94.84}
# seq-00 class share of all points (totals column / 549.3M)
TARGET_SHARE_PCT = {
    "vegetation": 23.7, "building": 22.0, "road": 17.4, "sidewalk": 14.3,
    "car": 8.3, "terrain": 5.3, "fence": 3.2, "parking": 1.5, "trunk": 0.8,
    "unlabeled": 1.3, "other-object": 0.9, "pole": 0.34, "moving-car": 0.05,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variant", default="forward")
    ap.add_argument("--step", type=float, default=1.2)
    ap.add_argument("--rain", type=float, default=0.0)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.data.kitti_world import kitti_sequence
    from groundgrid_tpu.data.labels import LABELS, NAME_TO_ID
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.runtime.driver import StreamingDriver

    cfg = GroundGridConfig()
    driver = StreamingDriver(cfg)
    ev = Evaluator("kitti-like")
    t0 = time.monotonic()
    n_pts = 0
    for idx, (pts, lbl, T) in enumerate(kitti_sequence(
        args.scans, seed=args.seed, variant=args.variant, rain_rate=args.rain,
        step_m=args.step,
    )):
        rec = ScanRecord(
            index=idx, timestamp=idx * 0.1,
            points=np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1),
            labels=np.asarray(lbl, np.int32),
            t_map_velo=np.asarray(T, np.float64),
        )
        res = driver.process(rec)
        ev.add_cloud(res.labels, lbl)
        n_pts += len(lbl)

    m = ev.compute().as_dict()
    total_all = int(ev.total.sum())
    print(f"\n{args.scans} scans, {n_pts} pts ({n_pts // args.scans}/scan), "
          f"{time.monotonic() - t0:.0f}s\n")
    print(f"{'label':18s} {'share%':>7s} {'tgt':>6s}  {'ground%':>8s} {'tgt':>7s}")
    for lid in sorted(LABELS):
        tot = int(ev.total[lid])
        if tot == 0:
            continue
        name = LABELS[lid]
        g_pct = 100.0 * (1.0 - ev.nonground_count[lid] / tot)
        share = 100.0 * tot / total_all
        t_g = TARGET_GROUND_PCT.get(name)
        t_s = TARGET_SHARE_PCT.get(name)
        print(f"{name:18s} {share:7.2f} {t_s if t_s is not None else '':>6} "
              f" {g_pct:8.2f} {t_g if t_g is not None else '':>7}")
    print()
    for k, tgt in TARGET_HEADLINE.items():
        print(f"{k:10s} {m[k] * 100:6.2f}  target {tgt:6.2f}  "
              f"delta {m[k] * 100 - tgt:+6.2f}")


if __name__ == "__main__":
    main()
