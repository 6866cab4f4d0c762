"""KITTI-operating-point parity campaign (VERDICT r3 'Next round' #1 + #6).

Runs the jitted pipeline AND the sequential NumPy golden oracle over the
KITTI-like urban world (``data/kitti_world.py`` — scored profile tuned to
the reference's seq-00 table, /root/reference/README.md:56-94), scores both
with the reference scorer (``eval/metrics.py``), and bounds the metric
delta at the reference's own operating point (~98–99 % recall, not the old
adversarial world's 71 %).

Campaign matrix (drive plans per data/kitti_world.drive_plan):
  * seeds 0/1/2 × 'city'   — cruise + stop (no-damage early return,
    GroundGrid.cpp:136-137) + REVERSE over mapped street (negative damage)
    + exact half-cell pose deltas (the half-away-from-zero index snap,
    AUDIT.md #1) + moving cars crossing cells between scans;
  * seeds 0/1/2 × 'forward' — pure cruise (clean operating-point readout);
  * seeds 3/4   × 'city' with rain — ring dropout + airborne clutter.

Each config runs as its own OS process on the CPU backend (the oracle is
pure Python and dominates; parallel configs make the wall time the slowest
single config). The launcher aggregates per-config deltas, pools the
confusion counts, and writes ACCURACY_r4.md with the pooled per-class
ground%% table printed next to the README's for eyeball comparison.

Usage:
  python scripts/kitti_campaign.py                 # full campaign
  python scripts/kitti_campaign.py --quick         # 10-scan smoke
  python scripts/kitti_campaign.py worker --seed 0 --variant city \
      --scans 160 --rain 0 --out /tmp/w.json       # one config (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

HEADLINE = ("precision", "recall", "f1", "accuracy", "ioug")

# /root/reference/README.md:59-94 (seq-00, 4540 scans)
REF_GROUND_PCT = {
    "road": 99.93, "parking": 99.55, "sidewalk": 99.09, "other-ground": 93.57,
    "lane-marking": 99.84, "terrain": 93.32, "car": 5.58, "building": 2.67,
    "fence": 11.09, "vegetation": 6.57, "trunk": 2.12, "pole": 1.86,
    "traffic-sign": 0.13, "other-structure": 10.08, "other-object": 10.41,
    "moving-car": 3.52, "outlier": 57.49, "unlabeled": 11.26,
}
REF_HEADLINE = {"precision": 96.05, "recall": 98.70, "f1": 97.35,
                "accuracy": 97.24, "ioug": 94.84}


def run_worker(seed: int, variant: str, scans: int, rain: float,
               out_path: str, wire: bool = False) -> None:
    """One campaign config: jitted pipeline vs golden oracle, lockstep.

    With ``wire=True`` (VERDICT r4 #3) the pipeline runs the s16 wire format
    (sorted_scans + wire_format) while golden stays on the exact f32 path, so
    the deltas bound the ~5 mm quantization loss in metric points at the
    KITTI operating point; each label flip's distance-to-threshold margin is
    measured on golden's layers and histogrammed (expected: flips live within
    the 5 mm quantization band of the tolerance threshold).
    """
    import dataclasses

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.kitti_world import kitti_sequence
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.driver import StreamingDriver

    cfg = GroundGridConfig()
    pipe_cfg = (dataclasses.replace(cfg, sorted_scans=True, wire_format=True)
                if wire else cfg)
    driver = StreamingDriver(pipe_cfg)
    golden = GoldenGroundGrid(cfg)
    margin_bins = [1e-4, 1e-3, 5e-3, 1e-2]  # metres (wire quanta: 1.95 mm
    # xy / 0.98 mm z at the default geometry -- pipeline.wire_scales)
    margin_hist = [0] * (len(margin_bins) + 1)
    h_thr = np.float32(cfg.miminum_point_height_threshold)
    h_obs = np.float32(cfg.minimum_point_height_obstacle_threshold)
    mdf5 = np.float32(cfg.minimum_distance_factor * 5.0)
    ev_pipe = Evaluator(f"kitti-{variant}-s{seed}")
    ev_gold = Evaluator(f"kitti-{variant}-s{seed}")

    mismatch = 0
    total = 0
    t0 = time.monotonic()
    for idx, (pts_velo, lbl, T) in enumerate(kitti_sequence(
        scans, seed=seed, variant=variant, rain_rate=rain,
        resolution=cfg.resolution,
    )):
        rec = ScanRecord(
            index=idx, timestamp=idx * 0.1,
            points=np.concatenate(
                [pts_velo, np.zeros((len(pts_velo), 1), np.float32)], axis=1
            ),
            labels=np.asarray(lbl, np.int32),
            t_map_velo=np.asarray(T, np.float64),
        )
        res = driver.process(rec)
        ev_pipe.add_cloud(res.labels, lbl)

        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        want = golden.filter_cloud(
            pts_map, lbl, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64)
        )
        ev_gold.add_cloud(want, lbl)

        got = np.asarray(res.labels)[: len(want)]
        mm = got != np.asarray(want)
        mismatch += int(mm.sum())
        total += len(want)
        if wire and mm.any():
            # flip-margin histogram on golden's layers (kitti_diag.py method)
            k = np.nonzero(mm)[0][:20000]
            rel0 = (golden.state.center[0] + cfg.half_length) - x[k].astype(np.float64)
            rel1 = (golden.state.center[1] + cfg.half_length) - y[k].astype(np.float64)
            gi = np.clip(np.floor(rel0 / cfg.resolution).astype(int),
                         0, cfg.cell_count - 1)
            gj = np.clip(np.floor(rel1 / cfg.resolution).astype(int),
                         0, cfg.cell_count - 1)
            var = golden.snapshots["detect_inputs"][1][gi, gj]
            dist = np.hypot(x[k] - mv[0, 3], y[k] - mv[1, 3])
            with np.errstate(divide="ignore"):
                tol = np.maximum(
                    np.minimum((mdf5 * dist) / var * h_thr, h_thr), h_obs)
            margin = np.abs(z[k] - (golden.state.ground[gi, gj] + tol))
            for m in margin:
                for b, edge in enumerate(margin_bins):
                    if m < edge:
                        margin_hist[b] += 1
                        break
                else:
                    margin_hist[-1] += 1
        if (idx + 1) % 20 == 0:
            print(f"[{variant}-s{seed}] {idx + 1}/{scans} "
                  f"mismatch {mismatch}/{total} "
                  f"({time.monotonic() - t0:.0f}s)", flush=True)

    mp = ev_pipe.compute().as_dict()
    mg = ev_gold.compute().as_dict()
    result = dict(
        seed=seed, variant=variant, scans=scans, rain=rain,
        total_points=total, wall_s=time.monotonic() - t0,
        pipeline=mp, golden=mg,
        delta_pt={k: (mp[k] - mg[k]) * 100.0 for k in HEADLINE},
        label_mismatch=mismatch,
        ev_pipe=ev_pipe.state_dict(), ev_gold=ev_gold.state_dict(),
    )
    if wire:
        result["wire"] = True
        result["margin_bins_m"] = margin_bins
        result["margin_hist"] = margin_hist
    result["max_abs_delta_pt"] = max(
        abs(v) for v in result["delta_pt"].values()
    )
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[{variant}-s{seed}] done: max|delta| "
          f"{result['max_abs_delta_pt']:.4f} pt, "
          f"mismatch {mismatch}/{total}", flush=True)


def campaign_matrix(quick: bool) -> list[dict]:
    if quick:
        return [
            dict(seed=0, variant="city", scans=10, rain=0.0),
            dict(seed=1, variant="forward", scans=10, rain=0.0),
        ]
    return [
        dict(seed=0, variant="city", scans=160, rain=0.0),
        dict(seed=1, variant="city", scans=160, rain=0.0),
        dict(seed=2, variant="city", scans=160, rain=0.0),
        dict(seed=0, variant="forward", scans=60, rain=0.0),
        dict(seed=1, variant="forward", scans=60, rain=0.0),
        dict(seed=2, variant="forward", scans=60, rain=0.0),
        dict(seed=3, variant="city", scans=80, rain=0.15),
        dict(seed=4, variant="city", scans=80, rain=0.25),
        # round-4 extension: one long city drive, a fourth cruise seed, and
        # a third rain level (between the 0.15/0.25 points above)
        dict(seed=5, variant="city", scans=200, rain=0.0),
        dict(seed=3, variant="forward", scans=60, rain=0.0),
        dict(seed=6, variant="city", scans=80, rain=0.2),
    ]


def aggregate(results: list[dict], out_md: str) -> dict:
    from groundgrid_tpu.data.labels import LABELS
    from groundgrid_tpu.eval.metrics import Evaluator

    def pool(rs, name):
        p = Evaluator(name)
        for r in rs:
            e = Evaluator("w")
            e.load_state_dict(r["ev_pipe"])
            p.nonground_count += e.nonground_count
            p.true_positive += e.true_positive
            p.false_positive += e.false_positive
            p.total += e.total
            p.clouds += e.clouds
        return p

    pooled = pool(results, "kitti-campaign-pooled")
    mp = pooled.compute().as_dict()
    # forward cruise = the clean operating-point proxy (the README table was
    # produced on a normal drive); city/rain add the adversarial content
    fwd = [r for r in results if r["variant"] == "forward" and not r["rain"]]
    mp_fwd = pool(fwd, "fwd").compute().as_dict() if fwd else None

    total_scans = sum(r["scans"] for r in results)
    total_points = sum(r["total_points"] for r in results)
    total_mismatch = sum(r["label_mismatch"] for r in results)
    max_delta = max(r["max_abs_delta_pt"] for r in results)
    wall = max(r["wall_s"] for r in results)

    lines = [
        "# Accuracy campaign at the KITTI operating point (round 4)",
        "",
        "Generated by `scripts/kitti_campaign.py`. Both engines (jitted "
        "pipeline, `groundgrid_tpu/pipeline.py`; sequential NumPy golden "
        "oracle, `groundgrid_tpu/golden.py`) consumed identical scans from "
        "the KITTI-operating-point urban world "
        "(`groundgrid_tpu/data/kitti_world.py`), scored with the reference "
        "scorer (`eval/metrics.py` == `eval_groundpoint_classifier.py:135-"
        "195`). The world's *scored* profile is tuned to the reference's "
        "published seq-00 table (`/root/reference/README.md:56-94`), so "
        "parity is measured in the reference's own threshold-crossing "
        "regime (~98-99 % recall), unlike the earlier adversarial world "
        "(71 % recall, ACCURACY_r3.md).",
        "",
        f"- campaign: {len(results)} configs, {total_scans} scans, "
        f"{total_points:,} scored points; wall {wall:.0f} s "
        "(parallel workers, oracle-dominated)",
        "- drive plans: city (cruise + stop/no-damage + reverse/negative "
        "damage + exact-half-cell snap steps + moving cars), forward "
        "cruise, and rain (ring dropout + airborne clutter)",
        "",
        "## Per-config pipeline-vs-golden deltas",
        "",
        "| config | scans | points | max |delta| (pt) | label mismatches |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        name = f"{r['variant']}-s{r['seed']}" + (
            f"-rain{r['rain']}" if r["rain"] else "")
        lines.append(
            f"| {name} | {r['scans']} | {r['total_points']:,} "
            f"| {r['max_abs_delta_pt']:.4f} | {r['label_mismatch']} |"
        )
    lines += [
        "",
        f"**Campaign max |delta| = {max_delta:.4f} pt** (bound: 0.1 pt; "
        "the 0.5 pt BASELINE budget is reserved for the racy-reference "
        "gap). Total per-point label disagreement: "
        f"{total_mismatch}/{total_points} "
        f"({total_mismatch / max(total_points, 1):.3%}).",
        "",
        "## Pooled headline metrics vs the reference's seq-00 table",
        "",
        "These are the PIPELINE's pooled scores on the synthetic world, "
        "next to the reference's published real-data numbers — an "
        "operating-point check, not a parity claim (different content). "
        "The forward-cruise column is the operating-point proxy (the "
        "README table comes from a normal drive); the all-configs column "
        "additionally pools the adversarial city segments (stop / reverse "
        "/ half-cell / movers) and rain, which intentionally depress the "
        "scores:",
        "",
        "| metric | forward cruise | all configs | reference seq-00 |",
        "|---|---|---|---|",
    ]
    for k in HEADLINE:
        f_col = f"{mp_fwd[k] * 100:.2f}%" if mp_fwd else "—"
        lines.append(f"| {k} | {f_col} | {mp[k] * 100:.2f}% "
                     f"| {REF_HEADLINE[k]:.2f}% |")
    lines += [
        "",
        "## Pooled per-class ground% vs README table",
        "",
        "| label | share% | ground% (pipeline) | ground% (ref seq-00) |",
        "|---|---|---|---|",
    ]
    total_all = int(pooled.total.sum())
    per_class = {}
    for lid in sorted(LABELS):
        tot = int(pooled.total[lid])
        if tot == 0:
            continue
        name = LABELS[lid]
        g_pct = 100.0 * (1.0 - pooled.nonground_count[lid] / tot)
        share = 100.0 * tot / total_all
        ref = REF_GROUND_PCT.get(name)
        per_class[name] = dict(share_pct=share, ground_pct=g_pct, ref=ref)
        lines.append(
            f"| {name} | {share:.2f} | {g_pct:.2f} "
            f"| {ref if ref is not None else '—'} |"
        )
    lines += [
        "",
        "Golden-oracle trust chain: the oracle is a NumPy transliteration "
        "of the reference's formulas (every step cites "
        "GroundSegmentation.cpp / GroundGrid.cpp), independently "
        "re-derived by `tests/golden_audit.py` and fuzzed across 55 "
        "configs (`CONFIG_FUZZ.md`). The remaining unprovable-here step — "
        "real SemanticKITTI seq 00 — has a one-command runbook "
        "(`RUNBOOK.md`: `groundgrid-tpu evaluate`).",
    ]
    body = "\n".join(lines) + "\n"
    with open(out_md, "w") as f:
        f.write(body)
    return dict(
        configs=len(results), scans=total_scans, points=total_points,
        max_abs_delta_pt=max_delta, mismatches=total_mismatch,
        pooled_headline={k: mp[k] * 100 for k in HEADLINE},
        forward_cruise_headline=(
            {k: mp_fwd[k] * 100 for k in HEADLINE} if mp_fwd else None),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", nargs="?", default="launch",
                    choices=["launch", "worker", "aggregate"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variant", default="city")
    ap.add_argument("--scans", type=int, default=160)
    ap.add_argument("--rain", type=float, default=0.0)
    ap.add_argument("--out", default="")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--jobs", type=int, default=0,
                    help="max parallel workers (0 = all configs at once)")
    ap.add_argument("--out-md", default=os.path.join(REPO, "ACCURACY_r4.md"))
    ap.add_argument("--wire", action="store_true",
                    help="pipeline runs the s16 wire format vs f32 golden "
                         "(VERDICT r4 #3); margins histogrammed")
    args = ap.parse_args()

    if args.mode == "worker":
        run_worker(args.seed, args.variant, args.scans, args.rain, args.out,
                   wire=args.wire)
        return

    if args.mode == "aggregate":
        # Rebuild the artifact from already-completed worker JSONs (e.g.
        # after re-running a subset of configs against fixed code).
        import glob

        results = []
        for path in sorted(glob.glob("/tmp/kitti_campaign/*.json")):
            with open(path) as f:
                results.append(json.load(f))
        results.sort(key=lambda r: (r["variant"], r["rain"], r["seed"]))
        summary = aggregate(results, args.out_md)
        print(json.dumps(summary, indent=2))
        return

    matrix = campaign_matrix(args.quick)
    # wire launches keep their own worker-JSON pool (the resumable-launch
    # reuse must never mix s16 and f32 results)
    tmpdir = "/tmp/kitti_campaign_wire" if args.wire else "/tmp/kitti_campaign"
    os.makedirs(tmpdir, exist_ok=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    jobs = args.jobs or len(matrix)
    procs: list[tuple[subprocess.Popen, dict, str]] = []
    pending = list(matrix)
    results = []
    t0 = time.monotonic()
    while pending or procs:
        while pending and len(procs) < jobs:
            c = pending.pop(0)
            out = os.path.join(
                tmpdir,
                f"{c['variant']}_s{c['seed']}_r{c['rain']}.json",
            )
            if os.path.exists(out):
                # resumable launch: a completed worker JSON from an earlier
                # (possibly interrupted) run is reused as-is; delete the
                # file to force a re-run after code changes.
                with open(out) as f:
                    results.append(json.load(f))
                print(f"reusing completed worker {c} -> {out}", flush=True)
                continue
            logf = open(out + ".log", "w")
            p = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "worker",
                 "--seed", str(c["seed"]), "--variant", c["variant"],
                 "--scans", str(c["scans"]), "--rain", str(c["rain"]),
                 "--out", out] + (["--wire"] if args.wire else []),
                env=env, stdout=logf, stderr=subprocess.STDOUT, cwd=REPO,
            )
            procs.append((p, c, out))
            print(f"launched {c} -> {out}", flush=True)
        time.sleep(5)
        still = []
        for p, c, out in procs:
            if p.poll() is None:
                still.append((p, c, out))
                continue
            if p.returncode != 0:
                print(f"WORKER FAILED rc={p.returncode}: {c} "
                      f"(log: {out}.log)", flush=True)
                sys.exit(1)
            with open(out) as f:
                results.append(json.load(f))
            print(f"finished {c} ({time.monotonic() - t0:.0f}s)", flush=True)
        procs = still

    results.sort(key=lambda r: (r["variant"], r["rain"], r["seed"]))
    summary = aggregate(results, args.out_md)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
