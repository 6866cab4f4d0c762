"""Metric-level accuracy benchmark: TPU pipeline vs the golden oracle.

The acceptance currency of the reference is its seq-00 metric table
(``/root/reference/README.md:56-94``, produced by
``launch/KITTIEvaluate.launch``): F1 97.35 / IoUg 94.84. With no
SemanticKITTI dataset in this environment, the strongest available evidence
is *delta-level*: run an adversarial synthetic sequence through BOTH the
jitted pipeline and the sequential NumPy golden oracle, score each with the
exact reference scorer (``eval/metrics.py``), and bound |ΔF1| and |ΔIoUg|.
The 0.5 pt acceptance budget (BASELINE.md) is reserved for the racy-reference
gap (the C++ races its accumulators across threads, SURVEY.md §7); the
deterministic-pipeline-vs-deterministic-oracle delta must stay within 0.1 pt.

Used by ``groundgrid-tpu accuracy`` (writes the ACCURACY.md artifact) and by
``tests/test_accuracy.py`` (asserts the bound in CI geometry).
"""

from __future__ import annotations

import time

import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.eval.metrics import Evaluator

HEADLINE = ("precision", "recall", "f1", "accuracy", "ioug")


def run_accuracy_benchmark(
    config: GroundGridConfig,
    n_scans: int = 120,
    seed: int = 17,
    n_beams: int = 64,
    n_azimuth: int = 1800,
    step_m: float = 1.2,
    adversarial: bool = True,
    progress=None,
    chaos_control: bool = False,
) -> dict:
    """Run the TPU pipeline and the golden oracle over the same sequence.

    Returns a dict with per-engine headline metrics, their deltas (in
    percentage points), the per-scan label disagreement rate, and workload
    stats. ``progress`` (optional callable) receives one line per scan.

    ``chaos_control``: additionally run the golden oracle on the SAME scans
    with the points fed in a PERMUTED order and report its metric deltas vs
    scan-order golden. Per-cell accumulation order is exactly what the
    reference's racing insert threads scramble run to run
    (GroundSegmentation.cpp:200-310, unsynchronized writes from 8 threads),
    and the sequential-Welford reassociation noise it creates is the same
    class that separates ANY parallel reduction from scan-order golden. The
    detect stage thresholds the resulting variance
    (GroundSegmentation.cpp:369-382) and feeds state back scan over scan,
    so this noise amplifies into metric shifts on adversarial content. The
    control measures that intrinsic envelope: a pipeline-vs-golden delta
    within (or near) it is indistinguishable from the reference's own
    run-to-run nondeterminism. (A weaker 1-ulp z-perturbation control was
    tried first and measures 0.0000 pt -- same-code-path rounding absorbs
    it -- which is why the order permutation is the faithful model.)
    """
    from groundgrid_tpu.data.synthetic import (
        adversarial_sequence, synthetic_sequence,
    )
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.driver import StreamingDriver
    from groundgrid_tpu.data.semantickitti import ScanRecord

    gen = adversarial_sequence if adversarial else synthetic_sequence
    driver = StreamingDriver(config)
    golden = GoldenGroundGrid(config)
    ev_pipe = Evaluator("accuracy")
    ev_gold = Evaluator("accuracy")
    golden_p = GoldenGroundGrid(config) if chaos_control else None
    ev_gold_p = Evaluator("accuracy") if chaos_control else None

    total_pts = 0
    label_mismatch = 0
    label_total = 0
    t0 = time.monotonic()
    for idx, (pts_velo, lbl, T) in enumerate(
        gen(n_scans, seed=seed, n_beams=n_beams, n_azimuth=n_azimuth,
            step_m=step_m)
    ):
        rec = ScanRecord(
            index=idx, timestamp=float(idx) * 0.1,
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

        if golden_p is not None:
            # feed the same points in permuted order: the reference's racing
            # insert threads scramble per-cell accumulation order exactly
            # like this (scoring is order-invariant, no unpermute needed)
            perm = np.random.default_rng(10_000 + idx).permutation(len(pts_map))
            golden_p.update_odom(
                np.asarray(T, np.float64), np.asarray(bm, np.float64)
            )
            want_p = golden_p.filter_cloud(
                pts_map[perm], np.asarray(lbl)[perm],
                np.asarray(mv[:3, 3]), np.asarray(mb, np.float64),
            )
            ev_gold_p.add_cloud(want_p, np.asarray(lbl)[perm])

        got = np.asarray(res.labels)[: len(want)]
        label_mismatch += int((got != np.asarray(want)).sum())
        label_total += len(want)
        total_pts += len(want)
        if progress is not None:
            progress(
                f"scan {idx + 1}/{n_scans}: {len(want)} pts, "
                f"cumulative label mismatch "
                f"{label_mismatch}/{label_total}"
            )

    mp = ev_pipe.compute().as_dict()
    mg = ev_gold.compute().as_dict()
    deltas = {k: (mp[k] - mg[k]) * 100.0 for k in HEADLINE}
    control = {}
    if golden_p is not None:
        mgp = ev_gold_p.compute().as_dict()
        env = {k: (mgp[k] - mg[k]) * 100.0 for k in HEADLINE}
        control = dict(
            golden_perturbed=mgp,
            chaos_envelope_pt=env,
            max_abs_chaos_envelope_pt=max(abs(v) for v in env.values()),
        )
    return dict(
        **control,
        workload=dict(
            n_scans=n_scans, seed=seed, n_beams=n_beams, n_azimuth=n_azimuth,
            step_m=step_m, adversarial=adversarial,
            dimension=config.dimension, resolution=config.resolution,
            cells=config.cell_count, total_points=total_pts,
            wall_s=time.monotonic() - t0,
            backend=_backend(),
        ),
        pipeline=mp,
        golden=mg,
        delta_pt=deltas,
        max_abs_delta_pt=max(abs(v) for v in deltas.values()),
        label_mismatch_rate=label_mismatch / max(label_total, 1),
    )


def _backend() -> str:
    import jax

    return jax.default_backend()


def format_accuracy_report(result: dict) -> str:
    """Human-readable ACCURACY.md body for a benchmark result."""
    w = result["workload"]
    lines = [
        "# Accuracy evidence: pipeline vs golden oracle (metric deltas)",
        "",
        "Generated by `groundgrid-tpu accuracy` "
        "(`groundgrid_tpu/eval/accuracy.py`). Both engines consumed the "
        "identical adversarial synthetic sequence; both outputs were scored "
        "with the reference scorer logic (`eval/metrics.py`, verified "
        "against `eval_groundpoint_classifier.py:135-195`).",
        "",
        f"- workload: {w['n_scans']} scans x ~{w['total_points'] // max(w['n_scans'], 1)}"
        f" pts (seed {w['seed']}, {w['n_beams']} beams x {w['n_azimuth']} azimuth,"
        f" step {w['step_m']} m, adversarial={w['adversarial']})",
        f"- geometry: {w['dimension']} m / {w['resolution']} m => "
        f"{w['cells']}x{w['cells']} cells",
        f"- pipeline backend: {w['backend']}; wall {w['wall_s']:.0f} s "
        "(dominated by the pure-Python oracle)",
        "",
        "| metric | pipeline | golden | delta (pt) |",
        "|---|---|---|---|",
    ]
    for k in HEADLINE:
        lines.append(
            f"| {k} | {result['pipeline'][k] * 100:.4f}% "
            f"| {result['golden'][k] * 100:.4f}% "
            f"| {result['delta_pt'][k]:+.4f} |"
        )
    lines += [
        "",
        f"Max |delta| = **{result['max_abs_delta_pt']:.4f} pt** "
        "(acceptance bound: 0.1 pt out of the 0.5 pt budget, the rest "
        "reserved for the racy-reference gap, SURVEY.md §7).",
        f"Raw per-point label disagreement: "
        f"{result['label_mismatch_rate']:.3%}.",
    ]
    if "chaos_envelope_pt" in result:
        env = result["chaos_envelope_pt"]
        lines += [
            "",
            "**Chaos control** (golden vs golden with the points fed in a "
            "permuted order -- the accumulation-order scrambling the "
            "reference's racing insert threads produce run to run, "
            "GroundSegmentation.cpp:200-310 -- measuring the scene's "
            "intrinsic sensitivity):",
            "",
            "| metric | golden-vs-perturbed delta (pt) |",
            "|---|---|",
            *[f"| {k} | {env[k]:+.4f} |" for k in HEADLINE],
            "",
            f"Max |envelope| = {result['max_abs_chaos_envelope_pt']:.4f} pt. "
            "A pipeline-vs-golden delta at or below this envelope is "
            "indistinguishable from the reference's own run-to-run "
            "nondeterminism on this content.",
        ]
    lines += [
        "",
        "The adversarial world contains steep grades, retaining walls, "
        "bridge decks, porous vegetation, sub-surface mirror reflections "
        "(exercising the occlusion ray-march, GroundSegmentation.cpp:242-275) "
        "and 6-DoF pitched/rolled odometry (exercising the damage-fill "
        "base-plane math, GroundGrid.cpp:121-133).",
    ]
    return "\n".join(lines) + "\n"
