"""Per-stage on-device time breakdown (VERDICT r3 'Next round' #7).

Traces warm forward-streaming steps on the real TPU and aggregates the
xplane 'XLA Ops' timeline into the reference's stage vocabulary (insertion /
detection / interpolation / classification, GroundSegmentation.cpp:120-194).

Methodology notes (what makes the numbers honest):
  * per-op cost is the stat ``device_duration_ps`` — the actual device-busy
    time. The event's wall ``duration_ns`` is wrong for async copies (a
    ``copy-start`` spans its whole async window, ~0.5 ms, while the device
    is busy ~2.5 us).
  * the ops line is HIERARCHICAL: a ``conditional``/``while`` event contains
    its branch/body events. Only top-level (non-nested) events are summed,
    so nothing is double-counted; nested custom-calls are used as
    attribution hints for their parent (e.g. the conditional that contains
    the bf16 one-hot matmul IS the rasterizer).
  * attribution is by HLO signature (the kernels keep no Python names):
    bf16 operands => raster MXU kernel; square f32 operands >= the padded
    grid => spiral kernel; s32[128]+s32[1024,128] gathers => sorted-lookup;
    the while loop carrying the s32[max_outlier_candidates] buffer => march.

Usage: python scripts/stage_profile.py [--res 0.33 --dim 120] [--steps 8]
       [--raw]   # print ungrouped top-level ops instead
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def trace_steps(config, n_steps: int = 8):
    """Compile the step, stream warm scans, trace n_steps; returns trace dir."""
    import jax

    from groundgrid_tpu.pipeline import compile_step_verified, init_state
    from groundgrid_tpu.runtime.bench import _make_scans

    n_distinct = max(4, n_steps + 2)
    scans, poses = _make_scans(config, n_distinct)
    scans = [jax.device_put(s) for s in scans]
    state = init_state(config, poses[0].astype(np.float32))
    step, probe_ms = compile_step_verified(config, state, scans[0])
    print(f"compiled: {probe_ms:.2f} ms/step probe", flush=True)
    state = init_state(config, poses[0].astype(np.float32))
    for i in range(2):  # warm forward path
        state, out = step(state, scans[i])
    _ = np.asarray(out.labels)

    tmp = tempfile.mkdtemp(prefix="ggstage_")
    jax.profiler.start_trace(tmp)
    for i in range(n_steps):
        state, out = step(state, scans[2 + i])
    _ = np.asarray(out.labels)
    jax.profiler.stop_trace()
    return tmp


def collect_roots(xplane_path: str):
    """Top-level 'XLA Ops' events with device-busy ps and nested-name hints."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(xplane_path)
    events = []
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                stats = dict(ev.stats)
                events.append((ev.start_ns, ev.end_ns, ev.name,
                               stats.get("device_duration_ps", 0)))
    events.sort(key=lambda e: (e[0], -e[1]))
    roots = []  # (name, ps, [nested names])
    cur_end = -1
    for start, end, name, ps in events:
        if start >= cur_end:
            roots.append([name, ps, []])
            cur_end = end
        else:
            roots[-1][2].append(name)
    return roots


def stage_of(name: str, nested: list, config) -> str:
    """Attribute one top-level op (see module docstring for the rules)."""
    sig = name + " " + " ".join(nested)
    head = name.split(" = ")[0]
    if head.startswith("%while") and re.search(
            rf"s32\[{config.max_outlier_candidates}\]", name):
        return "outlier march (budgeted while + in-loop gathers)"
    is_cc = 'custom_call_target="tpu_custom_call"' in sig
    if "bf16[" in sig and is_cc:
        return "rasterize (Pallas one-hot MXU)"
    if is_cc:
        pad = -config.cell_count % 128
        n = config.cell_count + (pad if pad else 0)
        if re.search(rf"f32\[{n},{n}\]", sig) or re.search(
                rf"f32\[\d+,{n}\]\{{.*custom-call", name):
            return "spiral (Pallas quad-sweep)"
        if re.search(r"s32\[128\]", name):
            return "march gather (Pallas sorted-lookup)"
        return "other Pallas kernel"
    if head.startswith("%sort"):
        return "cell-id sort + compaction sorts"
    if head.startswith(("%cond", "%conditional", "%branch")):
        return "ingest conditionals (sorted/fallback raster paths)"
    if head.startswith("%copy"):
        return "async copies (device-busy part)"
    if head.startswith("%while"):
        return "other loops"
    return "grid-stage fusions (detect/classify/move/glue)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=float, default=0.33)
    ap.add_argument("--dim", type=float, default=120.0)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--raw", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace", default="",
                    help="reuse an existing trace dir instead of running")
    ap.add_argument("--fused", action="store_true",
                    help="fused_detect=True (ops/pallas_detect.py stencil)")
    args = ap.parse_args()

    import jax

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    config = GroundGridConfig(resolution=args.res, dimension=args.dim,
                              sorted_scans=(platform == "tpu"),
                              fused_detect=args.fused)
    print(f"platform={platform} grid={config.cell_count}^2"
          f"{' fused_detect' if args.fused else ''}", flush=True)
    tmp = args.trace or trace_steps(config, args.steps)
    paths = sorted(glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit("no xplane captured")
    roots = collect_roots(paths[-1])
    per_step = 1.0 / args.steps / 1e9  # ps -> ms, per step

    if args.raw:
        agg: dict[str, float] = {}
        for name, ps, _ in roots:
            head = name.split(" = ")[0]
            agg[head] = agg.get(head, 0.0) + ps
        for head, ps in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"{ps * per_step:9.5f} ms/step  {head}")
        return

    groups: dict[str, float] = {}
    examples: dict[str, dict] = {}
    for name, ps, nested in roots:
        stage = stage_of(name, nested, config)
        groups[stage] = groups.get(stage, 0.0) + ps
        ex = examples.setdefault(stage, {})
        head = name.split(" = ")[0]
        ex[head] = ex.get(head, 0.0) + ps
    total_ms = sum(groups.values()) * per_step
    print(f"\n| stage | ms/step | share |   ({config.cell_count}^2 @ "
          f"{args.res} m, {args.steps} traced steps, total "
          f"{total_ms:.3f} ms/step)")
    print("|---|---|---|")
    for stage, ps in sorted(groups.items(), key=lambda kv: -kv[1]):
        ms = ps * per_step
        print(f"| {stage} | {ms:.4f} | {ms / total_ms:.1%} |")
    print("\ntop ops per stage:")
    for stage, ex in sorted(examples.items(),
                            key=lambda kv: -sum(kv[1].values())):
        for head, ps in sorted(ex.items(), key=lambda kv: -kv[1])[:3]:
            print(f"  [{stage}] {ps * per_step:8.5f} ms  {head}")


if __name__ == "__main__":
    main()
