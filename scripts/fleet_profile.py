"""Fleet per-vehicle overhead profile (VERDICT r4 'Next round' #6).

batch=64 on one chip costs ~1.16 ms/scan device vs 0.815 ms streaming; this
script traces both on the real TPU and attributes the ~0.34 ms/vehicle gap:
the fleet step is one lax.map while-loop, so the analysis descends INTO the
loop body (stage_profile.collect_roots only looks at top-level roots) and
reports, per lax.map iteration (= per vehicle):

  * device-busy time by stage (same HLO-signature attribution as
    scripts/stage_profile.py),
  * the loop bubble: while-window wall minus device-busy -- dispatch gaps,
    dynamic-slice glue, and the scheduling barrier each iteration's
    dynamic-update-slice imposes,
  * the per-iteration dynamic-slice/dus glue ops themselves (the batched
    scan arrays are sliced per vehicle; the batched outputs are
    dynamic-update-sliced back), which the streaming path does not pay.

Usage: python scripts/fleet_profile.py [--batch 64] [--steps 4]
       [--unroll 2]    # ALSO profile a lax.scan(unroll=k) variant
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from stage_profile import stage_of  # noqa: E402


def all_tpu_events(xplane_path: str):
    """Every 'XLA Ops' event: (start_ns, end_ns, name, device_ps)."""
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
    return events


def analyze(xplane_path: str, config, n_steps: int, batch: int):
    events = all_tpu_events(xplane_path)
    # top-level roots (non-nested); find the big lax.map while windows
    roots, cur_end = [], -1
    for start, end, name, ps in events:
        if start >= cur_end:
            roots.append((start, end, name, ps))
            cur_end = end
    whiles = [r for r in roots if r[2].split(" = ")[0].startswith("%while")
              and (r[1] - r[0]) > 1e5]
    whiles.sort(key=lambda r: -(r[1] - r[0]))
    whiles = whiles[:n_steps]
    if not whiles:
        raise SystemExit("no lax.map while window found in trace")

    per_iter = 1.0 / (n_steps * batch) / 1e9  # ps -> ms, per vehicle
    groups: dict[str, float] = {}
    ops: dict[str, float] = {}
    busy_ps = 0
    wall_ns = 0
    outside_ps = sum(ps for s, e, n, ps in roots) - sum(ps for *_x, ps in whiles)
    for ws, we, _, wps in whiles:
        wall_ns += we - ws
        busy_ps += wps
        inner = [e for e in events if e[0] >= ws and e[1] <= we
                 and not (e[0] == ws and e[1] == we)]
        # nested events are themselves hierarchical (conditionals in the
        # raster path); keep only first-level children of the while
        cur = -1
        for s, e, name, ps in inner:
            if s >= cur:
                head = name.split(" = ")[0]
                stage = stage_of(name, [], config)
                if (head.startswith(("%dynamic-slice", "%dynamic_slice",
                                     "%dynamic-update-slice",
                                     "%dynamic_update_slice"))
                        or (head.startswith("%fusion") and "dynamic" in name)):
                    stage = "lax.map slice/dus glue"
                groups[stage] = groups.get(stage, 0.0) + ps
                ops[head] = ops.get(head, 0.0) + ps
                cur = e
    child_ps = sum(groups.values())
    print(f"\nlax.map window: {wall_ns / n_steps / batch / 1e6:.4f} ms/vehicle wall, "
          f"{busy_ps * per_iter:.4f} ms/vehicle while-root device-busy, "
          f"children sum {child_ps * per_iter:.4f} ms/vehicle, "
          f"outside-the-while roots {outside_ps / n_steps / 1e9:.4f} ms/step")
    print(f"bubble (wall - children busy): "
          f"{wall_ns / n_steps / batch / 1e6 - child_ps * per_iter:.4f} ms/vehicle")
    print("\n| stage | ms/vehicle | share |")
    print("|---|---|---|")
    for stage, ps in sorted(groups.items(), key=lambda kv: -kv[1]):
        ms = ps * per_iter
        print(f"| {stage} | {ms:.4f} | {ms / (child_ps * per_iter):.1%} |")
    print("\ntop ops inside the loop:")
    for head, ps in sorted(ops.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {ps * per_iter:8.5f} ms/vehicle  {head}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--res", type=float, default=0.33)
    ap.add_argument("--dim", type=float, default=120.0)
    ap.add_argument("--trace", default="")
    ap.add_argument("--fused", action="store_true",
                    help="fused_detect=True variant")
    args = ap.parse_args()

    import jax

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.parallel.sharding import (
        make_fleet_step, make_mesh, shard_fleet_pytree,
    )
    from groundgrid_tpu.pipeline import init_state
    from groundgrid_tpu.runtime.bench import _make_scans
    from groundgrid_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    config = GroundGridConfig(resolution=args.res, dimension=args.dim,
                              sorted_scans=(platform == "tpu"),
                              fused_detect=args.fused)
    print(f"platform={platform} grid={config.cell_count}^2 batch={args.batch}")

    if args.trace:
        tmp = args.trace
    else:
        n_distinct = 8
        scans, poses = _make_scans(config, n_distinct)
        b = args.batch
        mesh = make_mesh()
        fleet = make_fleet_step(config, mesh)
        per_vehicle = [init_state(config, poses[0].astype(np.float32))
                       for _ in range(b)]
        states = jax.tree.map(lambda *xs: np.stack(xs), *per_vehicle)
        batched = jax.tree.map(
            lambda *xs: np.stack(xs), *(scans[i % n_distinct] for i in range(b)))
        states = shard_fleet_pytree(states, mesh)
        batched = shard_fleet_pytree(batched, mesh)
        for _ in range(3):
            states, outs, summary = fleet(states, batched)
        _ = np.asarray(summary.ground_points)  # force completion
        tmp = tempfile.mkdtemp(prefix="ggfleet_")
        jax.profiler.start_trace(tmp)
        for _ in range(args.steps):
            states, outs, summary = fleet(states, batched)
        _ = np.asarray(summary.ground_points)
        jax.profiler.stop_trace()
        print(f"trace: {tmp}")

    paths = sorted(glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True))
    if not paths:
        raise SystemExit("no xplane captured")
    analyze(paths[-1], config, args.steps, args.batch)


if __name__ == "__main__":
    main()
