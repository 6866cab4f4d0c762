"""Throughput benchmark harness.

Measures steady-state scans/sec of the full per-scan pipeline on synthetic
HDL-64E-sized scans (~131k points). The north-star target (BASELINE.json) is
>= 1000 SemanticKITTI scans/sec/chip on TPU v5e; the reference publishes no
throughput numbers at all (accuracy only, SURVEY.md section 6), so
``vs_baseline`` is reported against that 1000 scans/s target.

Two modes:
  * streaming (batch=1): one ego vehicle, state-dependent sequential steps --
    the honest latency-bound number.
  * fleet (batch=B): B independent vehicles vmapped (and sharded over chips
    when more than one is visible), amortizing per-step overheads -- the
    throughput-bound number (BASELINE.json config 5).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _device_ms_per_step(step, state, scans, n_distinct: int, iters: int = 8) -> float:
    """On-device ms per step from an xplane trace (host/tunnel excluded).

    The trace must window FORWARD streaming only: the caller's state sits at
    the END of the scan cycle, so jumping back to ``scans[0]`` teleports the
    grid backwards ~n_distinct*1.2 m -- a damage band that floods the
    outlier-candidate buffer and storm-prices 1-in-iters of the traced
    steps. Two untraced re-warm steps put the state back on the forward
    path, then the traced steps stay within the cycle (no wrap).
    """
    import tempfile

    import jax

    from groundgrid_tpu.utils.profiling import jit_device_ms

    warm = min(2, n_distinct)
    for i in range(warm):  # re-enter the forward path (not traced)
        state, out = step(state, scans[i])
    _ = np.asarray(out.labels)
    iters = min(iters, n_distinct - warm) or 1

    tmp = tempfile.mkdtemp(prefix="ggbench_trace_")
    jax.profiler.start_trace(tmp)
    out = None
    for i in range(iters):
        state, out = step(state, scans[warm + i])
    _ = np.asarray(out.labels)  # force completion inside the trace window
    jax.profiler.stop_trace()

    ms = jit_device_ms(tmp, iters)
    if not np.isfinite(ms):
        raise RuntimeError("no jit_* device events captured")
    return ms


def _make_scans(config, n_distinct: int, n_beams=64, n_azimuth=2048, seed=0):
    """Pre-render a few distinct synthetic scans + consecutive poses.

    In ``config.sorted_scans`` mode this performs the host-side preparation a
    production loader does in its prefetch threads (map-frame transform +
    cell sort against the host-tracked center, see pipeline.prepare_scan).
    """
    from groundgrid_tpu.data.synthetic import make_scene, render_scan, vehicle_pose
    from groundgrid_tpu.pipeline import CenterTracker, pad_scan, prepare_scan

    scene = make_scene(seed, extent=min(200.0, 2 * config.dimension))
    scans = []
    poses = []
    tracker = None
    for k in range(n_distinct):
        T = vehicle_pose(scene, k, step_m=1.2)
        pts, lbl = render_scan(scene, T, n_beams=n_beams, n_azimuth=n_azimuth, seed=seed + k)
        if config.sorted_scans:
            pos = T[:2, 3].astype(np.float32)
            if tracker is None:
                tracker = CenterTracker(config, pos)
            scan, _ = prepare_scan(config, pts, lbl, T, tracker.update(pos))
            scans.append(scan)
        else:
            scans.append(pad_scan(config, pts, lbl, T))
        poses.append(T)
    return scans, poses


def run_benchmark(
    n_scans: int = 64,
    batch: int = 1,
    resolution: float = 0.33,
    dimension: float = 120.0,
    warmup: int = 3,
    n_beams: int = 64,
    n_azimuth: int = 2048,
    max_points: int = 131072,
) -> dict:
    import jax

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.pipeline import init_state, make_step
    from groundgrid_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    platform = jax.devices()[0].platform
    # host-prepared sorted scans (scatter-free Pallas rasterizer); the fleet
    # path batches with lax.map per chip (parallel/sharding.py)
    config = GroundGridConfig(
        resolution=resolution,
        dimension=dimension,
        max_points=max_points,
        sorted_scans=(platform == "tpu"),
    )
    _log(f"bench: platform={platform} grid={config.cell_count}^2 batch={batch} "
         f"sorted={config.sorted_scans}")

    # Streaming needs enough DISTINCT consecutive scans that cycling back to
    # scan 0 (a ~n_distinct*1.2 m backward teleport of the grid) is rare: the
    # teleport's damage band floods the outlier-candidate buffer with
    # below-plane points, and with the honest 8192-candidate cap those
    # storms now march at full width instead of being shed (round-3 fix) --
    # 8 distinct scans made 1-in-8 steps storm-priced and understated
    # steady-state throughput by ~30%. 32 keeps host prep cheap while the
    # storm fraction stays ~3% of the wall loop (and outside the traced
    # device-time window, which measures warm forward streaming).
    n_distinct = min(32 if batch == 1 else 8, max(4, n_scans))
    scans, poses = _make_scans(config, n_distinct, n_beams, n_azimuth)
    n_points = int(np.asarray(scans[0].valid).sum())
    _log(f"bench: {n_points} valid points/scan, {n_distinct} distinct scans")

    if batch == 1:
        scans = [jax.device_put(s) for s in scans]
        state = init_state(config, poses[0].astype(np.float32))
        if platform == "tpu":
            # probe + re-roll de-optimized executables from the shared
            # compile service (pipeline.compile_step_verified) -- a fresh
            # environment would otherwise have a ~50% chance of benchmarking
            # a serialized binary
            from groundgrid_tpu.pipeline import compile_step_verified

            step, probe_ms = compile_step_verified(config, state, scans[0])
            _log(f"bench: verified executable ({probe_ms:.2f} ms/step probe)")
            state = init_state(config, poses[0].astype(np.float32))
        else:
            step = make_step(config)
        for i in range(warmup):
            state, out = step(state, scans[i % n_distinct])
        # Force real completion: on the axon runtime, block_until_ready
        # returns before deferred work executes; a D2H read both drains the
        # queue and switches dispatch to synchronous (honest) mode.
        _ = np.asarray(out.labels)

        t0 = time.perf_counter()
        for i in range(n_scans):
            state, out = step(state, scans[i % n_distinct])
        _ = np.asarray(out.labels)
        elapsed = time.perf_counter() - t0
        wall_ms = elapsed / n_scans * 1000.0

        # device-time measurement (chip capability, minus host/tunnel RTT)
        device_ms = _device_ms_per_step(step, state, scans, n_distinct) if platform == "tpu" else wall_ms
        per_chip = 1000.0 / device_ms
        total = per_chip
        n_chips = 1
        _log(f"bench: wall {wall_ms:.2f} ms/scan (incl. host dispatch), device {device_ms:.2f} ms/scan")
    else:
        from groundgrid_tpu.parallel.sharding import (
            make_fleet_step, make_mesh, shard_fleet_pytree,
        )

        n_chips = len(jax.devices())
        b = max(batch, n_chips)
        b -= b % n_chips
        mesh = make_mesh()
        fleet = make_fleet_step(config, mesh)
        # host loop + stack, NOT vmap(init_state): init_state seeds the ds
        # grid center from the f64 pose on the HOST (the half-cell snap-tie
        # fix ships the f64 center in every mode), so it cannot trace
        per_vehicle = [init_state(config, poses[0].astype(np.float32))
                       for _ in range(b)]
        states = jax.tree.map(lambda *xs: np.stack(xs), *per_vehicle)
        batched = jax.tree.map(
            lambda *xs: np.stack(xs), *(scans[i % n_distinct] for i in range(b))
        )
        states = shard_fleet_pytree(states, mesh)
        batched = shard_fleet_pytree(batched, mesh)
        for _ in range(warmup):
            states, outs, summary = fleet(states, batched)
        _ = np.asarray(summary.ground_points)  # force completion (see above)
        steps = max(1, n_scans // b)
        t0 = time.perf_counter()
        for _ in range(steps):
            states, outs, summary = fleet(states, batched)
        _ = np.asarray(summary.ground_points)
        elapsed = time.perf_counter() - t0
        total = steps * b / elapsed
        per_chip = total / n_chips
        wall_ms = elapsed / max(1, steps * b) * 1000.0
        device_ms = 1000.0 / per_chip

    _log(f"bench: {per_chip:.1f} scans/s/chip ({total:.1f} total, {n_chips} chips)")
    return {
        "metric": "synthetic_hdl64_scans_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "scans/s/chip",
        "vs_baseline": round(per_chip / 1000.0, 4),
        "extra": {
            "platform": platform,
            "batch": batch,
            "n_chips": n_chips,
            "grid_cells": config.cell_count,
            "points_per_scan": n_points,
            "total_scans_per_sec": round(total, 2),
            "device_ms_per_scan": round(device_ms, 3),
            "wall_ms_per_scan": round(wall_ms, 3),
            "methodology": (
                "value = on-device executable time per scan from an xplane "
                "trace (forced-completion); wall_ms_per_scan additionally "
                "includes this dev environment's host->TPU tunnel RTT "
                "(~35 ms/dispatch), which dominates wall time here but is "
                "absent on locally-attached production TPUs"
            ),
        },
    }
