"""End-to-end streaming throughput measurement (VERDICT r3 'Next round' #3).

Publishes the two numbers that bound production throughput, which the
headline BENCH (on-device executable time) deliberately excludes:

  (a) **native host prep rate** — scans/s the C++ prefetch loader
      (native/loader.cpp) sustains doing the full per-scan host work alone
      (file read, label unpack, f64-faithful map-frame transform + ds cell
      binning, stable cell sort of ~131k points), measured per thread count
      in both sorted-f32 and s16-wire modes, with no device in the loop;
  (b) **sustained end-to-end streaming rate** — scans/s of
      `StreamingDriver.run(..., pipeline_depth=d)` fed by the native
      sorted loader on the real TPU, per pipeline depth.

The claim under test: with pipelining, streaming is device-rate-bound (not
host-bound) once prep threads ≥ device_rate / per-thread-prep-rate. On this
1-core dev box thread scaling cannot be demonstrated (os.cpu_count()==1);
the per-thread rate is the honest scaling unit and is reported as such.

Dataset: synthetic HDL-64E-sized scans written in SemanticKITTI layout
(`data/semantickitti.write_sequence`) to tmpfs, so loader file I/O is
exercised (read path identical to real KITTI; content synthetic).

Usage:
  python scripts/throughput_e2e.py [--out THROUGHPUT_r4.json]
      [--scans 192] [--distinct 12] [--skip-e2e]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def build_dataset(root: str, n_scans: int, n_distinct: int) -> str:
    """Render n_distinct synthetic scans, tile to n_scans forward poses.

    Velodyne-frame content is approximately pose-invariant for a ground
    vehicle, so tiling content c[k % D] under a continuing forward pose
    track is a periodic world — realistic workload shape (~131k pts/scan,
    full accumulator/march/spiral activity) without paying D==N render cost
    on this 1-core box.
    """
    from groundgrid_tpu.data.semantickitti import write_sequence
    from groundgrid_tpu.data.synthetic import make_scene, render_scan, vehicle_pose

    scene = make_scene(3, extent=240.0)
    contents = []
    poses = []
    for k in range(n_scans):
        T = vehicle_pose(scene, k, step_m=1.2)
        poses.append(T)
        if k < n_distinct:
            pts, lbl = render_scan(scene, T, n_beams=64, n_azimuth=2048,
                                   seed=100 + k)
            contents.append((pts, lbl))

    def gen():
        for k in range(n_scans):
            pts, lbl = contents[k % n_distinct]
            yield pts, lbl, poses[k]

    return write_sequence(root, 0, gen())


def prep_rate(ds, config, n_threads: int, mode: str, n_scans: int) -> dict:
    """Drain the native loader's prep queue with no device work at all."""
    from groundgrid_tpu.data.native_loader import (
        SortedPrefetchingLoader, WirePrefetchingLoader,
    )

    if mode == "wire":
        import dataclasses

        config = dataclasses.replace(config, wire_format=True)
        loader = WirePrefetchingLoader(ds, config, n_threads=n_threads)
        bufs = (loader._qx, loader._qy, loader._qz, loader._lab, loader._order)
        next_fn = loader._lib.gg_loader_next_wire
    else:
        loader = SortedPrefetchingLoader(ds, config, n_threads=n_threads)
        bufs = (loader._px, loader._py, loader._pz, loader._lab, loader._order)
        next_fn = loader._lib.gg_loader_next_sorted
    if not loader.native:
        raise RuntimeError("native loader unavailable")
    count = ctypes.c_int32(0)
    ptrs = [b.ctypes.data_as(ctypes.POINTER(
        ctypes.c_float if b.dtype == np.float32
        else ctypes.c_int16 if b.dtype == np.int16 else ctypes.c_int32))
        for b in bufs]

    def drain(n):
        got = 0
        while got < n:
            idx = next_fn(loader._handle, *ptrs, ctypes.byref(count))
            if idx < 0:
                break
            got += 1
        return got

    warm = min(8, n_scans // 4)
    drain(warm)
    t0 = time.perf_counter()
    got = drain(n_scans - warm)
    dt = time.perf_counter() - t0
    loader.close()
    return dict(mode=mode, threads=n_threads, scans=got,
                scans_per_sec=round(got / dt, 2),
                ms_per_scan=round(dt / max(got, 1) * 1000.0, 3))


def e2e_rate(ds, config, pipeline_depth: int, n_threads: int = 2) -> dict:
    """Sustained streaming scans/s: native sorted loader -> pipelined driver.

    This is the host-consumer mode: every scan's labels/outliers cross
    device->host. On the tunneled dev TPU that transfer bounds the rate (see
    tunnel_profile); on locally-attached hardware it is PCIe-negligible.
    """
    from groundgrid_tpu.data.native_loader import SortedPrefetchingLoader
    from groundgrid_tpu.runtime.driver import StreamingDriver

    loader = SortedPrefetchingLoader(ds, config, n_threads=n_threads)
    native = loader.native
    driver = StreamingDriver(config)
    n = len(ds)
    warm = min(12, n // 4)
    done = 0
    t0 = None
    for res in driver.run(iter(loader), pipeline_depth=pipeline_depth):
        done += 1
        if done == warm:
            t0 = time.perf_counter()
    elapsed = time.perf_counter() - t0
    loader.close()
    timed = done - warm
    return dict(pipeline_depth=pipeline_depth, loader_threads=n_threads,
                native_loader=native, scans=timed,
                scans_per_sec=round(timed / elapsed, 2),
                wall_ms_per_scan=round(elapsed / timed * 1000.0, 3))


def e2e_device_consumer(ds, config, n_threads: int = 2) -> dict:
    """Sustained streaming with a device-resident consumer (on-device eval).

    The evaluate pipeline's production shape (`--on-device-eval`): scans
    stream up, the confusion table accumulates on device, nothing per-scan
    comes back. Isolates the upload+step path from D2H label traffic.
    """
    from groundgrid_tpu.data.native_loader import SortedPrefetchingLoader
    from groundgrid_tpu.runtime.evaluate import evaluate_records

    loader = SortedPrefetchingLoader(ds, config, n_threads=n_threads)
    native = loader.native
    ev, stats = evaluate_records(config, iter(loader), progress_every=0)
    loader.close()
    return dict(mode="device_consumer", loader_threads=n_threads,
                native_loader=native, scans=stats.scans,
                scans_per_sec=round(stats.scans_per_sec, 2),
                wall_ms_per_scan=round(stats.avg_ms, 3),
                clouds_scored=int(ev.clouds))


def tunnel_profile() -> dict:
    """Measure the host<->device link (RTT + bandwidth both ways).

    On this dev box the TPU is reached through a tunnel; these numbers are
    what make the e2e wall rates interpretable (each scan uploads ~2 MB of
    sorted points and the host-consumer mode fetches ~1 MB back).
    """
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    # RTT: scalar round trip (device_put + device_get), warm
    s = np.float32(1.0)
    for _ in range(3):
        _ = np.asarray(jax.device_get(jax.device_put(s, dev)))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        _ = np.asarray(jax.device_get(jax.device_put(s, dev)))
    rtt_ms = (time.perf_counter() - t0) / reps * 1000.0 / 2.0

    mb = 16
    big = np.zeros(mb * 1024 * 1024 // 4, np.float32)
    d = jax.device_put(big, dev)
    d.block_until_ready()  # warm path + allocation
    t0 = time.perf_counter()
    d = jax.device_put(big, dev)
    d.block_until_ready()
    h2d = mb / (time.perf_counter() - t0)
    # D2H must fetch a device-COMPUTED array: device_get of an array that
    # was uploaded (or fetched before) returns the runtime's cached host
    # copy with no transfer at all
    add_one = jax.jit(lambda a: a + 1.0)
    e = add_one(d)
    e.block_until_ready()
    t0 = time.perf_counter()
    _ = np.asarray(jax.device_get(e))
    d2h = mb / (time.perf_counter() - t0)
    return dict(rtt_ms=round(rtt_ms, 2), h2d_mb_s=round(h2d, 1),
                d2h_mb_s=round(d2h, 1), probe_mb=mb)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "THROUGHPUT_r4.json"))
    ap.add_argument("--scans", type=int, default=192)
    ap.add_argument("--distinct", type=int, default=12)
    ap.add_argument("--skip-e2e", action="store_true")
    ap.add_argument("--keep-dataset", default="")
    args = ap.parse_args()

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.data.semantickitti import SemanticKITTI

    root = args.keep_dataset or "/dev/shm/gg_e2e_ds"
    seqdir = os.path.join(root, "sequences", "00")
    if not os.path.isdir(seqdir):
        print(f"rendering {args.distinct} scans, tiling to {args.scans} "
              f"-> {root}", flush=True)
        shutil.rmtree(root, ignore_errors=True)
        t0 = time.perf_counter()
        build_dataset(root, args.scans, args.distinct)
        print(f"dataset built in {time.perf_counter() - t0:.0f}s", flush=True)
    ds = SemanticKITTI(root, 0)
    config = GroundGridConfig(sorted_scans=True)

    result = dict(
        host=dict(cores=os.cpu_count()),
        workload=dict(scans=len(ds), points_per_scan=131072,
                      grid_cells=config.cell_count),
        prep=[], e2e=[],
    )
    # one discarded pass: first-touch page faults + CPU governor ramp cost
    # the first measured config ~2.5x otherwise (138 vs 370 scans/s observed)
    prep_rate(ds, config, 1, "sorted", min(len(ds), 64))
    for mode in ("sorted", "wire"):
        for t in (1, 2, 4):
            r = prep_rate(ds, config, t, mode, len(ds))
            print("prep:", r, flush=True)
            result["prep"].append(r)

    if not args.skip_e2e:
        import jax

        result["platform"] = jax.devices()[0].platform
        result["tunnel"] = tunnel_profile()
        print("tunnel:", result["tunnel"], flush=True)
        for depth in (0, 2, 6):
            r = e2e_rate(ds, config, depth)
            print("e2e:", r, flush=True)
            result["e2e"].append(r)
        r = e2e_device_consumer(ds, config)
        print("e2e:", r, flush=True)
        result["e2e"].append(r)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
