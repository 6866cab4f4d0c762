#!/usr/bin/env python3
"""A/B op-level trace of the full step across march-tier ladders.

Pins down where the 0.985 -> 1.59 ms/scan regression lives. Run on TPU:
    python scripts/trace_regression.py            # default ladder set
    python scripts/trace_regression.py ops        # also dump top-op tables
"""
import glob
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import numpy as np


def trace_config(tag, scans, poses, config, dump_ops=False):
    import jax
    from groundgrid_tpu.pipeline import compile_step_verified, init_state

    state = init_state(config, poses[0].astype(np.float32))
    step, probe_ms = compile_step_verified(config, state, scans[0])
    print(f"[{tag}] verified {probe_ms:.2f} ms/step probe", flush=True)
    state = init_state(config, poses[0].astype(np.float32))
    n_distinct = len(scans)
    for i in range(2):
        state, out = step(state, scans[i])
    _ = np.asarray(out.labels)
    iters = n_distinct - 2
    tmp = tempfile.mkdtemp(prefix=f"ggtrace_{tag}_")
    jax.profiler.start_trace(tmp)
    for i in range(iters):
        state, out = step(state, scans[2 + i])
    _ = np.asarray(out.labels)
    jax.profiler.stop_trace()

    from groundgrid_tpu.utils.profiling import device_op_times, jit_device_ms

    ms = jit_device_ms(tmp, iters)
    print(f"[{tag}] jit total {ms:.3f} ms/step over {iters} steps", flush=True)
    if dump_ops:
        path = sorted(glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True))[-1]
        for name, ns in device_op_times(path, top=40):
            if name.startswith("jit_"):
                continue
            print(f"  {ns/iters/1e3:9.1f} us/step  {name[:110]}")
    return ms


def main():
    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.runtime.bench import _make_scans
    from groundgrid_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dump_ops = "ops" in sys.argv[1:]
    base = GroundGridConfig(sorted_scans=True)
    scans, poses = _make_scans(base, 16)

    variants = [
        ("chunked_cap8192", dict(max_outlier_candidates=8192)),
        ("chunked_cap2048", dict(max_outlier_candidates=2048)),
    ]
    results = {}
    for tag, kw in variants:
        cfg = GroundGridConfig(sorted_scans=True, **kw)
        try:
            results[tag] = trace_config(tag, scans, poses, cfg, dump_ops)
        except Exception as e:  # keep going; service flakes happen
            print(f"[{tag}] FAILED: {e}", flush=True)
    for tag, ms in results.items():
        print(f"RESULT {tag}: {ms:.3f} ms/step")


if __name__ == "__main__":
    main()
