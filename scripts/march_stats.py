#!/usr/bin/env python3
"""Probe the outlier-march candidate distribution on the bench workload.

Reports, per warm streaming step (same synthetic scene/pose generator as
runtime/bench.py): total candidates with positive march budget (n_run), and
prefix counts at budget thresholds (how many candidates' rays reach step s,
i.e. budget >= s^2) -- the data that sizes ``config.march_chunk`` and the
near/far tier split in core/outliers.py.

Usage: JAX_PLATFORMS=cpu python scripts/march_stats.py [n_steps]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import jax

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import rasterize as rasterlib
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.pipeline import init_state, make_step
    from groundgrid_tpu.runtime.bench import _make_scans

    config = GroundGridConfig()
    scans, poses = _make_scans(config, min(n_steps, 32))
    step = jax.jit(make_step(config))
    state = init_state(config, poses[0].astype(np.float32))

    thresholds = [4, 8, 12, 16, 24, 32, 48, 64, 96]
    rows = []
    for i in range(n_steps):
        scan = scans[i % len(scans)]
        # pre-step candidate stats against the PREVIOUS scan's layers,
        # exactly like detect_outliers (budget math in plain f32 -- stats,
        # not parity)
        origin = np.asarray(scan.t_map_velo)[:3, 3]
        xj, yj, zj = tf.transform_points_soa(scan.t_map_velo, scan.px, scan.py, scan.pz)
        x, y, z = np.asarray(xj), np.asarray(yj), np.asarray(zj)
        valid = np.asarray(scan.valid) > 0
        binning = rasterlib.bin_points(
            config, state.center, xj, yj, zj, scan.rings,
            scan.valid > 0, origin.astype(np.float32),
        )
        gi0 = np.clip(np.asarray(binning.gi0), 0, config.cell_count - 1)
        gi1 = np.clip(np.asarray(binning.gi1), 0, config.cell_count - 1)
        inmap = np.asarray(binning.inmap)
        ignored = np.asarray(binning.ignored)
        ground = np.asarray(state.ground)
        old_h = ground[gi0, gi1]
        cand = inmap & ~ignored & (z < old_h - 0.2) & valid
        dx, dy, dz = x - origin[0], y - origin[1], z - origin[2]
        length = np.sqrt(dx * dx + dy * dy + dz * dz) + 1e-30
        vz = dz / length
        budget = np.where(cand & (vz < -0.01), length * length, 0.0)
        n_run = int((budget > 0).sum())
        prefix = {s: int((budget >= s * s).sum()) for s in thresholds}
        rows.append((n_run, prefix))
        print(
            f"step {i:3d}: n_run {n_run:5d}  "
            + "  ".join(f">={s}:{prefix[s]:5d}" for s in thresholds),
            flush=True,
        )
        state, out = step(state, scan)

    n_runs = np.array([r[0] for r in rows])
    print(f"\nn_run: mean {n_runs.mean():.0f} median {np.median(n_runs):.0f} "
          f"p90 {np.percentile(n_runs, 90):.0f} max {n_runs.max()}")
    for s in thresholds:
        v = np.array([r[1][s] for r in rows])
        print(f"budget>={s}^2: mean {v.mean():.0f} median {np.median(v):.0f} "
              f"p90 {np.percentile(v, 90):.0f} max {v.max()}")


if __name__ == "__main__":
    main()
