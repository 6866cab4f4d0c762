#!/usr/bin/env python3
"""Measure the pipeline-vs-golden variance gap in float32 ulps.

The residual accuracy delta (ACCURACY.md) is attributed to float32 rounding
of the thresholded variance path: golden computes per-cell sequential
Welford (mirroring the C++, GroundSegmentation.cpp:282-309), the TPU
pipeline computes shifted parallel sums. This script quantifies how far
apart the two variance maps actually are, per scan, in ulps -- the bridge
between the +-1-ulp chaos envelope (scripts/chaos_envelope.py) and the
observed pipeline delta: if the real gap is a handful of ulps, the 1-ulp
envelope is the per-cell-minimal version of exactly the noise the pipeline
injects.

Only cells with identical raw point counts in both engines are compared.
A residual tail contamination remains possible where the engines disagree
on a cell's OUTLIER set (outlier points skip accumulation; that is the
separate state-feedback mechanism) -- it shows up as the far tail of the
percentiles, not the bulk. Welford m2 is computed from the current scan
alone, so the comparison is otherwise state-drift-free by construction.

Usage: JAX_PLATFORMS=cpu python scripts/variance_ulps.py [n_scans]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def ulp_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Number of representable float32s between a and b (same-sign lanes)."""
    ia = a.view(np.int32).astype(np.int64)
    ib = b.view(np.int32).astype(np.int64)
    return np.abs(ia - ib)


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    import jax

    jax.config.update("jax_platforms", "cpu")

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.driver import StreamingDriver

    config = GroundGridConfig(sorted_scans=True)  # the ACCURACY.md path: host f64 transform, bitwise-identical z
    driver = StreamingDriver(config, with_aux=True)
    golden = GoldenGroundGrid(config)

    all_ulps = []
    t0 = time.monotonic()
    for idx, (pts_velo, lbl, T) in enumerate(
        adversarial_sequence(n_scans, seed=17, n_beams=64, n_azimuth=1800,
                             step_m=1.2)
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

        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        golden.filter_cloud(
            pts_map, lbl, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64)
        )

        v_pipe = np.asarray(res.aux["variance"], np.float32)
        v_gold = np.asarray(golden.scratch["variance"], np.float32)
        n_pipe = np.asarray(res.aux["points_raw"], np.float32)
        n_gold = np.asarray(golden.scratch["pointsRaw"], np.float32)

        # same-population cells with a nontrivial variance in either engine
        comparable = (n_pipe == n_gold) & (n_gold >= 2) & (
            (v_pipe > 0) | (v_gold > 0)
        )
        ulps = ulp_distance(v_pipe[comparable], v_gold[comparable])
        all_ulps.append(ulps)
        q = np.percentile(ulps, [50, 90, 99]) if len(ulps) else [0, 0, 0]
        print(
            f"scan {idx:3d}: cells={comparable.sum():6d} "
            f"(count-mismatched={(n_pipe != n_gold).sum():4d})  "
            f"ulp p50={q[0]:.0f} p90={q[1]:.0f} p99={q[2]:.0f} "
            f"max={ulps.max() if len(ulps) else 0}  "
            f"exact={np.mean(ulps == 0) * 100 if len(ulps) else 100:.1f}%  "
            f"<=1ulp={np.mean(ulps <= 1) * 100 if len(ulps) else 100:.1f}%  "
            f"[{time.monotonic() - t0:.0f}s]",
            flush=True,
        )

    u = np.concatenate(all_ulps)
    print(
        f"\nTOTAL over {n_scans} scans, {len(u)} comparable cells:\n"
        f"  bitwise-equal: {np.mean(u == 0) * 100:.2f}%\n"
        f"  <= 1 ulp:      {np.mean(u <= 1) * 100:.2f}%\n"
        f"  <= 4 ulp:      {np.mean(u <= 4) * 100:.2f}%\n"
        f"  p99.9: {np.percentile(u, 99.9):.0f} ulp   max: {u.max()} ulp"
    )


if __name__ == "__main__":
    main()
