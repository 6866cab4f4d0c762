#!/usr/bin/env python3
"""Full-geometry chaos envelope: golden vs permuted-order golden.

Measures whether the meter-scale ground-layer divergence seen in
pipeline-vs-golden (scripts/accuracy_diag.py) is intrinsic to the scene:
feeding the sequential oracle the same points in a permuted order models the
reference's racing insert threads (GroundSegmentation.cpp:200-310), whose
Welford reassociation is the same noise class as any parallel reduction.
If permuted golden diverges from scan-order golden at a comparable layer
magnitude, the pipeline's divergence is within the reference's own
run-to-run envelope.

Usage: JAX_PLATFORMS=cpu python scripts/chaos_diag.py [n_scans]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 40

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.golden import GoldenGroundGrid

    config = GroundGridConfig()
    g_a = GoldenGroundGrid(config)
    g_b = GoldenGroundGrid(config)
    ev_a = Evaluator("chaos")
    ev_b = Evaluator("chaos")

    tot_mm = 0
    tot_pts = 0
    for idx, (pts_velo, lbl, T) in enumerate(
        adversarial_sequence(n_scans, seed=17, n_beams=64, n_azimuth=1800,
                             step_m=1.2)
    ):
        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        lbl = np.asarray(lbl)

        g_a.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        la = g_a.filter_cloud(pts_map, lbl, np.asarray(mv[:3, 3]),
                              np.asarray(mb, np.float64))
        ev_a.add_cloud(la, lbl)

        perm = np.random.default_rng(10_000 + idx).permutation(len(pts_map))
        g_b.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        lb = g_b.filter_cloud(pts_map[perm], lbl[perm],
                              np.asarray(mv[:3, 3]), np.asarray(mb, np.float64))
        ev_b.add_cloud(lb, lbl[perm])

        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        mm = np.asarray(la) != np.asarray(lb)[inv]
        tot_mm += int(mm.sum())
        tot_pts += len(la)

        dg = np.abs(g_a.state.ground - g_b.state.ground)
        dc = np.abs(g_a.state.groundpatch - g_b.state.groundpatch)
        print(
            f"scan {idx:3d}: mm={int(mm.sum()):5d}/{len(la)}"
            f"  dground max={dg.max():.3e} p99={np.quantile(dg, 0.99):.2e}"
            f" n>1e-3={int((dg > 1e-3).sum()):5d} n>1e-1={int((dg > 0.1).sum()):4d}"
            f"  dconf max={dc.max():.2e} n>1e-3={int((dc > 1e-3).sum()):5d}",
            flush=True,
        )

    ma = ev_a.compute().as_dict()
    mb_ = ev_b.compute().as_dict()
    print(f"\ncumulative label mismatch {tot_mm}/{tot_pts} = {tot_mm/max(tot_pts,1):.4%}")
    for k in ("precision", "recall", "f1", "accuracy", "ioug"):
        print(f"  {k:10s} order={ma[k]*100:.4f} perm={mb_[k]*100:.4f} "
              f"delta={100*(mb_[k]-ma[k]):+.4f} pt")


if __name__ == "__main__":
    main()
