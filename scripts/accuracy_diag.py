#!/usr/bin/env python3
"""Localize the residual pipeline-vs-golden accuracy divergence.

Runs the ACCURACY.md workload (seed 17, adversarial, full 364^2 geometry)
scan by scan on the CPU backend and reports, per scan:
  - label mismatches, split by threshold margin (|z - (ground+tol)|, computed
    from GOLDEN's layers): near-threshold flips are fp-noise class, large
    margins indicate a real state divergence (layers or outlier flags);
  - post-scan persistent-layer deltas (ground / groundpatch) vs golden;
  - outlier-set disagreement (golden.last_outliers vs pipeline label 49
    forced on golden-nonground points).

Usage: JAX_PLATFORMS=cpu python scripts/accuracy_diag.py [n_scans]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 48

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.driver import StreamingDriver

    config = GroundGridConfig()
    driver = StreamingDriver(config, with_aux=True)
    golden = GoldenGroundGrid(config)
    ev_pipe = Evaluator("diag")
    ev_gold = Evaluator("diag")

    h_thr = np.float32(config.miminum_point_height_threshold)
    h_obs = np.float32(config.minimum_point_height_obstacle_threshold)
    mdf = np.float32(config.minimum_distance_factor)
    n = config.cell_count
    res = np.float32(config.resolution)
    half = np.float32(config.half_length)

    tot_mm = 0
    tot_pts = 0
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
        r = driver.process(rec)
        ev_pipe.add_cloud(r.labels, lbl)

        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        want = golden.filter_cloud(
            np.stack([x, y, z], axis=-1), lbl, np.asarray(mv[:3, 3]),
            np.asarray(mb, np.float64),
        )
        ev_gold.add_cloud(want, lbl)

        got = np.asarray(r.labels)[: len(want)]
        want = np.asarray(want)
        mm = got != want
        tot_mm += int(mm.sum())
        tot_pts += len(want)

        # persistent-layer deltas (post-scan state vs golden state)
        g_pipe = np.asarray(r.aux["ground"])
        c_pipe = np.asarray(r.aux["groundpatch"])
        g_gold = golden.state.ground
        c_gold = golden.state.groundpatch
        dg = np.abs(g_pipe - g_gold)
        dc = np.abs(c_pipe - c_gold)

        line = (
            f"scan {idx:3d}: mm={int(mm.sum()):5d}/{len(want)}"
            f"  dground max={dg.max():.3e} p99={np.quantile(dg, 0.99):.2e}"
            f" n>1e-3={int((dg > 1e-3).sum()):5d} n>1e-1={int((dg > 0.1).sum()):4d}"
            f"  dconf max={dc.max():.2e} n>1e-3={int((dc > 1e-3).sum()):5d}"
        )
        if mm.any():
            # margin from GOLDEN layers at each mismatched point
            i0 = np.floor((golden.state.center[0] + half - x) / res).astype(int)
            i1 = np.floor((golden.state.center[1] + half - y) / res).astype(int)
            inm = (i0 >= 0) & (i0 < n) & (i1 >= 0) & (i1 < n)
            i0c = np.clip(i0, 0, n - 1)
            i1c = np.clip(i1, 0, n - 1)
            gh = g_gold[i0c, i1c]
            var = golden.scratch["variance"][i0c, i1c]
            org = np.asarray(mv[:3, 3])
            dxy = np.sqrt((x - org[0]) ** 2 + (y - org[1]) ** 2)
            tol = np.maximum(
                np.minimum((5 * mdf * dxy) / np.maximum(var, 1e-30) * h_thr,
                           h_thr), h_obs
            )
            margin = np.abs(z - (gh + tol))
            m_mm = margin[mm & inm]
            outl = np.zeros(len(want), bool)
            outl[np.asarray(golden.last_outliers, int)] = True
            # mismatches where golden says outlier-forced-ground (49) but
            # pipeline says nonground, or vice versa, with a BIG margin:
            # those are outlier-set or layer divergences, not threshold noise
            big = (margin > 0.01) & mm & inm
            line += (
                f"  mm_margin p50={np.median(m_mm) if len(m_mm) else 0:.1e}"
                f" max={m_mm.max() if len(m_mm) else 0:.2e}"
                f"  mm_big={int(big.sum()):5d}"
                f" (of which golden-outlier={int((big & outl).sum()):4d})"
            )
        print(line, flush=True)

    mp = ev_pipe.compute().as_dict()
    mg = ev_gold.compute().as_dict()
    print(f"\ncumulative mismatch {tot_mm}/{tot_pts} = {tot_mm/tot_pts:.4%}")
    for k in ("precision", "recall", "f1", "accuracy", "ioug"):
        print(f"  {k:10s} pipe={mp[k]*100:.4f} gold={mg[k]*100:.4f} "
              f"delta={100*(mp[k]-mg[k]):+.4f} pt")


if __name__ == "__main__":
    main()
