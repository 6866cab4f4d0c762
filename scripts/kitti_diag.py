#!/usr/bin/env python3
"""Localize the kitti-world city-s0 mismatch burst (campaign r4).

The r4 campaign's city-s0 config reported 1 label mismatch at scan 100 and
1793 by scan 160 -- the burst coincides with the drive plan's
stop (120-123) / halfcell (124-131) / reverse (132-160) segments. This
re-runs the identical config scan by scan and reports, per scan:

  - label mismatch count, split by |z - (ground+tol)| margin measured on
    GOLDEN's layers (near-threshold = fp tie-flip class; far = real state
    divergence);
  - persistent-layer deltas vs golden after the scan (ground/groundpatch:
    #cells differing bitwise, max |delta|);
  - the first few divergent cells (ij, golden vs pipeline values) when a
    layer first diverges.

Usage: JAX_PLATFORMS=cpu python scripts/kitti_diag.py [n_scans] [first_report]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    first_report = int(sys.argv[2]) if len(sys.argv) > 2 else 90

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.kitti_world import kitti_sequence
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.driver import StreamingDriver

    cfg = GroundGridConfig()
    driver = StreamingDriver(cfg, with_aux=True)
    golden = GoldenGroundGrid(cfg)

    h_thr = np.float32(cfg.miminum_point_height_threshold)
    h_obs = np.float32(cfg.minimum_point_height_obstacle_threshold)
    mdf5 = np.float32(cfg.minimum_distance_factor * 5.0)

    total = 0
    g_diverged = False
    for idx, (pts_velo, lbl, T) in enumerate(kitti_sequence(
        n_scans, seed=0, variant="city", rain_rate=0.0,
        resolution=cfg.resolution,
    )):
        rec = ScanRecord(
            index=idx, timestamp=idx * 0.1,
            points=np.concatenate(
                [pts_velo, np.zeros((len(pts_velo), 1), np.float32)], axis=1),
            labels=np.asarray(lbl, np.int32),
            t_map_velo=np.asarray(T, np.float64),
        )
        res = driver.process(rec)

        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2])
        pts_map = np.stack([x, y, z], axis=-1)
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        want = golden.filter_cloud(
            pts_map, lbl, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64))

        got = np.asarray(res.labels)[: len(want)]
        mm = got != np.asarray(want)
        n_mm = int(mm.sum())
        total += n_mm

        # persistent-layer deltas
        pg = np.asarray(res.aux["ground"]) if res.aux else None
        gg = golden.state.ground
        gp = golden.state.groundpatch
        pp = np.asarray(res.aux["groundpatch"]) if res.aux else None
        gd = (pg != gg)
        cd = (pp != gp)
        report = idx >= first_report and (n_mm or gd.any() or cd.any())
        if report or (idx % 20 == 19):
            print(f"scan {idx:3d}: mismatch {n_mm:5d} "
                  f"(cum {total}) ground_cells_diff {int(gd.sum()):5d} "
                  f"max|dg| {np.abs(np.where(gd, pg - gg, 0)).max():.3e} "
                  f"conf_cells_diff {int(cd.sum()):5d}", flush=True)
        if n_mm and idx >= first_report:
            # margin analysis on golden's layers; cells via the oracle's own
            # f64 index math (golden._index semantics)
            k = np.nonzero(mm)[0][:20000]
            c = cfg
            rel0 = (golden.state.center[0] + c.half_length) - x[k].astype(np.float64)
            rel1 = (golden.state.center[1] + c.half_length) - y[k].astype(np.float64)
            gi = np.floor(rel0 / c.resolution).astype(int)
            gj = np.floor(rel1 / c.resolution).astype(int)
            gi = np.clip(gi, 0, cfg.cell_count - 1)
            gj = np.clip(gj, 0, cfg.cell_count - 1)
            var = golden.snapshots["detect_inputs"][1][gi, gj]
            dist = np.hypot(x[k] - mv[0, 3], y[k] - mv[1, 3])
            with np.errstate(divide="ignore"):
                tol = np.maximum(
                    np.minimum((mdf5 * dist) / var * h_thr, h_thr), h_obs)
            margin = np.abs(z[k] - (gg[gi, gj] + tol))
            near = int((margin < 1e-4).sum())
            cells = set(zip(gi.tolist(), gj.tolist()))
            print(f"   margins: near(<1e-4m) {near}/{n_mm}, "
                  f"median {np.median(margin):.2e}, max {margin.max():.2e}; "
                  f"{len(cells)} cells involved; sample {sorted(cells)[:6]}",
                  flush=True)
        if gd.any() and not g_diverged:
            g_diverged = True
            ij = np.argwhere(gd)[:8]
            print(f"   FIRST ground divergence at scan {idx}: cells "
                  + ", ".join(
                      f"({a},{b}): g={gg[a,b]:.6f} p={pg[a,b]:.6f}"
                      for a, b in ij), flush=True)
    print(f"TOTAL mismatches {total}")


if __name__ == "__main__":
    main()
