#!/usr/bin/env python3
"""Measure the +-1-ulp variance chaos envelope on the ACCURACY.md workload.

Runs ONLY the two golden oracles (unperturbed vs chaos_variance_ulps=1) over
the exact accuracy-benchmark scan stream (seed 17, adversarial, 64x1800,
step 1.2 m, full 364^2 geometry), scores both with the reference scorer, and
prints the metric deltas -- the intrinsic rounding-tie sensitivity envelope
the pipeline-vs-golden deltas in ACCURACY.md are compared against
(eval/accuracy.py chaos control, mode "ulp").

Pure NumPy/CPU: no TPU, no pipeline -- the pipeline-vs-golden half of the
benchmark is unchanged by the harness and already measured. Usage:
    python scripts/chaos_envelope.py [n_scans] [out.json]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    out_path = sys.argv[2] if len(sys.argv) > 2 else ""

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.eval.accuracy import HEADLINE
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.golden import GoldenGroundGrid

    config = GroundGridConfig()
    golden = GoldenGroundGrid(config)
    golden_p = GoldenGroundGrid(config)
    golden_p.chaos_variance_ulps = 1
    ev_gold = Evaluator("chaos")
    ev_gold_p = Evaluator("chaos")

    t0 = time.monotonic()
    for idx, (pts_velo, lbl, T) in enumerate(
        adversarial_sequence(n_scans, seed=17, n_beams=64, n_azimuth=1800,
                             step_m=1.2)
    ):
        mv, mb, bm = tf.scan_poses(T)
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        for g, ev in ((golden, ev_gold), (golden_p, ev_gold_p)):
            g.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
            want = g.filter_cloud(
                pts_map, lbl, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64)
            )
            ev.add_cloud(want, lbl)
        print(f"scan {idx + 1}/{n_scans}: {len(pts_map)} pts, "
              f"{time.monotonic() - t0:.0f} s elapsed", flush=True)

    mg = ev_gold.compute().as_dict()
    mgp = ev_gold_p.compute().as_dict()
    env = {k: (mgp[k] - mg[k]) * 100.0 for k in HEADLINE}
    result = dict(
        n_scans=n_scans, golden=mg, golden_perturbed=mgp, chaos_mode="ulp",
        chaos_envelope_pt=env,
        max_abs_chaos_envelope_pt=max(abs(v) for v in env.values()),
        wall_s=round(time.monotonic() - t0, 1),
    )
    print(json.dumps(result, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
