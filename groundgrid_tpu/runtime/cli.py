"""Command-line interface: playback / evaluate / bench.

Replaces the reference's roslaunch entry points (``launch/*.launch``):
  * ``evaluate``  == KITTIEvaluate.launch: lock-step playback + scorer with
    the every-500-clouds statistics print (eval_groundpoint_classifier.py:123)
  * ``playback``  == KITTIPlayback.launch: stream a sequence, log timing,
    optionally dump layer images (the RViz/image-topic substitute)
  * ``bench``     == throughput benchmark on synthetic data (one JSON line)
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dimension", type=float, default=120.0)
    p.add_argument("--resolution", type=float, default=0.33)
    p.add_argument("--max-points", type=int, default=131072)
    p.add_argument("--start", type=float, default=0.0, help="start seconds (player start)")
    p.add_argument("--end", type=float, default=float("inf"), help="end seconds (player end)")
    p.add_argument(
        "--sorted", dest="sorted_scans", action="store_true", default=None,
        help="sorted-scan mode: host-prepared scans + scatter-free Pallas "
             "rasterizer (default: on when running on TPU)",
    )
    p.add_argument("--no-sorted", dest="sorted_scans", action="store_false")


def _sorted_mode(args) -> bool:
    if getattr(args, "sorted_scans", None) is not None:
        return bool(args.sorted_scans)
    import jax

    return jax.default_backend() == "tpu"


def _config(args):
    from groundgrid_tpu.config import GroundGridConfig

    return GroundGridConfig(
        dimension=args.dimension,
        resolution=args.resolution,
        max_points=args.max_points,
        sorted_scans=_sorted_mode(args),
    )


def _parse_sequences(spec: str) -> list[str]:
    """'00' | '3' | '00-10' | '00,02,05' -> list of zero-padded ids."""
    out: list[str] = []
    for part in spec.split(","):
        part = part.strip()
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(f"{s:02d}" for s in range(int(lo), int(hi) + 1))
        else:
            out.append(f"{int(part):02d}")
    return out


def cmd_evaluate(args) -> int:
    """Lock-step evaluation over one or more sequences.

    Single sequence reproduces KITTIEvaluate.launch; a range like
    ``--sequence 00-10`` runs the aggregate multi-sequence evaluation
    (BASELINE.json config 3), resetting the grid between sequences but
    accumulating one confusion table.
    """
    from groundgrid_tpu.data.semantickitti import SemanticKITTI
    from groundgrid_tpu.data.native_loader import (
        PrefetchingLoader, SortedPrefetchingLoader,
    )
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.runtime.driver import StreamingDriver

    def _records(ds, cfg):
        """Best available record stream for the config (native prep > raw)."""
        if not args.native_loader:
            return ds.iter_scans(args.start, args.end)
        if cfg.sorted_scans:
            return SortedPrefetchingLoader(ds, cfg)
        return PrefetchingLoader(ds, cap=args.max_points)

    sequences = _parse_sequences(str(args.sequence))
    name = sequences[0] if len(sequences) == 1 else ",".join(sequences)
    per_seq = {}
    total_stats = None
    if args.on_device_eval:
        # step + scoring fully on device; one fetch per 500 clouds + final
        from groundgrid_tpu.eval.metrics import Evaluator as HostEval
        from groundgrid_tpu.runtime.evaluate import evaluate_records

        ev = HostEval(name)
        for seq in sequences:
            ds = SemanticKITTI(args.directory, seq)
            seq_ev, stats = evaluate_records(
                _config(args), _records(ds, _config(args)), seq
            )
            per_seq[seq] = seq_ev.compute().as_dict()
            ev.nonground_count += seq_ev.nonground_count
            ev.true_positive += seq_ev.true_positive
            ev.false_positive += seq_ev.false_positive
            ev.total += seq_ev.total
            ev.clouds += seq_ev.clouds
            total_stats = stats
    else:
        driver = StreamingDriver(_config(args))
        ev = Evaluator(name)
        for seq in sequences:
            ds = SemanticKITTI(args.directory, seq)
            driver.reset()
            seq_ev = Evaluator(seq)
            for rec in _records(ds, driver.config):
                res = driver.process(rec)
                if res is None:
                    continue
                ev.add_cloud(res.labels, rec.labels)
                seq_ev.add_cloud(res.labels, rec.labels)
                if ev.clouds % 500 == 0:  # reference cadence (:123-124)
                    print(ev.format_statistics(), flush=True)
            per_seq[seq] = seq_ev.compute().as_dict()
        total_stats = driver.stats
    print(ev.format_statistics(), flush=True)
    m = ev.compute()
    payload = dict(
        sequences=sequences,
        scans=ev.clouds,
        avg_ms=total_stats.avg_ms if total_stats else None,
        scans_per_sec=total_stats.scans_per_sec if total_stats else None,
        **m.as_dict(),
    )
    if len(sequences) > 1:
        payload["per_sequence"] = per_seq
    print(json.dumps(payload), flush=True)
    return 0


def cmd_playback(args) -> int:
    from groundgrid_tpu.data.semantickitti import SemanticKITTI
    from groundgrid_tpu.runtime.driver import StreamingDriver

    ds = SemanticKITTI(args.directory, args.sequence)
    want_aux = bool(args.export_layers or args.export_terrain)
    driver = StreamingDriver(_config(args), with_aux=want_aux)
    prev_ts = None
    for res in driver.run(ds.iter_scans(args.start, args.end)):
        if args.rate > 0 and prev_ts is not None:
            # real-time pacing like the player's sim clock
            # (kitti_data_publisher.py:80-109): sleep off the remaining
            # scan-interval / rate budget.
            budget = (res.timestamp - prev_ts) / args.rate - res.wall_ms / 1000.0
            if budget > 0:
                time.sleep(budget)
        prev_ts = res.timestamp
        print(
            f"scan {res.index}: {res.n_points} pts "
            f"ground={int((res.labels == 49).sum())} "
            f"nonground={int((res.labels == 99).sum())} "
            f"{res.wall_ms:.1f} ms (avg {driver.stats.avg_ms:.1f} ms, "
            f"{driver.stats.scans_per_sec:.1f} scans/s)",
            flush=True,
        )
        if args.export_layers and res.index % args.export_every == 0:
            from groundgrid_tpu.runtime.viz import export_layers

            export_layers(res.aux, args.export_layers, prefix=f"{res.index:06d}_")
        if args.export_terrain and res.index % args.export_every == 0:
            from groundgrid_tpu.runtime.viz import save_terrain_artifact

            center = driver.state.center
            save_terrain_artifact(
                args.export_terrain, res.aux["ground"], res.aux["points_raw"],
                res.index, float(center[0]), float(center[1]),
            )
    return 0


def cmd_bench(args) -> int:
    from groundgrid_tpu.runtime.bench import run_benchmark

    result = run_benchmark(
        n_scans=args.scans,
        batch=args.batch,
        resolution=args.resolution,
        dimension=args.dimension,
    )
    print(json.dumps(result), flush=True)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="groundgrid-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_eval = sub.add_parser("evaluate", help="lock-step sequence evaluation")
    p_eval.add_argument("--directory", required=True, help="SemanticKITTI root")
    p_eval.add_argument("--sequence", default="00", help="'00', '00-10' or '00,05'")
    p_eval.add_argument("--native-loader", action="store_true",
                        help="use the C++ prefetching loader")
    p_eval.add_argument("--on-device-eval", action="store_true",
                        help="score on device (no per-scan host fetch)")
    _add_common(p_eval)
    p_eval.set_defaults(func=cmd_evaluate)

    p_play = sub.add_parser("playback", help="stream a sequence, log timing")
    p_play.add_argument("--directory", required=True)
    p_play.add_argument("--sequence", default="00")
    p_play.add_argument("--export-layers", default="", help="dir for layer PNGs")
    p_play.add_argument("--export-terrain", default="", help="dir for terrain artifacts")
    p_play.add_argument("--export-every", type=int, default=100)
    p_play.add_argument("--rate", type=float, default=0.0,
                        help="real-time pacing factor (0 = as fast as possible)")
    _add_common(p_play)
    p_play.set_defaults(func=cmd_playback)

    p_bench = sub.add_parser("bench", help="synthetic throughput benchmark")
    p_bench.add_argument("--scans", type=int, default=64)
    p_bench.add_argument("--batch", type=int, default=1)
    p_bench.add_argument("--dimension", type=float, default=120.0)
    p_bench.add_argument("--resolution", type=float, default=0.33)
    p_bench.set_defaults(func=cmd_bench)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
