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
    p.add_argument("--wire", action="store_true",
                   help="s16 quantized wire format (~2.5x smaller ingest, "
                        "~1-2 mm lossy; implies --sorted)")
    p.add_argument("--native-loader", action="store_true",
                   help="use the C++ prefetching loader")
    p.add_argument("--pipeline-depth", type=int, default=0,
                   help="scans dispatched ahead of the fetch (0 = lock-step; "
                        ">=1 overlaps host prep, device compute and D2H -- "
                        "bitwise-identical results; incompatible with "
                        "--checkpoint; --on-device-eval is already pipelined)")
    p.add_argument("--checkpoint", default="",
                   help="grid-state checkpoint file (.npz) to write "
                        "periodically (and resume from with --resume)")
    p.add_argument("--checkpoint-every", type=int, default=500,
                   help="checkpoint cadence in scans (default 500)")
    p.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists (bitwise "
                        "continuation: state(t) + scans(t+1..) reproduce the "
                        "uninterrupted run)")


def _sorted_mode(args) -> bool:
    if getattr(args, "sorted_scans", None) is not None:
        return bool(args.sorted_scans)
    import jax

    return jax.default_backend() == "tpu"


def _config(args):
    from groundgrid_tpu.config import GroundGridConfig

    wire = bool(getattr(args, "wire", False))
    return GroundGridConfig(
        dimension=args.dimension,
        resolution=args.resolution,
        max_points=args.max_points,
        sorted_scans=wire or _sorted_mode(args),
        wire_format=wire,
    )


def _records(ds, cfg, args, start_index=None):
    """Best available record stream for the config (native prep > raw).

    Applies the ``--start``/``--end`` player window uniformly: the native
    prefetching loaders are seeked to the first in-window scan and cut off
    past ``--end`` (they previously played the full sequence regardless).
    ``start_index`` (resume) additionally skips already-processed scans.
    """
    first = ds.seek_index(args.start) if args.start > 0 else 0
    if start_index is not None:
        first = max(first, int(start_index))
    end = args.end

    if not getattr(args, "native_loader", False):
        def gen_raw():
            for idx in range(first, len(ds)):
                if float(ds.times[idx]) > end:
                    return
                yield ds.read_scan(idx)
        return gen_raw()

    from groundgrid_tpu.data.native_loader import (
        PrefetchingLoader, SortedPrefetchingLoader, WirePrefetchingLoader,
    )

    if cfg.wire_format:
        loader = WirePrefetchingLoader(ds, cfg)
    elif cfg.sorted_scans:
        loader = SortedPrefetchingLoader(ds, cfg)
    else:
        loader = PrefetchingLoader(ds, cap=cfg.max_points)
    if first:
        loader.seek(first)
    if end == float("inf"):
        return iter(loader)

    def gen_native():
        for rec in loader:
            if rec.timestamp > end:
                loader.close()
                return
            yield rec
    return gen_native()


def _load_resume(args, cfg):
    """(state, next_index, extra) from --checkpoint when resuming, else None."""
    import os

    if not (getattr(args, "resume", False) and args.checkpoint):
        return None
    if not os.path.exists(args.checkpoint):
        return None
    from groundgrid_tpu.runtime.checkpoint import load_state

    return load_state(args.checkpoint, cfg)


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
    from groundgrid_tpu.eval.metrics import Evaluator
    from groundgrid_tpu.runtime.driver import StreamingDriver

    cfg = _config(args)
    if args.pipeline_depth > 0 and args.checkpoint:
        print("--pipeline-depth and --checkpoint are mutually exclusive "
              "(in-flight scans make the checkpointed state run ahead of "
              "the stream position)", file=sys.stderr)
        return 2
    sequences = _parse_sequences(str(args.sequence))
    name = sequences[0] if len(sequences) == 1 else ",".join(sequences)
    per_seq = {}
    total_stats = None
    if args.on_device_eval:
        if args.checkpoint:
            print("error: --checkpoint is not supported with --on-device-eval "
                  "(confusion counts live on device)", file=sys.stderr)
            return 2
        # step + scoring fully on device; one fetch per 500 clouds + final
        from groundgrid_tpu.eval.metrics import Evaluator as HostEval
        from groundgrid_tpu.runtime.evaluate import evaluate_records

        ev = HostEval(name)
        for seq in sequences:
            ds = SemanticKITTI(args.directory, seq)
            seq_ev, stats = evaluate_records(cfg, _records(ds, cfg, args), seq)
            per_seq[seq] = seq_ev.compute().as_dict()
            ev.nonground_count += seq_ev.nonground_count
            ev.true_positive += seq_ev.true_positive
            ev.false_positive += seq_ev.false_positive
            ev.total += seq_ev.total
            ev.clouds += seq_ev.clouds
            total_stats = stats
    else:
        from groundgrid_tpu.runtime.checkpoint import save_state

        driver = StreamingDriver(cfg)
        ev = Evaluator(name)
        seq_start, resume_index = 0, None
        resumed = _load_resume(args, cfg)
        if resumed is not None:
            state, resume_index, extra = resumed
            driver.restore(state, center64=extra.get("center64"))
            ev.load_state_dict(extra["evaluator"])
            per_seq = extra.get("per_sequence", {})
            if extra.get("sequence") in sequences:
                seq_start = sequences.index(extra["sequence"])
            print(f"resumed at sequence {sequences[seq_start]} "
                  f"scan {resume_index} ({ev.clouds} clouds scored)",
                  file=sys.stderr, flush=True)
        for si, seq in enumerate(sequences):
            if si < seq_start:
                continue
            ds = SemanticKITTI(args.directory, seq)
            if si == seq_start and resume_index is not None:
                seq_ev = Evaluator(seq)
                seq_ev.load_state_dict(resumed[2]["seq_evaluator"])
                first = resume_index
            else:
                driver.reset()
                seq_ev = Evaluator(seq)
                first = None
            for res, gt_labels, rec_index in _scored_results(
                driver, _records(ds, cfg, args, start_index=first), args
            ):
                ev.add_cloud(res.labels, gt_labels)
                seq_ev.add_cloud(res.labels, gt_labels)
                if ev.clouds % 500 == 0:  # reference cadence (:123-124)
                    print(ev.format_statistics(), flush=True)
                if (args.checkpoint and args.checkpoint_every > 0
                        and ev.clouds % args.checkpoint_every == 0):
                    save_state(
                        args.checkpoint, driver.state, rec_index + 1, cfg,
                        extra=dict(
                            evaluator=ev.state_dict(),
                            seq_evaluator=seq_ev.state_dict(),
                            sequence=seq,
                            per_sequence=per_seq,
                        ),
                        center64=driver.center64,
                    )
            per_seq[seq] = seq_ev.compute().as_dict()
        total_stats = driver.stats
    print(ev.format_statistics(), flush=True)
    m = ev.compute()
    if sequences == ["00"]:
        # the reference's only published result is the seq-00 table; print
        # the side-by-side comparison (BASELINE.md acceptance criterion)
        from groundgrid_tpu.eval.baseline import format_baseline_comparison

        print(format_baseline_comparison(m.as_dict(), ev.clouds), flush=True)
    payload = dict(
        sequences=sequences,
        scans=ev.clouds,
        avg_ms=total_stats.avg_ms if total_stats else None,
        scans_per_sec=total_stats.scans_per_sec if total_stats else None,
        # depth > 0 means avg_ms is dispatch-to-finalize latency including
        # pipeline residency -- not comparable to lock-step latency
        pipeline_depth=getattr(total_stats, "pipeline_depth", 0) if total_stats
        else args.pipeline_depth,
        **m.as_dict(),
    )
    if len(sequences) > 1:
        payload["per_sequence"] = per_seq
    print(json.dumps(payload), flush=True)
    return 0


def _scored_results(driver, records, args):
    """Yield (result, gt_labels, record_index), optionally pipelined.

    With ``--pipeline-depth`` > 0 the driver dispatches ahead of the fetch;
    ground-truth labels for in-flight scans are held in a bounded side map
    keyed by scan index until their result arrives (results stay in order).
    """
    depth = getattr(args, "pipeline_depth", 0)
    if depth <= 0:
        for rec in records:
            res = driver.process(rec)
            if res is None:
                continue
            yield res, rec.labels, rec.index
        return

    pending = {}

    def tap():
        for rec in records:
            pending[rec.index] = rec.labels
            yield rec

    for res in driver.run(tap(), pipeline_depth=depth):
        gt = pending.pop(res.index)
        # results arrive in order, so entries below res.index belong to scans
        # the driver dropped (non-finite pose) and would otherwise leak for
        # the life of the run
        for stale in [k for k in pending if k < res.index]:
            del pending[stale]
        yield res, gt, res.index


def cmd_playback(args) -> int:
    from groundgrid_tpu.data.semantickitti import SemanticKITTI
    from groundgrid_tpu.runtime.checkpoint import save_state
    from groundgrid_tpu.runtime.driver import StreamingDriver

    ds = SemanticKITTI(args.directory, args.sequence)
    if args.pipeline_depth > 0 and args.checkpoint:
        # with scans in flight the driver's grid state runs AHEAD of the
        # yielded result, so a mid-stream checkpoint would pair state(t+d)
        # with index t+1 and resume incorrectly
        print("--pipeline-depth and --checkpoint are mutually exclusive "
              "(in-flight scans make the checkpointed state run ahead of "
              "the stream position)", file=sys.stderr)
        return 2
    want_aux = bool(args.export_layers or args.export_terrain
                    or args.export_html or args.serve is not None)
    cfg = _config(args)
    driver = StreamingDriver(cfg, with_aux=want_aux)
    recorder = None
    if args.export_html:
        from groundgrid_tpu.runtime.viz import SequenceRecorder

        recorder = SequenceRecorder(max_frames=args.html_max_frames,
                                    embed_3d_every=args.html_3d_every)
    live = None
    if args.serve is not None:
        from groundgrid_tpu.runtime.live import LiveServer

        live = LiveServer(port=args.serve).start()
        print(f"live viewer at {live.url} (follow mode; space pauses)",
              file=sys.stderr, flush=True)
    resume_index = None
    resumed = _load_resume(args, cfg)
    if resumed is not None:
        state, resume_index, _ = resumed
        driver.restore(state, center64=resumed[2].get("center64"))
        print(f"resumed at scan {resume_index}", file=sys.stderr, flush=True)
    prev_ts = None
    for res in driver.run(
        _records(ds, cfg, args, start_index=resume_index),
        pipeline_depth=args.pipeline_depth,
    ):
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
        if (recorder is not None or live is not None) and res.index % args.html_every == 0:
            import numpy as np

            center = np.asarray(driver.state.center)
            caption = (f"scan {res.index}  "
                       f"ground={int((res.labels == 49).sum())} "
                       f"nonground={int((res.labels == 99).sum())}")
            layer = res.aux["ground"] if res.aux else None
            # z0: terrain height under the vehicle (the reference's "car
            # cell", GroundGridNodelet.cpp:254) anchors the 3-D view
            c = layer.shape[0] // 2 if layer is not None else 0
            z0 = float(layer[c, c]) if layer is not None else 0.0
            if recorder is not None:
                recorder.add(res.x, res.y, res.labels, center,
                             caption=caption, layer=layer, z=res.z, z0=z0,
                             resolution=cfg.resolution)
            if live is not None:
                live.add(res.x, res.y, res.labels, center,
                         caption=caption, layer=layer, z=res.z, z0=z0,
                         resolution=cfg.resolution)
        if (args.checkpoint and args.checkpoint_every > 0
                and (res.index + 1) % args.checkpoint_every == 0):
            save_state(args.checkpoint, driver.state, res.index + 1, cfg,
                       center64=driver.center64)
    if recorder is not None:
        out = recorder.write_html(
            args.export_html,
            title=f"groundgrid-tpu seq {args.sequence}",
        )
        note = f" ({recorder.dropped} frames past capacity dropped)" if recorder.dropped else ""
        print(f"wrote {len(recorder.frames)}-frame player to {out}{note}", flush=True)
    if live is not None:
        live.finish()
        if args.serve_linger != 0:
            print(f"sequence done; live viewer stays at {live.url} "
                  f"(Ctrl-C to exit)", file=sys.stderr, flush=True)
            try:
                if args.serve_linger < 0:
                    while True:
                        time.sleep(3600)
                else:
                    time.sleep(args.serve_linger)
            except KeyboardInterrupt:
                pass
        live.stop()
    return 0


def cmd_accuracy(args) -> int:
    """Metric-level accuracy benchmark: pipeline vs golden oracle deltas.

    The in-environment substitute for the seq-00 evaluation (no dataset
    available): identical adversarial synthetic scans through both engines,
    both scored with the reference scorer, F1/IoUg deltas reported
    (eval/accuracy.py). Writes a markdown artifact with --output.
    """
    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.eval.accuracy import (
        format_accuracy_report, run_accuracy_benchmark,
    )

    cfg = GroundGridConfig(
        dimension=args.dimension, resolution=args.resolution,
        max_points=args.max_points, sorted_scans=_sorted_mode(args),
    )
    result = run_accuracy_benchmark(
        cfg, n_scans=args.scans, seed=args.seed, n_beams=args.beams,
        n_azimuth=args.azimuth, step_m=args.step,
        adversarial=not args.benign,
        progress=lambda s: print(s, file=sys.stderr, flush=True),
        chaos_control=(args.chaos_mode if args.chaos_control else False),
        world=args.world, variant=args.variant, rain_rate=args.rain,
    )
    report = format_accuracy_report(result)
    if args.output:
        with open(args.output, "w") as f:
            f.write(report)
        print(f"wrote {args.output}", file=sys.stderr, flush=True)
    else:
        print(report, flush=True)
    keys = ["workload", "pipeline", "golden", "delta_pt",
            "max_abs_delta_pt", "label_mismatch_rate"]
    if "chaos_envelope_pt" in result:
        keys += ["chaos_envelope_pt", "max_abs_chaos_envelope_pt"]
    print(json.dumps({k: result[k] for k in keys}), flush=True)
    ok = result["max_abs_delta_pt"] < args.budget_pt or (
        "max_abs_chaos_envelope_pt" in result
        and result["max_abs_delta_pt"]
        <= result["max_abs_chaos_envelope_pt"]
    )
    return 0 if ok else 1


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
    p_play.add_argument("--export-html", default="",
                        help="write an interactive HTML sequence player (RViz "
                             "playback substitute) to this path")
    p_play.add_argument("--html-every", type=int, default=5,
                        help="record every Nth scan into the HTML player")
    p_play.add_argument("--html-max-frames", type=int, default=400)
    p_play.add_argument("--html-3d-every", type=int, default=0,
                        help="embed a packed 3-D cloud (perspective view "
                             "toggle) for every Nth RECORDED frame in the "
                             "HTML player (0 = off; ~0.7 MB each, capped "
                             "at 40)")
    p_play.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="serve a LIVE browser viewer of the running "
                             "sequence on this port (0 = ephemeral; every "
                             "--html-every scans; the RViz live-view "
                             "substitute)")
    p_play.add_argument("--serve-linger", type=int, default=-1,
                        help="seconds to keep the live viewer up after the "
                             "sequence ends (-1 = until Ctrl-C, 0 = exit "
                             "immediately)")
    p_play.add_argument("--rate", type=float, default=0.0,
                        help="real-time pacing factor (0 = as fast as possible)")
    _add_common(p_play)
    p_play.set_defaults(func=cmd_playback)

    p_acc = sub.add_parser(
        "accuracy",
        help="pipeline-vs-golden metric deltas on adversarial synthetic data",
    )
    p_acc.add_argument("--scans", type=int, default=120)
    p_acc.add_argument("--seed", type=int, default=17)
    p_acc.add_argument("--beams", type=int, default=64)
    p_acc.add_argument("--azimuth", type=int, default=1800)
    p_acc.add_argument("--step", type=float, default=1.2, help="metres per scan")
    p_acc.add_argument("--benign", action="store_true",
                       help="use the benign scene generator instead")
    p_acc.add_argument("--world", choices=("", "kitti"), default="",
                       help="kitti: the KITTI-operating-point urban world "
                            "(scored profile tuned to the reference's "
                            "seq-00 table, ~98-99%% recall regime -- the "
                            "ACCURACY_r4.md campaign generator); default: "
                            "the adversarial (or --benign) world")
    p_acc.add_argument("--variant", choices=("city", "forward"),
                       default="city",
                       help="kitti world drive plan: city = cruise + stop "
                            "+ reverse + exact-half-cell + moving cars; "
                            "forward = pure cruise")
    p_acc.add_argument("--rain", type=float, default=0.0,
                       help="kitti world rain rate (ring dropout + "
                            "airborne clutter), e.g. 0.15")
    p_acc.add_argument("--output", default="", help="markdown artifact path")
    p_acc.add_argument("--budget-pt", type=float, default=0.1,
                       help="max |delta| in percentage points for exit code 0")
    p_acc.add_argument("--chaos-control", action="store_true",
                       help="also run a perturbed golden to measure the "
                            "scene's intrinsic metric sensitivity (see "
                            "--chaos-mode); deltas within that envelope "
                            "also exit 0")
    p_acc.add_argument("--chaos-mode", choices=("ulp", "perm"),
                       default="ulp",
                       help="ulp: +-1-ulp variance nudge (the rounding-tie "
                            "class that separates any two valid engines); "
                            "perm: point-order permutation (the racing-"
                            "thread order class; measured bitwise-stable)")
    p_acc.add_argument("--dimension", type=float, default=120.0)
    p_acc.add_argument("--resolution", type=float, default=0.33)
    p_acc.add_argument("--max-points", type=int, default=131072)
    p_acc.add_argument("--sorted", dest="sorted_scans", action="store_true",
                       default=None)
    p_acc.add_argument("--no-sorted", dest="sorted_scans", action="store_false")
    p_acc.set_defaults(func=cmd_accuracy)

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
