"""Streaming driver, checkpoint/resume, fleet sharding, viz export."""

import numpy as np
import pytest
import jax

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.data.semantickitti import SemanticKITTI, write_sequence
from groundgrid_tpu.data.synthetic import synthetic_sequence
from groundgrid_tpu.runtime.checkpoint import load_state, save_state
from groundgrid_tpu.runtime.driver import StreamingDriver


@pytest.fixture(scope="module")
def tiny_config():
    return GroundGridConfig(
        dimension=24.0, resolution=0.5, max_points=4096, ray_steps=28,
        max_outlier_candidates=256,
    )


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("kitti")
    scans = list(synthetic_sequence(5, seed=11, n_beams=12, n_azimuth=256, step_m=1.0))
    write_sequence(tmp, 0, [(p, l, T) for p, l, T in scans])
    return SemanticKITTI(tmp, 0)


def test_streaming_and_checkpoint_resume(tiny_config, tiny_dataset, tmp_path):
    """state(t) + scans(t+1..) == uninterrupted run, bit for bit."""
    driver = StreamingDriver(tiny_config)
    full = [driver.process(r) for r in tiny_dataset.iter_scans()]

    driver2 = StreamingDriver(tiny_config)
    for rec in list(tiny_dataset.iter_scans())[:2]:
        driver2.process(rec)
    ckpt = str(tmp_path / "state.npz")
    save_state(ckpt, driver2.state, 2, tiny_config)

    driver3 = StreamingDriver(tiny_config)
    driver3.state, next_idx, _ = load_state(ckpt, tiny_config)
    assert next_idx == 2
    resumed = [driver3.process(r) for r in list(tiny_dataset.iter_scans())[2:]]

    for a, b in zip(full[2:], resumed):
        np.testing.assert_array_equal(a.labels, b.labels)


@pytest.mark.parametrize("sorted_mode", [False, True])
def test_pipelined_run_matches_sync(tiny_config, tiny_dataset, sorted_mode):
    """run(pipeline_depth=2) == lock-step processing, bitwise, in order.

    The grid-state recurrence chains on device regardless of how far the
    host dispatches ahead, so pipelining must not change a single label --
    including in sorted-scan mode, where each scan's sort permutation must
    be restored from its OWN token, not the driver's latest.
    """
    import dataclasses

    cfg = dataclasses.replace(tiny_config, sorted_scans=sorted_mode)
    d_sync = StreamingDriver(cfg)
    want = [d_sync.process(r) for r in tiny_dataset.iter_scans()]

    d_pipe = StreamingDriver(cfg)
    got = list(d_pipe.run(tiny_dataset.iter_scans(), pipeline_depth=2))

    assert [r.index for r in got] == [r.index for r in want]
    for a, b in zip(want, got):
        np.testing.assert_array_equal(a.labels, b.labels)
        np.testing.assert_array_equal(a.outlier, b.outlier)


def test_pipelined_run_drops_bad_pose(tiny_config, tiny_dataset):
    """Degraded-mode drops work identically under pipelining."""
    recs = list(tiny_dataset.iter_scans())
    import dataclasses as dc

    bad = dc.replace(recs[1], t_map_velo=np.full((4, 4), np.nan))
    stream = [recs[0], bad] + recs[2:]
    d = StreamingDriver(tiny_config)
    got = list(d.run(iter(stream), pipeline_depth=3))
    assert [r.index for r in got] == [recs[0].index] + [r.index for r in recs[2:]]


def test_checkpoint_geometry_mismatch(tiny_config, tmp_path):
    driver = StreamingDriver(tiny_config)
    rec = next(iter_scans_once(tiny_config))
    driver.process(rec)
    ckpt = str(tmp_path / "s.npz")
    save_state(ckpt, driver.state, 1, tiny_config)
    other = GroundGridConfig(dimension=48.0, resolution=0.5, max_points=4096, ray_steps=64)
    with pytest.raises(ValueError, match="checkpoint grid"):
        load_state(ckpt, other)


def iter_scans_once(cfg):
    from groundgrid_tpu.data.semantickitti import ScanRecord

    for pts, lbl, T in synthetic_sequence(1, seed=3, n_beams=8, n_azimuth=128):
        yield ScanRecord(index=0, timestamp=0.0,
                         points=np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1),
                         labels=lbl, t_map_velo=T)


def test_fleet_step_8_devices(tiny_config):
    """Fleet shard_map over the 8 virtual CPU devices (BASELINE config 5)."""
    from groundgrid_tpu.parallel.sharding import (
        make_fleet_step, make_mesh, shard_fleet_pytree,
    )
    from groundgrid_tpu.pipeline import init_state, pad_scan

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh()
    fleet = make_fleet_step(tiny_config, mesh)

    scans, states = [], []
    for k, (pts, lbl, T) in enumerate(
        synthetic_sequence(n_dev, seed=5, n_beams=8, n_azimuth=128)
    ):
        scans.append(pad_scan(tiny_config, pts, lbl, T))
        states.append(init_state(tiny_config, T.astype(np.float32)))
    batched_scans = jax.tree.map(lambda *xs: np.stack(xs), *scans)
    batched_states = jax.tree.map(lambda *xs: np.stack(xs), *states)
    batched_scans = shard_fleet_pytree(batched_scans, mesh)
    batched_states = shard_fleet_pytree(batched_states, mesh)

    new_states, outs, summary = fleet(batched_states, batched_scans)
    jax.block_until_ready(summary)
    assert outs.labels.shape[0] == n_dev
    total = int(summary.ground_points) + int(summary.nonground_points)
    assert total > 0

    # fleet results must equal per-vehicle sequential results
    from groundgrid_tpu.pipeline import make_step

    step = make_step(tiny_config)
    labels_b = np.asarray(outs.labels)
    for k in range(n_dev):
        st_k = init_state(tiny_config, np.asarray(scans[k].t_map_velo))
        _, out_k = step(st_k, scans[k])
        np.testing.assert_array_equal(labels_b[k], np.asarray(out_k.labels))


def test_viz_export(tiny_config, tiny_dataset, tmp_path):
    from groundgrid_tpu.runtime.viz import export_layers, terrain_artifact

    driver = StreamingDriver(tiny_config, with_aux=True)
    res = driver.process(next(tiny_dataset.iter_scans()))
    paths = export_layers(res.aux, str(tmp_path))
    assert len(paths) == len(res.aux)
    for p in paths:
        with open(p, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"
    art = terrain_artifact(res.aux["ground"], res.aux["points_raw"])
    assert art.shape == (tiny_config.cell_count, tiny_config.cell_count, 3)
    assert np.isfinite(art[..., 0]).all()


def test_reconfigure_mid_sequence(tiny_config, tiny_dataset):
    """Hot parameter change: grid state survives compatible reconfigs."""
    import dataclasses

    driver = StreamingDriver(tiny_config)
    recs = list(tiny_dataset.iter_scans())
    driver.process(recs[0])
    ground_before = np.asarray(driver.state.ground).copy()

    # compatible change (same geometry): state kept, pipeline rebuilt
    cfg2 = dataclasses.replace(tiny_config, outlier_tolerance=0.2)
    driver.reconfigure(cfg2)
    assert driver.state is not None
    np.testing.assert_array_equal(np.asarray(driver.state.ground), ground_before)
    res = driver.process(recs[1])
    assert (res.labels > 0).any()

    # geometry change: state reset (reference re-creates the map)
    cfg3 = dataclasses.replace(tiny_config, dimension=32.0, ray_steps=42)
    driver.reconfigure(cfg3)
    assert driver.state is None
    res = driver.process(recs[2])
    assert (res.labels > 0).any()


def test_fleet_driver_matches_streaming(tiny_config):
    """FleetDriver lock-step over 8 sequences == 8 independent StreamingDrivers."""
    from groundgrid_tpu.runtime.fleet import FleetDriver
    from groundgrid_tpu.data.semantickitti import ScanRecord

    n_dev = len(jax.devices())
    sequences = []
    for v in range(n_dev):
        recs = []
        for k, (pts, lbl, T) in enumerate(
            synthetic_sequence(2, seed=20 + v, n_beams=8, n_azimuth=128)
        ):
            recs.append(ScanRecord(
                index=k, timestamp=0.1 * k,
                points=np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1),
                labels=lbl, t_map_velo=T,
            ))
        sequences.append(recs)

    fleet = FleetDriver(tiny_config, batch=n_dev)
    ticks = list(fleet.run(sequences))
    assert len(ticks) == 2
    assert ticks[0].ground_points + ticks[0].nonground_points > 0

    for v in range(n_dev):
        driver = StreamingDriver(tiny_config)
        for k, rec in enumerate(sequences[v]):
            res = driver.process(rec)
            np.testing.assert_array_equal(
                ticks[k].labels[v][: res.n_points], res.labels
            )


def test_fleet_driver_sorted_matches_streaming(tiny_config):
    """Sorted-scan fleet (lax.map batching + host prep) == sorted streaming."""
    import dataclasses

    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.runtime.fleet import FleetDriver

    cfg = dataclasses.replace(tiny_config, sorted_scans=True)
    n_dev = len(jax.devices())
    sequences = []
    for v in range(n_dev):
        recs = []
        for k, (pts, lbl, T) in enumerate(
            synthetic_sequence(2, seed=40 + v, n_beams=8, n_azimuth=128)
        ):
            recs.append(ScanRecord(
                index=k, timestamp=0.1 * k,
                points=np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1),
                labels=lbl, t_map_velo=T,
            ))
        sequences.append(recs)

    fleet = FleetDriver(cfg, batch=n_dev)
    ticks = list(fleet.run(sequences))
    assert len(ticks) == 2
    assert ticks[0].ground_points + ticks[0].nonground_points > 0

    for v in range(n_dev):
        driver = StreamingDriver(cfg)
        for k, rec in enumerate(sequences[v]):
            res = driver.process(rec)
            np.testing.assert_array_equal(
                ticks[k].labels[v][: res.n_points], res.labels
            )


def test_stale_pose_drop_vs_reuse(tiny_config, tiny_dataset):
    """Non-finite pose mid-sequence: default drops the scan untouched
    (GroundGridNodelet.cpp:133-136); stale_pose_reuse=True reuses the last
    good transform and still produces a result (GroundGrid.cpp:102-114)."""
    import dataclasses

    records = [tiny_dataset.read_scan(i) for i in range(3)]
    bad = dataclasses.replace(
        records[1], t_map_velo=np.full((4, 4), np.nan, np.float64)
    )

    drop = StreamingDriver(tiny_config)
    results = [drop.process(r) for r in (records[0], bad, records[2])]
    assert results[1] is None and results[0] is not None and results[2] is not None

    reuse_cfg = dataclasses.replace(tiny_config, stale_pose_reuse=True)
    reuse = StreamingDriver(reuse_cfg)
    r0 = reuse.process(records[0])
    r1 = reuse.process(bad)
    assert r0 is not None and r1 is not None
    # the reused pose is record 0's: the bad scan classifies like a re-send
    assert set(np.unique(r1.labels)) <= {0, 49, 99}
    # with no good pose yet, even reuse mode must drop
    fresh = StreamingDriver(reuse_cfg)
    assert fresh.process(bad) is None


def test_stale_pose_prepared_record_always_drops(tiny_config, caplog):
    """Host-prepared (native-loader) records with a bad pose are dropped even
    under stale_pose_reuse: the points were already binned/sorted against the
    bad pose, so reuse would classify against the wrong center. The policy is
    asserted (VERDICT r2 item 7) rather than silent: a warning is logged.
    """
    import dataclasses
    import logging

    from groundgrid_tpu.data.native_loader import PreparedRecord

    cfg = dataclasses.replace(
        tiny_config, sorted_scans=True, stale_pose_reuse=True, max_points=4096
    )
    drv = StreamingDriver(cfg)
    bad = PreparedRecord(
        index=0, timestamp=0.0, scan=object(), order=np.arange(4096),
        n_points=10, labels=np.zeros(10, np.int32),
        t_map_velo=np.full((4, 4), np.nan, np.float64),
    )
    with caplog.at_level(logging.WARNING, logger="groundgrid_tpu.runtime.driver"):
        assert drv.process(bad) is None
    assert any("dropping scan" in r.message for r in caplog.records)


def test_halfcell_tie_snap_matches_golden():
    """Exact half-cell odometry: grid center must track grid_map's f64 snap.

    grid_map resolves the half-cell snap tie in double precision
    (getIndexShiftFromPositionShift); a snap computed from f32 position
    deltas misrounds it for most |position| (the r4 KITTI-operating-point
    campaign measured a transient one-cell grid misalignment through its
    half-cell drive segment). The driver must ship the host CenterTracker's
    f64 center in EVERY mode, so the device center reconstructs golden's
    bitwise. Start x = 100.0 is a known-diverging start for the f32
    fallback (k-sequence flips at step 5 of 8).
    """
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.golden import GoldenGroundGrid

    cfg = GroundGridConfig(
        dimension=24.0, resolution=0.33, max_points=2048, ray_steps=28,
        max_outlier_candidates=256,
    )
    driver = StreamingDriver(cfg)
    golden = GoldenGroundGrid(cfg)
    rng = np.random.default_rng(5)
    pts_velo = np.concatenate(
        [rng.uniform(-8, 8, (512, 2)), rng.uniform(-1.6, -1.4, (512, 1)),
         np.zeros((512, 1))], axis=1,
    ).astype(np.float32)
    lbl = np.full(512, 40, np.int32)  # road

    x = np.float64(100.0)
    half = np.float64(cfg.resolution) / 2.0  # exact halving
    for i in range(9):
        T = np.eye(4, dtype=np.float64)
        T[0, 3] = x
        T[2, 3] = 1.7
        rec = ScanRecord(index=i, timestamp=0.1 * i, points=pts_velo,
                         labels=lbl, t_map_velo=T)
        res = driver.process(rec)
        assert res is not None
        _, _, bm = tf.scan_poses(T)
        golden.update_odom(T, np.asarray(bm, np.float64))
        dev_center = np.asarray(driver.state.center, np.float64)
        if driver.state.center_lo is not None:
            dev_center = dev_center + np.asarray(driver.state.center_lo, np.float64)
        np.testing.assert_allclose(
            dev_center, golden.state.center, rtol=0, atol=2e-13,
            err_msg=f"scan {i}: device center diverged from grid_map's f64 snap",
        )
        # the host tracker itself must be bitwise-equal to golden
        np.testing.assert_array_equal(driver.center64, golden.state.center)
        x = x + half


def test_center_tracker_fuzz_vs_golden():
    """Host CenterTracker == grid_map's f64 center recurrence, bitwise, fuzzed.

    The tracker (pipeline.CenterTracker) is the center authority shipped on
    every Scan (the 644ff47 rule); the golden oracle keeps a deliberately
    independent copy of grid_map's getIndexShiftFromPositionShift math
    (golden.py:119-124, GroundGrid.cpp:83-99). Fuzz both over adversarial
    odometry -- exact half-cell ties and near-ties (a few ulps off) at
    |position| from 0 to 1e5, (m + 1/2)-cell steps, reverse runs, zero
    steps, and teleports -- across dyadic and non-dyadic resolutions. Any
    snap-rule or accumulation drift between the two f64 recurrences breaks
    the bitwise assert immediately.
    """
    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.pipeline import CenterTracker

    rng = np.random.default_rng(20260819)
    for res in (0.05, 0.1, 0.25, 0.33, 0.5, 1.0):
        cfg = GroundGridConfig(
            dimension=32 * res, resolution=res, max_points=256,
            ray_steps=8, max_outlier_candidates=64,
        ).validate()
        res64 = np.float64(res)
        for trial in range(3):
            mag = rng.choice([0.0, 10.0, 1e3, 1e5])
            pos = rng.uniform(-1.0, 1.0, 2) * (mag + 1.0)
            golden = GoldenGroundGrid(cfg)
            tracker = None
            for step in range(120):
                T = np.eye(4, dtype=np.float64)
                T[:2, 3] = pos
                T[2, 3] = 1.7
                _, _, bm = tf.scan_poses(T)
                golden.update_odom(T, np.asarray(bm, np.float64))
                if tracker is None:
                    tracker = CenterTracker(cfg, pos)  # init adopts the pose
                else:
                    tracker.update(pos)
                np.testing.assert_array_equal(
                    tracker.center64, golden.state.center,
                    err_msg=(f"res={res} trial={trial} step={step}: "
                             f"tracker diverged from grid_map recurrence"),
                )
                kind = rng.choice(
                    ["half", "half", "near", "cells_half", "rand", "zero",
                     "teleport"],
                    p=[0.25, 0.10, 0.15, 0.15, 0.20, 0.10, 0.05],
                )
                axis = rng.integers(0, 2)
                sgn = rng.choice([-1.0, 1.0])
                if kind == "half":
                    pos[axis] += sgn * res64 / 2.0
                elif kind == "near":  # a few ulps off the exact tie
                    ulps = rng.integers(-4, 5)
                    d = res64 / 2.0
                    step_m = d if ulps == 0 else np.nextafter(
                        d, d * (2.0 if ulps > 0 else 0.0)) + (
                        abs(ulps) - 1) * np.spacing(d) * np.sign(ulps)
                    pos[axis] += sgn * step_m
                elif kind == "cells_half":
                    m = rng.integers(-3, 4)
                    pos[axis] += (m + 0.5) * res64
                elif kind == "rand":
                    pos += rng.uniform(-2.0, 2.0, 2) * res64
                elif kind == "teleport":
                    pos = rng.uniform(-1.0, 1.0, 2) * (mag + 50.0)


def test_fleet_halfcell_tie_matches_streaming(tiny_config):
    """Fleet drivers at the half-cell snap tie == streaming, bitwise.

    FleetDriver's per-vehicle CenterTrackers were seeded/updated with
    f32-cast positions until 644ff47 (the same tie-loss as the device
    fallback); this drives every vehicle through the known-diverging
    exact-half-cell segment from x = 100 + v and pins fleet == streaming
    labels plus fleet tracker == golden's f64 center recurrence.
    """
    import dataclasses

    from groundgrid_tpu.core import transforms as tf
    from groundgrid_tpu.data.semantickitti import ScanRecord
    from groundgrid_tpu.golden import GoldenGroundGrid
    from groundgrid_tpu.runtime.fleet import FleetDriver

    cfg = dataclasses.replace(tiny_config, resolution=0.33)
    n_dev = len(jax.devices())
    half = np.float64(cfg.resolution) / 2.0
    rng = np.random.default_rng(9)
    sequences = []
    for v in range(n_dev):
        pts = np.concatenate(
            [rng.uniform(-8, 8, (256, 2)), rng.uniform(-1.6, -1.4, (256, 1)),
             np.zeros((256, 1))], axis=1,
        ).astype(np.float32)
        lbl = np.full(256, 40, np.int32)
        recs = []
        x = np.float64(100.0 + v)
        for k in range(6):
            T = np.eye(4, dtype=np.float64)
            T[0, 3] = x
            T[2, 3] = 1.7
            recs.append(ScanRecord(index=k, timestamp=0.1 * k, points=pts,
                                   labels=lbl, t_map_velo=T))
            x = x + half
        sequences.append(recs)

    fleet = FleetDriver(cfg, batch=n_dev)
    ticks = list(fleet.run(sequences))
    assert len(ticks) == 6

    for v in range(n_dev):
        driver = StreamingDriver(cfg)
        golden = GoldenGroundGrid(cfg)
        for k, rec in enumerate(sequences[v]):
            res = driver.process(rec)
            _, _, bm = tf.scan_poses(rec.t_map_velo)
            golden.update_odom(rec.t_map_velo, np.asarray(bm, np.float64))
            np.testing.assert_array_equal(
                ticks[k].labels[v][: res.n_points], res.labels,
                err_msg=f"vehicle {v} scan {k}: fleet != streaming at the tie",
            )
        np.testing.assert_array_equal(
            fleet._trackers[v].center64, golden.state.center,
            err_msg=f"vehicle {v}: fleet tracker lost the f64 tie",
        )


def test_bench_fleet_smoke():
    """run_benchmark(batch>1) end to end on the CPU mesh.

    Regression: the fleet bench once built its per-vehicle states with
    jax.vmap(init_state), which broke when init_state gained a host-side
    f64 ds-center seed (the half-cell snap-tie fix) -- init_state cannot
    trace, so fleet states must be built host-side and stacked.
    """
    from groundgrid_tpu.runtime.bench import run_benchmark

    r = run_benchmark(n_scans=4, batch=2, resolution=0.5, dimension=40.0,
                      warmup=1, n_beams=8, n_azimuth=128, max_points=4096)
    assert r["value"] > 0
    assert r["extra"]["batch"] >= 2
