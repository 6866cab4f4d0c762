"""End-to-end pipeline: full jitted step vs golden engine across scans.

Unlike the stage tests (identical inputs per stage), this exercises the whole
chain including the float32 transform, grid relocation between scans and the
recurrent state. The only permitted divergence is cell-boundary jitter from
f32-vs-f64 index arithmetic, so label agreement must be near-total.
"""

import numpy as np
import pytest
import jax

from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.golden import GoldenGroundGrid
from groundgrid_tpu.pipeline import init_state, make_step, pad_scan


@pytest.fixture(scope="module")
def jit_step(small_config):
    return make_step(small_config)


def test_pipeline_matches_golden_e2e(small_config, small_scans, jit_step):
    cfg = small_config
    golden = GoldenGroundGrid(cfg)
    state = None
    total = 0
    mismatches = 0
    for pts_velo, labels, T in small_scans:
        mv, mb, bm = tf.scan_poses(T)
        # golden consumes f32 map-frame points computed exactly like the pipeline
        x, y, z = tf.transform_points_soa(
            np.asarray(mv), pts_velo[:, 0], pts_velo[:, 1], pts_velo[:, 2]
        )
        pts_map = np.stack([x, y, z], axis=-1)
        golden.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        want = golden.filter_cloud(
            pts_map, labels, np.asarray(mv[:3, 3]), np.asarray(mb, np.float64)
        )

        scan = pad_scan(cfg, pts_velo, labels, T)
        if state is None:
            state = init_state(cfg, np.asarray(T, np.float32))
        state, out = jit_step(state, scan)
        got = np.asarray(out.labels)[: len(want)]

        total += len(want)
        mismatches += int((got != want).sum())

    rate = mismatches / total
    assert rate < 2e-3, f"label mismatch rate {rate:.4%} ({mismatches}/{total})"


def test_pipeline_deterministic(small_config, small_scans, jit_step):
    """Same input twice -> bitwise-identical outputs AND state.

    The reference explicitly tolerates data races (unsynchronized accumulator
    writes, SURVEY.md 2.2); determinism is this engine's contract.
    """
    cfg = small_config
    pts, labels, T = small_scans[0]
    scan = pad_scan(cfg, pts, labels, T)

    outs = []
    states = []
    for _ in range(2):
        state = init_state(cfg, np.asarray(T, np.float32))
        state, out = jit_step(state, scan)
        outs.append(np.asarray(out.labels))
        states.append(jax.device_get(state))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(np.asarray(states[0].ground), np.asarray(states[1].ground))
    np.testing.assert_array_equal(
        np.asarray(states[0].groundpatch), np.asarray(states[1].groundpatch)
    )


def test_padding_points_inert(small_config, small_scans, jit_step):
    """Padded (invalid) points must not affect results."""
    cfg = small_config
    pts, labels, T = small_scans[0]
    scan_a = pad_scan(cfg, pts, labels, T)
    # poison the padding region with garbage
    n_valid = len(pts)
    def poison(a):
        a = np.asarray(a).copy()
        a[n_valid:] = 1e6
        return a
    scan_b = scan_a._replace(px=poison(scan_a.px), py=poison(scan_a.py), pz=poison(scan_a.pz))

    sa = init_state(cfg, np.asarray(T, np.float32))
    sb = init_state(cfg, np.asarray(T, np.float32))
    sa, oa = jit_step(sa, scan_a)
    sb, ob = jit_step(sb, scan_b)
    np.testing.assert_array_equal(
        np.asarray(oa.labels)[:n_valid], np.asarray(ob.labels)[:n_valid]
    )
    np.testing.assert_array_equal(np.asarray(sa.ground), np.asarray(sb.ground))


def test_wire_format_matches_f32(small_config, small_scans):
    """s16 wire pipeline ~= f32 sorted pipeline (sub-mm quantization).

    Coordinates must match within half a wire step inside the representable
    span; beyond it they saturate, which must leave the point outside the
    map (the clamp is lossless for labels -- overflow bin both ways).
    """
    import dataclasses

    from groundgrid_tpu.pipeline import (
        CenterTracker, make_step, make_wire_step, prepare_scan,
        prepare_scan_wire, wire_scales,
    )

    cfg = dataclasses.replace(small_config, sorted_scans=True)
    step = make_step(cfg)
    wstep = make_wire_step(cfg)
    state = wstate = None
    tracker = None
    total = agree = 0
    for pts, labels, T in small_scans:
        pos = T[:2, 3].astype(np.float32)
        if tracker is None:
            tracker = CenterTracker(cfg, pos)
        center = tracker.update(pos)
        scan, order = prepare_scan(cfg, pts, labels, T, center)
        wire, worder = prepare_scan_wire(cfg, pts, labels, T, center)
        # wire payload is ~2.5x smaller
        f32_bytes = sum(np.asarray(getattr(scan, f)).nbytes
                        for f in ("px", "py", "pz", "rings", "valid"))
        wire_bytes = sum(np.asarray(getattr(wire, f)).nbytes
                         for f in ("qx", "qy", "qz", "rings"))
        assert wire_bytes * 2 < f32_bytes
        if state is None:
            state = init_state(cfg, np.asarray(T, np.float32))
            wstate = init_state(cfg, np.asarray(T, np.float32))
        state, out = step(state, scan)
        wstate, wout = wstep(wstate, wire)

        lbl = np.empty(cfg.max_points, np.int32)
        lbl[order] = np.asarray(out.labels)
        wlbl = np.empty(cfg.max_points, np.int32)
        wlbl[worder] = np.asarray(wout.labels)
        total += len(pts)
        agree += int((lbl[: len(pts)] == wlbl[: len(pts)]).sum())
        # dequantized coordinates within half a wire step in-span; saturated
        # beyond the span but still outside the map
        sxy, _ = wire_scales(cfg)
        span = 32767.0 * float(sxy)
        cx = float(np.asarray(wire.center)[0])
        x = np.empty(cfg.max_points, np.float32)
        x[worder] = np.asarray(wout.x)
        xs = np.empty(cfg.max_points, np.float32)
        xs[order] = np.asarray(out.x)
        x, xs = x[: len(pts)], xs[: len(pts)]
        in_span = np.abs(xs - cx) <= span - float(sxy)
        np.testing.assert_allclose(x[in_span], xs[in_span],
                                   atol=0.51 * float(sxy))
        clipped = ~in_span
        assert np.all(np.abs(x[clipped] - cx) > cfg.half_length), (
            "saturated wire coordinate re-entered the map")
    assert agree / total > 0.98, f"wire-vs-f32 agreement {agree/total:.4%}"


def test_wire_scales_geometry():
    """wire_scales: minimal power-of-two steps covering the map + guard."""
    import dataclasses
    import math

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.pipeline import wire_scales

    for dim, res in [(120.0, 0.33), (40.0, 0.5), (396.0, 0.33), (60.0, 0.25)]:
        cfg = GroundGridConfig(dimension=dim, resolution=res)
        sxy, sz = wire_scales(cfg)
        k = math.log2(float(sxy))
        kz = math.log2(float(sz))
        assert k == round(k), "xy step must be a power of two"
        assert kz == round(kz), "z step must be a power of two"
        span = 32767.0 * float(sxy)
        need = cfg.half_length + 2.0
        assert span >= need, "span must cover the map half-span + guard"
        assert span / 2.0 < need, "step must be the minimal such power"
        # z: one power finer than xy, unless the +/-16 m z-span floor
        # coarsens it (clamped z is a WRONG height inside the map)
        z_span = 32767.0 * float(sz)
        assert z_span >= 16.0, "z span must cover +/-16 m"
        assert float(sz) == float(sxy) / 2.0 or (
            z_span / 2.0 < 16.0 and float(sz) >= float(sxy) / 2.0
        ), "z is one power finer unless floored to the 16 m span"
    # small grid: the floor binds (40 m dim -> xy span 16 m, z span 16 m
    # at the SAME step as one-finer would give only 8 m)
    sxy, sz = wire_scales(GroundGridConfig(dimension=40.0, resolution=0.5))
    assert 32767.0 * float(sz) >= 16.0
    # default geometry lands on the documented 1.95 mm / 0.98 mm
    sxy, sz = wire_scales(GroundGridConfig())
    assert float(sxy) == 2.0 ** -9 and float(sz) == 2.0 ** -10
