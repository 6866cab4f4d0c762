"""Sorted-point rasterization: Pallas kernel (interpret mode) + sorted-scan
pipeline machinery (host prep, center tracking, XLA fallback equivalence).

The compiled-kernel path is TPU-only and is exercised by the system test /
benchmark on hardware; here the kernel logic runs in interpreter mode and
the surrounding machinery runs on the CPU mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import rasterize as rasterlib
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.ops.pallas_raster import NW, build_parts, raster_sums

FLT_MAX = np.float32(np.finfo(np.float32).max)


def _numpy_sums(cell, vals, n2):
    sums = np.zeros((n2 + 1, len(vals)), np.float32)
    for k, v in enumerate(vals):
        np.add.at(sums[:, k], cell, v)
    return sums[:n2]


def _check(cell, vals, n2, exact=None):
    if exact is None:
        exact = [False] * len(vals)
    cols = raster_sums(
        jnp.asarray(cell), [jnp.asarray(v) for v in vals], exact, n2,
        interpret=True,
    )
    sums = np.stack([np.asarray(c) for c in cols], axis=1)
    ref_sums = _numpy_sums(cell, vals, n2)
    np.testing.assert_allclose(sums, ref_sums, rtol=1e-5, atol=1e-5)


def test_build_parts_split_exact():
    """The column-aware bf16 split reconstructs the f32 B matrix bit-exactly
    and packs exact (0/1) columns into a single part."""
    p = 2048
    rng = np.random.default_rng(9)
    cell = np.sort(rng.integers(0, 96 * 96 + 1, p)).astype(np.int32)
    # mixed magnitudes incl. exact powers of two and the min-column sentinel
    v = (rng.standard_normal(p) * np.exp(rng.uniform(-8, 8, p))).astype(np.float32)
    v[:4] = [0.0, np.float32(2.0**126), np.finfo(np.float32).tiny, -300.25]
    ind = rng.integers(0, 2, p).astype(np.float32)

    b, spans = build_parts(
        jnp.asarray(cell), [jnp.asarray(ind), jnp.asarray(v)], [True, False]
    )
    assert spans == (1, 3)
    c_pad = 8  # 4 real parts padded to the bitcast-reshape multiple
    assert b.shape == (NW * c_pad, p)
    b = np.asarray(b, np.float32).reshape(NW, c_pad, p)
    np.testing.assert_array_equal(b[:, 4:], 0.0)
    w = (cell // 128) % NW
    for ww in range(NW):
        sel = (w == ww).astype(np.float32)
        np.testing.assert_array_equal(b[ww, 0], sel * ind)
        np.testing.assert_array_equal(
            b[ww, 1] + b[ww, 2] + b[ww, 3], sel * v
        )


def test_kernel_random_sorted():
    n2 = 96 * 96
    p = 4096
    rng = np.random.default_rng(0)
    cell = np.sort(rng.integers(0, n2 + 1, p)).astype(np.int32)
    vals = [rng.standard_normal(p).astype(np.float32) for _ in range(5)]
    _check(cell, vals, n2)


def test_kernel_exact_columns():
    """0/1 indicator columns (single-part) sum exactly next to split columns."""
    n2 = 96 * 96
    p = 4096
    rng = np.random.default_rng(3)
    cell = np.sort(rng.integers(0, n2 + 1, p)).astype(np.int32)
    vals = [
        rng.integers(0, 2, p).astype(np.float32),
        rng.standard_normal(p).astype(np.float32),
        rng.integers(0, 2, p).astype(np.float32),
    ]
    _check(cell, vals, n2, exact=[True, False, True])


def test_kernel_edge_distributions():
    n2 = 96 * 96
    p = 2048
    rng = np.random.default_rng(1)
    vals = [rng.standard_normal(p).astype(np.float32) for _ in range(3)]

    # all points in one cell (a full dense block + empty blocks elsewhere)
    _check(np.full(p, 4711, np.int32), vals, n2)
    # all points in the overflow/padding bin
    _check(np.full(p, n2, np.int32), vals, n2)
    # points straddling block boundaries (cells around multiples of 1024)
    cell = np.sort(
        (1024 * rng.integers(0, n2 // 1024, p) + rng.integers(-2, 3, p)).clip(0, n2)
    ).astype(np.int32)
    _check(cell, vals, n2)
    # block boundaries aligned EXACTLY at chunk edges: each CHUNK-point run
    # sits in one block (exercises the chunk-granularity row_lo/row_hi
    # boundary cases -- a chunk fully below a bound vs first cell at it)
    from groundgrid_tpu.ops.pallas_raster import CHUNK

    cell = np.repeat(
        np.array([1023, 1024, 2048, 4096], np.int32), p // 4
    )
    assert (p // 4) % CHUNK == 0 or p % CHUNK == 0
    _check(np.sort(cell), vals, n2)


def test_seg_end_reduce():
    """Segmented run-reduction: value at run end, 0 elsewhere; all run sizes."""
    rng = np.random.default_rng(5)
    for cells in (
        np.sort(rng.integers(0, 600, 512)),     # mixed runs
        np.zeros(512, np.int64),                # one giant run (all levels)
        np.arange(512),                         # all runs length 1
    ):
        cells = cells.astype(np.int32)
        v = rng.standard_normal(512).astype(np.float32)
        got = np.asarray(
            rasterlib.seg_end_reduce(jnp.asarray(cells), jnp.asarray(v), jnp.minimum)
        )
        ref = np.zeros(512, np.float32)
        i = 0
        while i < 512:
            j = i
            while j + 1 < 512 and cells[j + 1] == cells[i]:
                j += 1
            ref[j] = v[i : j + 1].min()
            i = j + 1
        np.testing.assert_array_equal(got, ref)


def _interp_rs(cell, cols, exact, n2):
    return raster_sums(cell, cols, exact, n2, interpret=True)


def test_rasterize_sorted_matches_scatter(small_config, small_scans):
    """rasterize_sorted (interpret) == rasterize on identical sorted input.

    The min layer (segmented-cummin column extracted by the matmul) must be
    BITWISE equal to the scatter path's .at[].min().
    """
    cfg = small_config
    pts, labels, T = small_scans[0]
    mv, _, _ = tf.scan_poses(T)
    x, y, z = tf.transform_points_soa(np.asarray(mv), pts[:, 0], pts[:, 1], pts[:, 2])
    p = cfg.max_points
    pad = p - len(x)
    x = jnp.asarray(np.concatenate([x, np.zeros(pad, np.float32)]))
    y = jnp.asarray(np.concatenate([y, np.zeros(pad, np.float32)]))
    z = jnp.asarray(np.concatenate([z, np.zeros(pad, np.float32)]))
    rings = jnp.asarray(np.concatenate([labels, np.zeros(pad)]).astype(np.int32))
    valid = jnp.asarray((np.arange(p) < len(pts)).astype(np.int32))
    origin = jnp.asarray(mv[:3, 3])
    center = jnp.asarray(mv[:2, 3])

    binning = rasterlib.bin_points(cfg, center, x, y, z, rings, valid > 0, origin)
    order = np.argsort(np.asarray(binning.cell), kind="stable")
    binning = jax.tree.map(lambda a: a[order], binning)
    z_s = z[order]
    accept = binning.inmap & ~binning.ignored

    want = rasterlib.rasterize(cfg, binning, z_s, origin, accept, with_max=False)

    import unittest.mock as mock

    # run the Pallas kernel in interpreter mode (no TPU in CI)
    with mock.patch("groundgrid_tpu.ops.pallas_raster.raster_sums", _interp_rs):
        got = rasterlib.rasterize_sorted(cfg, binning, z_s, origin, accept)

    for name in want._fields:
        if name == "max_ground_height":
            continue  # sorted path leaves the dead layer at its reset value
        a, b = np.asarray(getattr(want, name)), np.asarray(getattr(got, name))
        if name == "min_ground_height":
            np.testing.assert_array_equal(b, a, err_msg=name)
            continue
        mask = np.isfinite(a) & (np.abs(a) < 1e30)
        np.testing.assert_allclose(
            b[mask], a[mask], rtol=1e-4, atol=1e-4, err_msg=name
        )
        np.testing.assert_array_equal(b[~mask], a[~mask], err_msg=name)


def test_prepare_scan_device_binning_sorted(small_config, small_scans):
    """Host-predicted cell order == device binning order (bit-exact path)."""
    from groundgrid_tpu.pipeline import CenterTracker, prepare_scan

    cfg = small_config
    tracker = None
    for pts, labels, T in small_scans:
        pos = T[:2, 3].astype(np.float32)
        if tracker is None:
            tracker = CenterTracker(cfg, pos)
        center = tracker.update(pos)
        scan, order = prepare_scan(cfg, pts, labels, T, center)
        binning = rasterlib.bin_points(
            cfg, scan.center, scan.px, scan.py, scan.pz, scan.rings,
            scan.valid > 0, scan.t_map_velo[:3, 3],
        )
        cell = np.asarray(binning.cell)
        assert (np.diff(cell) >= 0).all(), "device binning disagrees with host sort"
        assert order.shape == (cfg.max_points,)


def test_sorted_pipeline_matches_default(small_config, small_scans):
    """Full sorted-scan pipeline (host prep + center passing + XLA raster on
    permuted points) agrees with the default pipeline on the same stream."""
    from groundgrid_tpu.pipeline import init_state, make_step, pad_scan, prepare_scan, CenterTracker

    cfg = small_config
    sorted_cfg = GroundGridConfig(**{
        **{f.name: getattr(cfg, f.name) for f in cfg.__dataclass_fields__.values()},
        "sorted_scans": True,
    })

    step = make_step(cfg)
    step_s = make_step(sorted_cfg)
    state = state_s = None
    tracker = None
    total = agree = 0
    for pts, labels, T in small_scans:
        scan = pad_scan(cfg, pts, labels, T)
        pos = T[:2, 3].astype(np.float32)
        if tracker is None:
            tracker = CenterTracker(cfg, pos)
        scan_s, order = prepare_scan(sorted_cfg, pts, labels, T, tracker.update(pos))
        if state is None:
            state = init_state(cfg, np.asarray(T, np.float32))
            state_s = init_state(sorted_cfg, np.asarray(T, np.float32))
        state, out = step(state, scan)
        state_s, out_s = step_s(state_s, scan_s)

        lbl = np.asarray(out.labels)
        lbl_s = np.empty_like(lbl)
        lbl_s[order] = np.asarray(out_s.labels)
        total += len(lbl)
        agree += int((lbl == lbl_s).sum())
        # centers evolve identically
        np.testing.assert_array_equal(
            np.asarray(state.center), np.asarray(state_s.center)
        )
    assert agree / total > 0.999, f"sorted-vs-default agreement {agree/total:.4%}"


def test_rasterize_sorted_with_max_matches_scatter(small_config, small_scans):
    """with_max=True (aux mode): maxGroundHeight matches the scatter path
    bitwise (segmented-cummax column extracted by the matmul)."""
    cfg = small_config
    pts, labels, T = small_scans[0]
    mv, _, _ = tf.scan_poses(T)
    x, y, z = tf.transform_points_soa(np.asarray(mv), pts[:, 0], pts[:, 1], pts[:, 2])
    p = cfg.max_points
    pad = p - len(x)
    x = jnp.asarray(np.concatenate([x, np.zeros(pad, np.float32)]))
    y = jnp.asarray(np.concatenate([y, np.zeros(pad, np.float32)]))
    z = jnp.asarray(np.concatenate([z, np.zeros(pad, np.float32)]))
    rings = jnp.asarray(np.concatenate([labels, np.zeros(pad)]).astype(np.int32))
    valid = jnp.asarray((np.arange(p) < len(pts)).astype(np.int32))
    origin = jnp.asarray(mv[:3, 3])
    center = jnp.asarray(mv[:2, 3])

    binning = rasterlib.bin_points(cfg, center, x, y, z, rings, valid > 0, origin)
    order = np.argsort(np.asarray(binning.cell), kind="stable")
    binning = jax.tree.map(lambda a: a[order], binning)
    z_s = z[order]
    accept = binning.inmap & ~binning.ignored

    want = rasterlib.rasterize(cfg, binning, z_s, origin, accept, with_max=True)
    import unittest.mock as mock
    with mock.patch("groundgrid_tpu.ops.pallas_raster.raster_sums", _interp_rs):
        got = rasterlib.rasterize_sorted(cfg, binning, z_s, origin, accept, with_max=True)
    a = np.asarray(want.max_ground_height)
    b = np.asarray(got.max_ground_height)
    np.testing.assert_array_equal(b, a)
