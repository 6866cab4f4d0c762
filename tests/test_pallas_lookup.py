"""Sorted-point table lookup: Pallas kernel (interpret mode) + its classify /
outlier-candidate integration equivalence vs the XLA gather path.

The compiled-kernel path is TPU-only and exercised by tpu_system_check.py on
hardware; here the kernel logic runs in interpreter mode on the CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp

from groundgrid_tpu.core import classify as classifylib
from groundgrid_tpu.core import outliers as outlierlib
from groundgrid_tpu.core import rasterize as rasterlib
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.ops.pallas_lookup import sorted_lookup


def _ref(cell, table, n2):
    padded = np.concatenate([np.asarray(table).reshape(-1), np.zeros(1, np.float32)])
    return padded[np.minimum(cell, n2)]


def test_lookup_random_sorted():
    rng = np.random.default_rng(0)
    n2 = 96 * 96
    p = 4096
    cell = np.sort(rng.integers(0, n2 + 1, p)).astype(np.int32)
    tA = rng.standard_normal(n2).astype(np.float32)
    tB = rng.standard_normal((96, 96)).astype(np.float32)  # (N, N) form
    outA, outB = sorted_lookup(
        jnp.asarray(cell), [jnp.asarray(tA), jnp.asarray(tB)], n2, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(outA), _ref(cell, tA, n2))
    np.testing.assert_array_equal(np.asarray(outB), _ref(cell, tB, n2))


def test_lookup_edge_distributions():
    rng = np.random.default_rng(1)
    n2 = 96 * 96
    p = 2048
    t = rng.standard_normal(n2).astype(np.float32)
    for cell in (
        np.full(p, 4711, np.int32),  # one dense cell
        np.full(p, n2, np.int32),  # all overflow/padding
        np.sort(  # block-boundary straddles
            (1024 * rng.integers(0, n2 // 1024, p) + rng.integers(-2, 3, p)).clip(0, n2)
        ).astype(np.int32),
        rng.permutation(  # UNSORTED input: slow path, still exact
            np.sort(rng.integers(0, n2 + 1, p)).astype(np.int32)
        ),
    ):
        (out,) = sorted_lookup(jnp.asarray(cell), [jnp.asarray(t)], n2, interpret=True)
        np.testing.assert_array_equal(np.asarray(out), _ref(cell, t, n2))


def test_lookup_large_table_unroll4():
    """Tables > 256 blocks take the 4x-unrolled block loop (the 1200^2
    stress path): membership masks must ignore the clamped over-reads at the
    table end, and b0//unroll rounding must not skip a candidate block."""
    from groundgrid_tpu.ops import pallas_lookup as pl_mod

    rng = np.random.default_rng(4)
    n2 = 600 * 600  # 352 blocks > 256 => unroll = 4
    assert pl_mod._unroll(-(-n2 // 1024)) == 4
    p = 2048
    t = rng.standard_normal(n2).astype(np.float32)
    # mix: uniform spread, last-block hits (clamp path), odd block starts
    cell = np.sort(
        np.concatenate(
            [
                rng.integers(0, n2 + 1, p - 256),
                rng.integers(n2 - 1024, n2 + 1, 128),  # table tail + overflow
                1024 * rng.integers(0, n2 // 1024, 128) + 1023,  # block edges
            ]
        )
    ).astype(np.int32)
    (out,) = sorted_lookup(jnp.asarray(cell), [jnp.asarray(t)], n2, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), _ref(cell, t, n2))


def _sorted_binning(cfg, scan):
    pts, labels, T = scan
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
    return binning, x[order], y[order], z[order], origin


def test_classify_with_lookup_matches_gather(small_config, small_scans):
    """classify(gh_var=<kernel>) == classify(<XLA gather>) on real binning."""
    cfg = small_config
    n2 = cfg.cell_count ** 2
    binning, x, y, z, origin = _sorted_binning(cfg, small_scans[0])
    rng = np.random.default_rng(2)
    ground = jnp.asarray(rng.standard_normal((cfg.cell_count,) * 2).astype(np.float32))
    variance = jnp.asarray(
        np.abs(rng.standard_normal((cfg.cell_count,) * 2)).astype(np.float32)
    )
    outlier = jnp.zeros((cfg.max_points,), bool)

    want = classifylib.classify(cfg, binning, z, ground, variance, outlier)
    gh_var = sorted_lookup(binning.cell, [ground, variance], n2, interpret=True)
    got = classifylib.classify(
        cfg, binning, z, ground, variance, outlier, gh_var=gh_var
    )
    np.testing.assert_array_equal(np.asarray(got.labels), np.asarray(want.labels))
    np.testing.assert_array_equal(
        np.asarray(got.nonground_count), np.asarray(want.nonground_count)
    )


def test_outliers_with_lookup_matches_gather(small_config, small_scans):
    """detect_outliers(old_h=<kernel>) == the XLA gather path."""
    cfg = small_config
    n2 = cfg.cell_count ** 2
    binning, x, y, z, origin = _sorted_binning(cfg, small_scans[0])
    rng = np.random.default_rng(3)
    # previous terrain above many points so candidates exist
    ground = jnp.asarray(
        (rng.standard_normal((cfg.cell_count,) * 2) + 0.5).astype(np.float32)
    )
    groundpatch = jnp.asarray(
        rng.uniform(0, 1, (cfg.cell_count,) * 2).astype(np.float32)
    )

    want = outlierlib.detect_outliers(
        cfg, jnp.zeros(2), ground, groundpatch, binning, x, y, z, origin
    )
    (old_h,) = sorted_lookup(binning.cell, [ground], n2, interpret=True)
    got = outlierlib.detect_outliers(
        cfg, jnp.zeros(2), ground, groundpatch, binning, x, y, z, origin,
        old_h=old_h,
    )
    assert np.asarray(want).sum() > 0, "test should exercise real candidates"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_outliers_u32_selection_matches_topk(small_config, small_scans,
                                             monkeypatch):
    """The packed-u32-key candidate selection == the top_k budget sort.

    Exact equality holds whenever the scan fits the march buffer (no
    overflow): both paths then select the identical candidate SET, and the
    march is order-invariant. On overflow the paths may shed different
    quantized-budget boundary ties, so the premise is asserted below with a
    cap sized to this scene.
    """
    import dataclasses

    cfg = dataclasses.replace(small_config, max_outlier_candidates=8192)
    binning, x, y, z, origin = _sorted_binning(cfg, small_scans[0])
    rng = np.random.default_rng(3)
    ground = jnp.asarray(
        (rng.standard_normal((cfg.cell_count,) * 2) + 0.5).astype(np.float32)
    )
    groundpatch = jnp.asarray(
        rng.uniform(0, 1, (cfg.cell_count,) * 2).astype(np.float32)
    )
    # premise: the scene's candidates fit the buffer (no overflow shedding)
    n = cfg.cell_count
    flat = np.clip(np.asarray(binning.cell), 0, n * n - 1)
    old_h = np.asarray(ground).reshape(-1)[flat]
    cand = (
        np.asarray(binning.inmap)
        & ~np.asarray(binning.ignored)
        & (np.asarray(z) < old_h - np.float32(0.2))
    )
    assert 0 < cand.sum() <= cfg.max_outlier_candidates, cand.sum()

    args = (cfg, jnp.zeros(2), ground, groundpatch, binning, x, y, z, origin)
    with_u32 = outlierlib.detect_outliers(*args)
    monkeypatch.setattr(outlierlib, "U32_SORT_MAX_POINTS", 0)  # force top_k
    with_topk = outlierlib.detect_outliers(*args)
    assert np.asarray(with_u32).sum() > 0
    np.testing.assert_array_equal(np.asarray(with_u32), np.asarray(with_topk))


def test_outliers_lattice_lookup_kernel_matches_gather(small_config, small_scans):
    """detect_outliers(use_lookup_kernel=True) == the XLA row-gather march.

    The kernel route sorts the march-lattice cells, reads the occlusion key
    table through sorted_lookup, and unsorts by position; equal cells read
    equal keys, so the result must be bitwise identical to the row gather.
    """
    cfg = small_config
    n2 = cfg.cell_count ** 2
    binning, x, y, z, origin = _sorted_binning(cfg, small_scans[0])
    rng = np.random.default_rng(3)
    ground = jnp.asarray(
        (rng.standard_normal((cfg.cell_count,) * 2) + 0.5).astype(np.float32)
    )
    groundpatch = jnp.asarray(
        rng.uniform(0, 1, (cfg.cell_count,) * 2).astype(np.float32)
    )
    (old_h,) = sorted_lookup(binning.cell, [ground], n2, interpret=True)

    args = (cfg, jnp.zeros(2), ground, groundpatch, binning, x, y, z, origin)
    want = outlierlib.detect_outliers(*args, old_h=old_h)
    got = outlierlib.detect_outliers(
        *args, old_h=old_h, use_lookup_kernel=True, _interpret=True
    )
    assert np.asarray(want).sum() > 0, "test should exercise real candidates"
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
