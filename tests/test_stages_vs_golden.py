"""Stage-level parity: every JAX stage vs the sequential NumPy golden oracle.

Strategy (SURVEY.md section 7): stages whose math is order-free (rasterize,
detect, classify, outliers) must match the golden implementation to float32
tolerance when given identical inputs. The spiral interpolation is an exact
affine-recurrence parallelization of the sequential walk, so its test asserts
near-equality too (up to f32 reassociation in the parallel scans).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from groundgrid_tpu.core import classify as classifylib
from groundgrid_tpu.core import detect as detectlib
from groundgrid_tpu.core import grid as gridlib
from groundgrid_tpu.core import interpolate as interplib
from groundgrid_tpu.core import outliers as outlierlib
from groundgrid_tpu.core import rasterize as rasterlib
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.golden import GoldenGroundGrid
from tests.conftest import assert_layers_close


@pytest.fixture(scope="module")
def golden_run(small_config, small_scans):
    """Run the golden engine over the scans, recording per-scan artifacts."""
    cfg = small_config
    eng = GoldenGroundGrid(cfg)
    records = []
    for pts_velo, labels, T in small_scans:
        mv, mb, bm = tf.scan_poses(T)
        pts_map = (pts_velo @ np.asarray(mv[:3, :3], np.float32).T) + np.asarray(
            mv[:3, 3], np.float32
        )
        origin = np.asarray(mv[:3, 3], np.float32)
        eng.update_odom(np.asarray(T, np.float64), np.asarray(bm, np.float64))
        pre_state = (
            eng.state.ground.copy(),
            eng.state.groundpatch.copy(),
            eng.state.center.copy(),
        )
        out_labels = eng.filter_cloud(pts_map, labels, origin, np.asarray(mb, np.float64))
        records.append(
            dict(
                pts_map=pts_map,
                rings=labels.astype(np.int32),
                origin=origin,
                poses=(mv, mb, bm),
                pre_state=pre_state,
                labels=out_labels,
                scratch={k: v.copy() for k, v in eng.scratch.items()},
                snapshots={
                    k: tuple(a.copy() for a in v)
                    for k, v in eng.snapshots.items()
                },
                outliers=np.array(eng.last_outliers, dtype=np.int64),
                ignored=np.array(eng.last_ignored, dtype=np.int64),
            )
        )
    return records


def _binning(cfg, rec):
    center = jnp.asarray(rec["pre_state"][2], jnp.float32)
    pm = rec["pts_map"]
    x, y, z = (jnp.asarray(pm[:, 0]), jnp.asarray(pm[:, 1]), jnp.asarray(pm[:, 2]))
    valid = jnp.ones(pm.shape[0], dtype=bool)
    return (
        rasterlib.bin_points(
            cfg, center, x, y, z, jnp.asarray(rec["rings"]), valid, jnp.asarray(rec["origin"])
        ),
        center,
        (x, y, z),
    )


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_binning_and_ignored(small_config, golden_run, scan_idx):
    cfg = small_config
    rec = golden_run[scan_idx]
    binning, _, _ = _binning(cfg, rec)
    got_ignored = set(np.nonzero(np.asarray(binning.ignored))[0].tolist())
    assert got_ignored == set(rec["ignored"].tolist())


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_outliers_match(small_config, golden_run, scan_idx):
    cfg = small_config
    rec = golden_run[scan_idx]
    binning, center, (x, y, z) = _binning(cfg, rec)
    ground = jnp.asarray(rec["pre_state"][0])
    patch = jnp.asarray(rec["pre_state"][1])
    out = outlierlib.detect_outliers(
        cfg, center, ground, patch, binning, x, y, z, jnp.asarray(rec["origin"])
    )
    got = set(np.nonzero(np.asarray(out))[0].tolist())
    expect = set(rec["outliers"].tolist())
    assert got == expect, f"outliers differ: extra={got - expect}, missing={expect - got}"


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_rasterize_layers(small_config, golden_run, scan_idx):
    cfg = small_config
    rec = golden_run[scan_idx]
    binning, center, (x, y, z) = _binning(cfg, rec)
    outlier = np.zeros(x.shape[0], dtype=bool)
    outlier[rec["outliers"]] = True
    accept = binning.inmap & ~binning.ignored & ~jnp.asarray(outlier)
    raster = rasterlib.rasterize(cfg, binning, z, jnp.asarray(rec["origin"]), accept)

    sc = rec["scratch"]
    # counts are exact
    np.testing.assert_array_equal(np.asarray(raster.points_raw), sc["pointsRaw"])
    n = cfg.cell_count
    cell = np.asarray(binning.cell)
    acc_np = np.asarray(accept)
    counts = np.bincount(cell[acc_np], minlength=n * n + 1)[: n * n].reshape(n, n)
    np.testing.assert_array_equal(np.asarray(raster.points), counts.astype(np.float32))
    assert_layers_close(raster.ground_candidates, sc["groundCandidates"], "groundCandidates", atol=2e-4)
    assert_layers_close(raster.mean_variance, sc["meanVariance"], "meanVariance", atol=2e-4)
    assert_layers_close(raster.plane_dist, sc["planeDist"], "planeDist", atol=2e-4)
    assert_layers_close(raster.min_ground_height, sc["minGroundHeight"], "minGroundHeight", atol=1e-5)
    assert_layers_close(raster.max_ground_height, sc["maxGroundHeight"], "maxGroundHeight", atol=1e-5)
    assert_layers_close(raster.m2, sc["m2"], "m2", atol=5e-3, rtol=1e-3)
    assert_layers_close(raster.variance, sc["variance"], "variance", atol=1e-5, rtol=1e-3)


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_single_point_cells_have_exactly_zero_variance(
    small_config, golden_run, scan_idx
):
    """count <= 1 cells must report m2 == variance == 0.0 EXACTLY.

    XLA contracts the shifted-sum m2 subtraction into an FMA, which left a
    ~ulp(pdc^2) phantom residue on single-point cells; detect's
    ``maxVar > 0`` test (GroundSegmentation.cpp:382) then took the main
    update on cells the reference skips (AUDIT.md #4 forensic -- the bulk
    of the round-3 accuracy divergence). Regression: bitwise zero, both
    with and without the per-cell plane conditioning shift.
    """
    cfg = small_config
    rec = golden_run[scan_idx]
    binning, center, (x, y, z) = _binning(cfg, rec)
    accept = binning.inmap & ~binning.ignored
    for kwargs in (
        dict(),
        dict(center=center, t_base_map=jnp.asarray(np.eye(4, dtype=np.float32))),
    ):
        raster = rasterlib.rasterize(
            cfg, binning, z, jnp.asarray(rec["origin"]), accept, **kwargs
        )
        counts = np.asarray(raster.points)
        m2 = np.asarray(raster.m2)
        var = np.asarray(raster.variance)
        single = counts <= 1.0
        assert single.any()
        np.testing.assert_array_equal(m2[single], 0.0)
        np.testing.assert_array_equal(var[single], 0.0)


def test_m2_zeroness_matches_welford(small_config):
    """m2 zeroness must equal sequential Welford's (GroundSegmentation.cpp:298).

    Welford yields m2 == 0.0 EXACTLY iff every accepted pd in the cell is
    identical; the shifted-sum form leaves a ~1e-9 residue on identical-pd
    cells and its low clamp can zero 1-2-ulp spreads that Welford keeps
    positive. Both directions flipped detect's maxVar > 0 gate (the round-3
    residual divergence seed after ds binning). Regression: a crafted scan
    with (a) a multi-point identical-pd cell -> m2 == variance == 0.0
    bitwise, (b) a 1-ulp-spread cell -> m2 > 0 AND variance > 0 (the floor
    must survive the count division without flushing subnormal), (c) a
    real-spread cell -> genuine positive m2. Checked on both the scatter
    and the sorted-kernel (interpret) paths.
    """
    import unittest.mock as mock

    from groundgrid_tpu.core.rasterize import Binning

    cfg = small_config
    n = cfg.cell_count
    z_a = np.float32(1.25)
    z_b = np.float32(2.0)
    z_b1 = np.nextafter(z_b, np.float32(3.0), dtype=np.float32)
    pts = {  # cell -> z values (cells distinct, interior)
        (10, 10): [z_a, z_a, z_a],          # identical
        (12, 12): [z_b, z_b1],              # 1-ulp spread
        (14, 14): [np.float32(0.5), np.float32(1.7)],  # real spread
    }
    cap = 512  # one kernel chunk
    cells = np.full((cap,), n * n, np.int32)
    zs = np.zeros((cap,), np.float32)
    acc = np.zeros((cap,), bool)
    k = 0
    for (i0, i1), vals in pts.items():
        for v in vals:
            cells[k] = i0 * n + i1
            zs[k] = v
            acc[k] = True
            k += 1
    order = np.argsort(cells, kind="stable")
    cells, zs, acc = cells[order], zs[order], acc[order]
    gi0 = (cells // n).astype(np.int32)
    gi1 = (cells % n).astype(np.int32)
    binning = Binning(
        gi0=jnp.asarray(gi0), gi1=jnp.asarray(gi1), cell=jnp.asarray(cells),
        inmap=jnp.asarray(acc), ignored=jnp.zeros((cap,), bool),
        sqdist=jnp.zeros((cap,), jnp.float32),
    )
    origin = jnp.asarray(np.array([0.0, 0.0, 0.8], np.float32))

    def check(raster):
        m2 = np.asarray(raster.m2)
        var = np.asarray(raster.variance)
        assert m2[10, 10] == 0.0 and var[10, 10] == 0.0
        assert m2[12, 12] > 0.0 and var[12, 12] > 0.0
        assert m2[14, 14] > 0.0 and var[14, 14] > 0.0

    check(rasterlib.rasterize(cfg, binning, jnp.asarray(zs), origin,
                              jnp.asarray(acc)))
    from groundgrid_tpu.ops.pallas_raster import raster_sums as _rs

    with mock.patch(
        "groundgrid_tpu.ops.pallas_raster.raster_sums",
        lambda cell, cols, exact, n2: _rs(cell, cols, exact, n2,
                                          interpret=True),
    ):
        check(rasterlib.rasterize_sorted(cfg, binning, jnp.asarray(zs),
                                         origin, jnp.asarray(acc)))


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_detect_with_golden_inputs(small_config, golden_run, scan_idx):
    """Feed detect the golden's own layers -> outputs must match closely."""
    cfg = small_config
    rec = golden_run[scan_idx]
    sc = rec["scratch"]
    tables = detectlib.make_tables(cfg)
    # golden's "points" layer was zeroed & reused for non-ground counts during
    # classification; rebuild the pre-classification count layer exactly.
    binning, center, (x, y, z) = _binning(cfg, rec)
    outlier = np.zeros(x.shape[0], dtype=bool)
    outlier[rec["outliers"]] = True
    accept = np.asarray(binning.inmap) & ~np.asarray(binning.ignored) & ~outlier
    n = cfg.cell_count
    cell = np.asarray(binning.cell)
    counts = np.bincount(cell[accept], minlength=n * n + 1)[: n * n].reshape(n, n).astype(np.float32)

    g0, c0 = rec["snapshots"]["pre_detect"]
    g1, c1 = rec["snapshots"]["post_detect"]
    new_g, new_c = detectlib.detect_ground_patches(
        cfg,
        tables,
        jnp.asarray(counts),
        jnp.asarray(sc["variance"]),
        jnp.asarray(sc["minGroundHeight"]),
        jnp.asarray(g0),
        jnp.asarray(c0),
    )
    assert_layers_close(new_g, g1, "ground(post-detect)", atol=1e-4)
    assert_layers_close(new_c, c1, "groundpatch(post-detect)", atol=1e-5)


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_spiral_exact(small_config, golden_run, scan_idx):
    """Affine-scan spiral == sequential walk up to f32 reassociation."""
    cfg = small_config
    rec = golden_run[scan_idx]
    g1, c1 = rec["snapshots"]["post_detect"]
    g2, c2 = rec["snapshots"]["post_spiral"]
    mb = rec["poses"][1]
    new_g, new_c = interplib.spiral_interpolation(
        cfg, jnp.asarray(g1), jnp.asarray(c1), float(mb[2, 3])
    )
    assert_layers_close(new_g, g2, "ground(post-spiral)", atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(new_c), c2)


@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_classify_with_golden_inputs(small_config, golden_run, scan_idx):
    cfg = small_config
    rec = golden_run[scan_idx]
    binning, center, (x, y, z) = _binning(cfg, rec)
    outlier = np.zeros(x.shape[0], dtype=bool)
    outlier[rec["outliers"]] = True
    ground, _ = rec["snapshots"]["post_spiral"]
    res = classifylib.classify(
        cfg,
        binning,
        z,
        jnp.asarray(ground),
        jnp.asarray(rec["scratch"]["variance"]),
        jnp.asarray(outlier),
    )
    got = np.asarray(res.labels)
    expect = rec["labels"]
    mismatch = got != expect
    assert mismatch.sum() == 0, (
        f"{mismatch.sum()}/{len(expect)} label mismatches; "
        f"first: idx={np.nonzero(mismatch)[0][:10]}"
    )


def test_outliers_empty_scan(small_config):
    """A zero-point scan returns an empty mask (regression: the chunk-count
    ceil-div used to raise ZeroDivisionError when k_max clamped to 0)."""
    cfg = small_config
    n = cfg.cell_count
    empty = jnp.zeros((0,), jnp.float32)
    binning = rasterlib.bin_points(
        cfg, jnp.zeros(2), empty, empty, empty,
        jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool), jnp.zeros(3),
    )
    out = outlierlib.detect_outliers(
        cfg, jnp.zeros(2), jnp.zeros((n, n)), jnp.zeros((n, n)),
        binning, empty, empty, empty, jnp.zeros(3),
    )
    assert out.shape == (0,) and out.dtype == bool
