"""Spatially-sharded detect stencil == single-chip result, bit for bit."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import detect as detectlib
from groundgrid_tpu.parallel.spatial import make_sharded_detect, spatial_sharding


@pytest.fixture(scope="module")
def cfg():
    # 48x48 cells -> divisible by the 8 virtual devices
    return GroundGridConfig(dimension=24.0, resolution=0.5, max_points=4096,
                            ray_steps=28, max_outlier_candidates=256)


def test_sharded_detect_exact(cfg):
    n = cfg.cell_count
    assert n % 8 == 0
    rng = np.random.default_rng(0)
    counts = rng.poisson(3, (n, n)).astype(np.float32)
    variance = np.abs(rng.normal(0, 1e-3, (n, n))).astype(np.float32)
    min_gh = rng.normal(0, 0.5, (n, n)).astype(np.float32)
    min_gh[counts == 0] = np.float32(np.finfo(np.float32).max)
    ground = rng.normal(0, 0.5, (n, n)).astype(np.float32)
    conf = rng.uniform(0, 1, (n, n)).astype(np.float32)

    tables = detectlib.make_tables(cfg)
    ref_g, ref_c = detectlib.detect_ground_patches(
        cfg, tables, jnp.asarray(counts), jnp.asarray(variance),
        jnp.asarray(min_gh), jnp.asarray(ground), jnp.asarray(conf),
    )

    mesh = Mesh(np.array(jax.devices()), ("space",))
    sharded = make_sharded_detect(cfg, mesh)
    sh = spatial_sharding(mesh)
    args = [jax.device_put(jnp.asarray(a), sh)
            for a in (counts, variance, min_gh, ground, conf)]
    got_g, got_c = sharded(*args)

    # reduce_window reassociates differently on the haloed shard arrays, so
    # agreement is float32-rounding-level rather than bitwise
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref_g), atol=1e-5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c), atol=1e-6)


def test_indivisible_grid_rejected(cfg):
    bad = GroundGridConfig(dimension=24.5, resolution=0.5, max_points=4096,
                           ray_steps=30, max_outlier_candidates=256)
    mesh = Mesh(np.array(jax.devices()), ("space",))
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_detect(bad, mesh)


def test_spatial_step_banded_spiral_exact(small_config):
    """spiral_mode='banded' == spiral_mode='replicated' across a real step.

    The two spatial variants run the identical XLA ring sweep (one banded
    over the mesh with ppermute handoffs, one replicated per chip), so the
    full step outputs must agree bitwise.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.parallel.spatial import make_spatial_step, spatial_sharding

    cfg = small_config
    mesh = Mesh(np.array(jax.devices()), ("space",))
    step_r = make_spatial_step(cfg, mesh, spiral_mode="replicated")
    step_b = make_spatial_step(cfg, mesh, spiral_mode="banded")
    grid_sh = spatial_sharding(mesh)
    pt_sh = NamedSharding(mesh, P("space"))
    rep_sh = NamedSharding(mesh, P())

    from groundgrid_tpu.pipeline import init_state, pad_scan

    sr = sb = None
    for pts, lbl, T in adversarial_sequence(2, seed=9, n_beams=16, n_azimuth=500):
        scan = pad_scan(cfg, pts, lbl, T)
        if sr is None:
            st = init_state(cfg, np.asarray(T, np.float32))
            put = lambda a, sh: jax.device_put(np.asarray(a), sh)
            sr = [put(st.ground, grid_sh), put(st.groundpatch, grid_sh),
                  put(st.center, rep_sh)]
            sb = [put(st.ground, grid_sh), put(st.groundpatch, grid_sh),
                  put(st.center, rep_sh)]
        sharded_scan = jax.tree.map(
            lambda a: jax.device_put(
                np.asarray(a), pt_sh if np.asarray(a).ndim == 1 else rep_sh
            ),
            scan,
        )
        *sr, lab_r, out_r = step_r(sr[0], sr[1], sr[2], sharded_scan)
        *sb, lab_b, out_b = step_b(sb[0], sb[1], sb[2], sharded_scan)
        np.testing.assert_array_equal(np.asarray(sr[0]), np.asarray(sb[0]))
        np.testing.assert_array_equal(np.asarray(sr[1]), np.asarray(sb[1]))
        np.testing.assert_array_equal(np.asarray(lab_r), np.asarray(lab_b))
        np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_b))


def test_spatial_step_matches_single_chip(small_config):
    """Full spatially-sharded step == single-chip step over multiple scans."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from groundgrid_tpu.data.synthetic import synthetic_sequence
    from groundgrid_tpu.parallel.spatial import make_spatial_step, spatial_sharding
    from groundgrid_tpu.pipeline import init_state, make_step, pad_scan

    cfg = small_config
    n = cfg.cell_count
    mesh = Mesh(np.array(jax.devices()), ("space",))
    n_dev = mesh.devices.size
    assert n % n_dev == 0 and cfg.max_points % n_dev == 0

    step1 = make_step(cfg)
    step_s = make_spatial_step(cfg, mesh)
    grid_sh = spatial_sharding(mesh)
    pt_sh = NamedSharding(mesh, P("space"))
    rep_sh = NamedSharding(mesh, P())

    state = g_rows = None
    total = agree = 0
    for pts, lbl, T in synthetic_sequence(3, seed=5, n_beams=16, n_azimuth=500):
        scan = pad_scan(cfg, pts, lbl, T)
        if state is None:
            state = init_state(cfg, np.asarray(T, np.float32))
            g_rows = jax.device_put(np.asarray(state.ground), grid_sh)
            c_rows = jax.device_put(np.asarray(state.groundpatch), grid_sh)
            center = jax.device_put(np.asarray(state.center), rep_sh)
        sharded_scan = jax.tree.map(
            lambda a: jax.device_put(
                np.asarray(a), pt_sh if np.asarray(a).ndim == 1 else rep_sh
            ),
            scan,
        )
        state, out = step1(state, scan)
        g_rows, c_rows, center, labels, outlier = step_s(
            g_rows, c_rows, center, sharded_scan
        )
        np.testing.assert_allclose(
            np.asarray(g_rows), np.asarray(state.ground), atol=2e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(c_rows), np.asarray(state.groundpatch), atol=1e-5, rtol=1e-5
        )
        lbl1 = np.asarray(out.labels)
        lbl2 = np.asarray(labels)
        total += lbl1.size
        agree += int((lbl1 == lbl2).sum())
    assert agree / total > 0.9995, f"label agreement {agree/total:.5%}"
