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
