"""Sharded spiral (annular-band relay) vs the single-chip sweep.

VERDICT r2 item 3: the spiral was the one stage still replicated in spatial
mode. The banded relay (parallel/spiral_shard.py) must match the single-chip
XLA sweep bit for bit on the 8-device virtual CPU mesh -- including at the
high-res 1200^2 stress geometry (BASELINE config 4), where the sweep
dominates the scan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.interpolate import spiral_interpolation
from groundgrid_tpu.parallel.spiral_shard import banded_spiral, ring_bands


def _mesh(n=8, axis="space"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


def _random_layers(rng, n):
    g = rng.normal(size=(n, n)).astype(np.float32)
    c = rng.uniform(0.0, 1.0, size=(n, n)).astype(np.float32)
    # sprinkle damage-like zeros and init-like 1e-7s (the decay floor raises
    # them to 0.001 -- a quirk worth exercising)
    c[rng.random((n, n)) < 0.1] = 0.0
    c[rng.random((n, n)) < 0.1] = 1e-7
    return g, c


def _run_banded(config, mesh, axis, g, c, base_z):
    f = banded_spiral(config, axis, mesh.shape[axis])
    sharded = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(), P(), P()), out_specs=(P(), P()),
        check_vma=False,
    ))
    return sharded(jnp.asarray(g), jnp.asarray(c),
                   jnp.asarray(base_z, jnp.float32))


@pytest.mark.parametrize("n_shards", [2, 8])
def test_banded_matches_single_chip_small(n_shards):
    cfg = GroundGridConfig(dimension=40.0, resolution=0.5, max_points=4096,
                           ray_steps=64)
    rng = np.random.default_rng(3)
    g, c = _random_layers(rng, cfg.cell_count)
    base_z = 1.25

    want_g, want_c = spiral_interpolation(
        cfg, jnp.asarray(g), jnp.asarray(c), jnp.asarray(base_z, jnp.float32))
    mesh = _mesh(n_shards)
    got_g, got_c = _run_banded(cfg, mesh, "space", g, c, base_z)

    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


def test_banded_matches_single_chip_highres_1200():
    """BASELINE config 4 geometry: 0.1 m / 120 m => 1200^2 cells, 599 rings."""
    cfg = GroundGridConfig(resolution=0.1, max_points=4096, ray_steps=128)
    assert cfg.cell_count == 1200
    rng = np.random.default_rng(11)
    g, c = _random_layers(rng, cfg.cell_count)
    base_z = -0.4

    want_g, want_c = spiral_interpolation(
        cfg, jnp.asarray(g), jnp.asarray(c), jnp.asarray(base_z, jnp.float32))
    mesh = _mesh(8)
    got_g, got_c = _run_banded(cfg, mesh, "space", g, c, base_z)

    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(want_g))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))


def test_ring_bands_partition():
    cfg = GroundGridConfig(dimension=40.0, resolution=0.5)
    for s in (1, 2, 3, 8, 64):
        bands = ring_bands(cfg, s)
        flat = np.concatenate([b for b in bands if len(b)])
        np.testing.assert_array_equal(
            flat, np.arange(cfg.center_cell - 1, 0, -1))
        # empties only at the end (the relay chain must stay contiguous)
        sizes = [len(b) for b in bands]
        assert sizes == sorted(sizes, reverse=True)


