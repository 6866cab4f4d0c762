"""Pallas spiral kernel == XLA exact spiral (interpret mode on CPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from groundgrid_tpu.core import interpolate as interplib
from groundgrid_tpu.ops.pallas_spiral import pad_size, spiral_interpolation_pallas


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(small_config, seed):
    cfg = small_config
    n = cfg.cell_count
    rng = np.random.default_rng(seed)
    ground = rng.normal(0, 0.5, (n, n)).astype(np.float32)
    conf = np.zeros((n, n), np.float32)
    mask = rng.random((n, n)) < 0.4
    conf[mask] = rng.uniform(0.0, 1.0, mask.sum()).astype(np.float32)

    g1, c1 = interplib.spiral_interpolation(cfg, jnp.asarray(ground), jnp.asarray(conf), 0.37)
    g2, c2 = spiral_interpolation_pallas(
        cfg, jnp.asarray(ground), jnp.asarray(conf), 0.37, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))


def test_pad_size():
    assert pad_size(364) == 384
    assert pad_size(80) == 128  # quad-sweep kernel has no lane-block floor
    assert pad_size(1200) == 1280
    assert pad_size(126) == 256  # 126+3 > 128


def test_pallas_matches_xla_multitier():
    """Grid big enough for >= 2 lane-window tiers (n=140 -> pad 256).

    The default 364 grid runs three tiers; interpret mode at that size is
    too slow for CI, so this covers the tier-transition machinery (carry
    re-embedding, window-offset iotas) at the smallest multi-tier size.
    """
    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.ops.pallas_spiral import _tiers

    cfg = GroundGridConfig(dimension=70.0, resolution=0.5, max_points=16384,
                           ray_steps=104)
    n = cfg.cell_count
    assert n == 140
    tiers = _tiers(pad_size(n), cfg.center_cell)
    assert len(tiers) >= 2, tiers

    rng = np.random.default_rng(7)
    ground = rng.normal(0, 0.5, (n, n)).astype(np.float32)
    conf = np.zeros((n, n), np.float32)
    mask = rng.random((n, n)) < 0.4
    conf[mask] = rng.uniform(0.0, 1.0, mask.sum()).astype(np.float32)

    g1, c1 = interplib.spiral_interpolation(cfg, jnp.asarray(ground), jnp.asarray(conf), 0.37)
    g2, c2 = spiral_interpolation_pallas(
        cfg, jnp.asarray(ground), jnp.asarray(conf), 0.37, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=2e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
