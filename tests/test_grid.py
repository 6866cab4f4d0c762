"""Grid state: indexing, relocation, exposed-region re-init."""

import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.core import grid as gridlib
from groundgrid_tpu.core import transforms as tf


def test_index_roundtrip(small_config):
    cfg = small_config
    center = jnp.array([3.2, -1.7], jnp.float32)
    px, py = gridlib.cell_positions(cfg, center)
    xy = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=-1)
    idx = gridlib.position_to_index(cfg, center, xy)
    n = cfg.cell_count
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    expect = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), expect)


def test_index_convention_max_corner(small_config):
    """grid_map convention: index (0,0) is the max-position corner."""
    cfg = small_config
    center = jnp.zeros(2, jnp.float32)
    near_max = jnp.array([[cfg.half_length - 0.01, cfg.half_length - 0.01]])
    idx = gridlib.position_to_index(cfg, center, near_max)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 0]])
    near_min = jnp.array([[-cfg.half_length + 0.01, -cfg.half_length + 0.01]])
    idx = gridlib.position_to_index(cfg, center, near_min)
    n = cfg.cell_count
    np.testing.assert_array_equal(np.asarray(idx), [[n - 1, n - 1]])


def test_move_no_motion_is_identity(small_config):
    cfg = small_config
    st = gridlib.create(cfg, (0.0, 0.0), 1.5)
    ground0 = np.asarray(st.ground).copy()
    st2 = gridlib.move(cfg, st, (0.1, -0.1), np.eye(4, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(st2.ground), ground0)
    np.testing.assert_array_equal(np.asarray(st2.center), [0.0, 0.0])


def test_move_shifts_content_and_fills_exposed(small_config):
    cfg = small_config
    n = cfg.cell_count
    st = gridlib.create(cfg, (0.0, 0.0), 0.0)
    # paint a recognizable pattern
    pattern = np.arange(n * n, dtype=np.float32).reshape(n, n)
    st = st._replace(ground=jnp.asarray(pattern), groundpatch=jnp.full((n, n), 0.5, jnp.float32))

    # base 2m above the map z=0 plane -> exposed ground should be -(-2) = 2
    t_map_base = tf.translation(0.0, 0.0, 2.0)
    t_base_map = tf.invert_rigid(t_map_base).astype(np.float32)

    shift_cells = 3
    dx = shift_cells * cfg.resolution
    st2 = gridlib.move(cfg, st, (dx, 0.0), t_base_map)

    g = np.asarray(st2.ground)
    gp = np.asarray(st2.groundpatch)
    # +x motion exposes low indices (max-position corner side)
    np.testing.assert_allclose(g[:shift_cells, :], 2.0, atol=1e-5)
    np.testing.assert_allclose(gp[:shift_cells, :], 0.0)
    # surviving content shifted by +shift_cells along axis 0
    np.testing.assert_array_equal(g[shift_cells:, :], pattern[: n - shift_cells, :])
    np.testing.assert_allclose(gp[shift_cells:, :], 0.5)
    np.testing.assert_allclose(np.asarray(st2.center), [dx, 0.0], atol=1e-6)


def test_move_center_snaps_to_lattice(small_config):
    cfg = small_config
    st = gridlib.create(cfg, (0.0, 0.0), 0.0)
    st2 = gridlib.move(cfg, st, (0.7 * cfg.resolution, 0.0), np.eye(4, dtype=np.float32))
    np.testing.assert_allclose(np.asarray(st2.center), [cfg.resolution, 0.0], atol=1e-6)


def test_exposed_mask_negative_and_wrap(small_config):
    n = 8
    m = np.asarray(gridlib.exposed_mask(n, jnp.array([-2, 0])))
    expect = np.zeros((n, n), bool)
    expect[n - 2 :, :] = True
    np.testing.assert_array_equal(m, expect)
    # whole-grid teleport
    m = np.asarray(gridlib.exposed_mask(n, jnp.array([n + 3, 0])))
    assert m.all()
