"""Rigid transform utilities."""

import numpy as np

from groundgrid_tpu.core import transforms as tf


def _random_rigid(rng):
    A = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(A)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = q
    T[:3, 3] = rng.normal(size=3) * 10
    return T


def test_invert_rigid():
    rng = np.random.default_rng(0)
    T = _random_rigid(rng)
    np.testing.assert_allclose(tf.invert_rigid(T) @ T, np.eye(4), atol=1e-12)


def test_transform_points_matches_matrix():
    rng = np.random.default_rng(1)
    T = _random_rigid(rng)
    pts = rng.normal(size=(100, 3)) * 20
    hom = np.concatenate([pts, np.ones((100, 1))], axis=1)
    expect = (T @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(tf.transform_points(T, pts)), expect, atol=1e-10)


def test_kitti_pose_identity():
    """P = I conjugates to I: Tr^-1 I Tr = I."""
    P = np.eye(4)[:3]
    np.testing.assert_allclose(tf.kitti_pose_to_map(P), np.eye(4), atol=1e-12)


def test_scan_poses_chain():
    rng = np.random.default_rng(2)
    T_map_velo = _random_rigid(rng)
    mv, mb, bm = tf.scan_poses(T_map_velo)
    # base pose = velo pose composed with the static kitti_base->base offset
    np.testing.assert_allclose(
        np.asarray(mb, np.float64),
        T_map_velo @ tf.T_KITTIBASE_BASE,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(mb, np.float64) @ np.asarray(bm, np.float64), np.eye(4), atol=1e-4
    )


def test_base_sits_at_ground_level():
    """At identity yaw the base z is sensor z - 1.73 (the mount height)."""
    T = np.eye(4)
    T[2, 3] = 1.73
    _, mb, _ = tf.scan_poses(T)
    assert abs(float(mb[2, 3])) < 1e-6
