"""Rigid-transform utilities.

The reference transforms every LiDAR point cloud->map with a per-point tf2
loop (``GroundGridNodelet.cpp:170-181``) and individual ``tf2::doTransform``
calls for origins/poses. Here a pose is a single 4x4 row-major matrix and a
point batch is transformed with one matmul -- the natural TPU formulation
(batched MXU-friendly GEMM instead of 130k scalar transforms).

Conventions:
  * ``T_a_b`` denotes the pose of frame ``b`` expressed in frame ``a``;
    equivalently the matrix that maps points from ``b`` coordinates to ``a``
    coordinates: ``p_a = T_a_b @ p_b``.
  * Points are ``(N, 3)`` arrays; homogeneous lifting happens internally.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def transform_points(T, points):
    """Apply a 4x4 rigid transform to an (N, 3) point batch.

    Replaces the reference's per-point tf2 loop
    (GroundGridNodelet.cpp:170-181). Written as 9 fused elementwise
    multiply-adds rather than an (N,3)x(3,3) matmul: a K=3 contraction can't
    tile the MXU and XLA's fallback is ~60x slower than the VPU form.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    out_x = T[0, 0] * x + T[0, 1] * y + T[0, 2] * z + T[0, 3]
    out_y = T[1, 0] * x + T[1, 1] * y + T[1, 2] * z + T[1, 3]
    out_z = T[2, 0] * x + T[2, 1] * y + T[2, 2] * z + T[2, 3]
    if isinstance(x, jnp.ndarray):
        return jnp.stack([out_x, out_y, out_z], axis=-1)
    return np.stack([out_x, out_y, out_z], axis=-1)


def transform_points_soa(T, x, y, z):
    """Rigid transform in structure-of-arrays form: 3 x (P,) in, 3 x (P,) out.

    The pipeline-internal variant of :func:`transform_points`: flat (P,)
    arrays keep every downstream op (gather/scatter/elementwise) on the TPU
    vectorized fast path, where (P, 3) minor-dim layouts trigger relayout
    copies.
    """
    out_x = T[0, 0] * x + T[0, 1] * y + T[0, 2] * z + T[0, 3]
    out_y = T[1, 0] * x + T[1, 1] * y + T[1, 2] * z + T[1, 3]
    out_z = T[2, 0] * x + T[2, 1] * y + T[2, 2] * z + T[2, 3]
    return out_x, out_y, out_z


def invert_rigid(T):
    """Invert a rigid 4x4 transform: [R|t]^-1 = [R^T | -R^T t]."""
    xp = jnp if isinstance(T, jnp.ndarray) else np
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = R.T
    out = xp.eye(4, dtype=T.dtype)
    if xp is jnp:
        out = out.at[:3, :3].set(Rt)
        out = out.at[:3, 3].set(-Rt @ t)
    else:
        out = np.eye(4, dtype=T.dtype)
        out[:3, :3] = Rt
        out[:3, 3] = -Rt @ t
    return out


def translation(x: float, y: float, z: float, dtype=np.float64) -> np.ndarray:
    """Pure-translation 4x4 (host-side helper for static extrinsics)."""
    T = np.eye(4, dtype=dtype)
    T[:3, 3] = (x, y, z)
    return T


# Static extrinsic chain from the reference launch files
# (launch/KITTIPlayback.launch:13-17):
#   kitti_base_link -> base_link : translation (1.95, 0, -1.73)
#   kitti_base_link -> velodyne  : identity
# i.e. base_link sits at ground level 1.95m ahead of the sensor.
T_KITTIBASE_BASE = translation(1.95, 0.0, -1.73)

# KITTI odometry camera->velodyne calibration Tr for sequences 00-10, hardcoded
# in the reference player (scripts/kitti_data_publisher.py:168).
KITTI_TR = np.array(
    [
        [4.276802385584e-04, -9.999672484946e-01, -8.084491683471e-03, -1.198459927713e-02],
        [-7.210626507497e-03, 8.081198471645e-03, -9.999413164504e-01, -5.403984729748e-02],
        [9.999738645903e-01, 4.859485810390e-04, -7.206933692422e-03, -2.921968648686e-01],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float64,
)


def kitti_pose_to_map(pose_3x4: np.ndarray) -> np.ndarray:
    """Conjugate a KITTI camera-frame pose into the velodyne/map frame.

    ``pose' = Tr^-1 @ P @ Tr`` exactly as the reference player does
    (scripts/kitti_data_publisher.py:164-180). The result is the pose of
    ``kitti_base_link`` (== velodyne) in the map frame.
    """
    P = np.vstack([np.asarray(pose_3x4, dtype=np.float64).reshape(3, 4), [0, 0, 0, 1]])
    return np.linalg.inv(KITTI_TR) @ P @ KITTI_TR


def scan_poses(T_map_velo: np.ndarray):
    """Derive the per-scan pose set consumed by the pipeline.

    Given the velodyne pose in map (from :func:`kitti_pose_to_map`), returns
    ``(T_map_velo, T_map_base, T_base_map)`` as float32 arrays:

      * ``T_map_velo``  -- cloud->map transform + sensor origin (its
        translation column), cf. GroundGridNodelet.cpp:139-146.
      * ``T_map_base``  -- base_link pose in map; its z is the spiral seed
        height (GroundSegmentation.cpp:406-411).
      * ``T_base_map``  -- map->base_link, used to re-initialize freshly
        exposed grid cells to the base plane height (GroundGrid.cpp:121-133).
    """
    T_map_velo = np.asarray(T_map_velo, dtype=np.float64)
    T_map_base = T_map_velo @ T_KITTIBASE_BASE
    T_base_map = invert_rigid(T_map_base)
    return (
        T_map_velo.astype(np.float32),
        T_map_base.astype(np.float32),
        T_base_map.astype(np.float32),
    )
