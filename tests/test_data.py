"""SemanticKITTI reader/writer + synthetic generator."""

import numpy as np
import pytest

from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.data.semantickitti import SemanticKITTI, write_sequence
from groundgrid_tpu.data.synthetic import (
    SENSOR_HEIGHT, make_scene, render_scan, terrain_z, vehicle_pose,
)


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    scans = []
    for k in range(3):
        pts = rng.normal(size=(100 + k, 4)).astype(np.float32)
        lbl = rng.choice([40, 10, 70], size=100 + k).astype(np.uint32)
        T = np.eye(4)
        T[:3, 3] = (k * 1.0, 0.5 * k, 1.7)
        scans.append((pts, lbl, T))
    write_sequence(tmp_path, 0, scans, dt=0.1)

    ds = SemanticKITTI(tmp_path, 0)
    assert len(ds) == 3
    for k in range(3):
        rec = ds.read_scan(k)
        np.testing.assert_allclose(rec.points, scans[k][0], atol=0)
        np.testing.assert_array_equal(rec.labels, scans[k][1].astype(np.int32))
        # pose survives the camera-frame conjugation round trip
        np.testing.assert_allclose(rec.t_map_velo, scans[k][2], atol=1e-9)
        assert rec.timestamp == pytest.approx(0.1 * k)


def test_label_low16_bits(tmp_path):
    """Instance id in the high 16 bits must be masked off (:160)."""
    pts = np.zeros((4, 4), np.float32)
    lbl = (np.uint32(7) << 16) + np.array([40, 10, 70, 72], np.uint32)
    write_sequence(tmp_path, 1, [(pts, lbl, np.eye(4))])
    rec = SemanticKITTI(tmp_path, 1).read_scan(0)
    np.testing.assert_array_equal(rec.labels, [40, 10, 70, 72])


def test_iter_scans_start_end(tmp_path):
    scans = [(np.zeros((2, 4), np.float32), np.zeros(2, np.uint32), np.eye(4))] * 5
    write_sequence(tmp_path, 2, scans, dt=0.5)
    ds = SemanticKITTI(tmp_path, 2)
    got = [r.index for r in ds.iter_scans(start=0.9, end=1.6)]
    assert got == [2, 3]
    assert ds.seek_index(1.2) == 3


def test_synthetic_scan_geometry():
    scene = make_scene(0)
    T = vehicle_pose(scene, 0)
    pts, lbl = render_scan(scene, T, n_beams=16, n_azimuth=360)
    assert pts.shape[0] > 1000
    assert set(np.unique(lbl)).issubset({10, 40, 50, 70, 72})
    # ground points in map frame must lie near the terrain surface
    pts_map = pts @ np.asarray(T[:3, :3], np.float32).T + np.asarray(T[:3, 3], np.float32)
    ground_mask = (lbl == 40) | (lbl == 72)
    gz = pts_map[ground_mask, 2]
    tz = terrain_z(scene, pts_map[ground_mask, 0], pts_map[ground_mask, 1])
    assert np.abs(gz - tz).mean() < 0.05
    # sensor sits SENSOR_HEIGHT above terrain
    assert T[2, 3] == pytest.approx(
        terrain_z(scene, T[0, 3], T[1, 3]) + SENSOR_HEIGHT
    )


def test_missing_sequence_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        SemanticKITTI(tmp_path, 42)
