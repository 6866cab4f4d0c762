"""Native C++ threaded scan loader (skipped when toolchain unavailable)."""

import numpy as np
import pytest

from groundgrid_tpu.data.native_loader import PrefetchingLoader, native_available
from groundgrid_tpu.data.semantickitti import SemanticKITTI, write_sequence

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native loader not built (no C++ toolchain?)"
)


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(1)
    scans = []
    for k in range(8):
        pts = rng.normal(size=(200 + 10 * k, 4)).astype(np.float32)
        lbl = (np.uint32(5) << 16) + rng.choice([40, 10, 72], size=200 + 10 * k).astype(np.uint32)
        T = np.eye(4)
        T[0, 3] = float(k)
        scans.append((pts, lbl, T))
    write_sequence(tmp_path, 0, scans)
    return SemanticKITTI(tmp_path, 0), scans


def test_matches_numpy_reader(dataset):
    ds, scans = dataset
    loader = PrefetchingLoader(ds, cap=512, n_threads=3, queue_depth=4)
    assert loader.native
    for rec, ref in zip(loader, ds.iter_scans()):
        assert rec.index == ref.index
        np.testing.assert_allclose(rec.points, ref.points)
        np.testing.assert_array_equal(rec.labels, ref.labels)  # low-16 masked
        np.testing.assert_allclose(rec.t_map_velo, ref.t_map_velo)
    loader.close()


def test_seek_semantics(dataset):
    ds, _ = dataset
    loader = PrefetchingLoader(ds, cap=512, n_threads=2, queue_depth=3)
    it = iter(loader)
    assert next(it).index == 0
    loader.seek(5)
    assert [r.index for r in loader] == [5, 6, 7]
    loader.seek(1)  # backward seek after exhaustion
    assert [r.index for r in loader][:2] == [1, 2]
    loader.close()


def test_truncation_to_cap(dataset):
    ds, scans = dataset
    loader = PrefetchingLoader(ds, cap=100, n_threads=2, queue_depth=2)
    rec = next(iter(loader))
    assert rec.points.shape == (100, 4)
    np.testing.assert_allclose(rec.points, scans[0][0][:100])
    loader.close()


def test_wire_loader_matches_python_prep(tmp_path):
    """Native C++ s16 wire prep == pipeline.prepare_scan_wire, bit for bit."""
    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.data.native_loader import WirePrefetchingLoader
    from groundgrid_tpu.data.semantickitti import SemanticKITTI, write_sequence
    from groundgrid_tpu.data.synthetic import adversarial_sequence
    from groundgrid_tpu.pipeline import CenterTracker, prepare_scan_wire

    scans = list(adversarial_sequence(3, seed=5, n_beams=12, n_azimuth=300))
    write_sequence(tmp_path, 0, [(p, l, T) for p, l, T in scans])
    ds = SemanticKITTI(tmp_path, 0)
    cfg = GroundGridConfig(
        dimension=24.0, resolution=0.5, max_points=4096, ray_steps=28,
        max_outlier_candidates=256, sorted_scans=True, wire_format=True,
    )

    loader = WirePrefetchingLoader(ds, cfg, n_threads=2, queue_depth=2)
    got = list(loader)
    loader.close()
    assert len(got) == 3

    tracker = None
    for prep_rec, rec in zip(got, ds.iter_scans()):
        pos = rec.t_map_velo[:2, 3].astype(np.float32)
        if tracker is None:
            tracker = CenterTracker(cfg, pos)
        center = tracker.update(pos)
        want, want_order = prepare_scan_wire(
            cfg, rec.points[:, :3], rec.labels, rec.t_map_velo, center
        )
        if loader.native:
            np.testing.assert_array_equal(prep_rec.order, want_order)
            for field in ("qx", "qy", "qz", "rings", "count", "center"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(prep_rec.scan, field)),
                    np.asarray(getattr(want, field)),
                    err_msg=field,
                )
        np.testing.assert_array_equal(prep_rec.labels, rec.labels[: cfg.max_points])
        # the wire payload per point is s16 x 4 = 8 bytes
        assert np.asarray(prep_rec.scan.qx).dtype == np.int16


def test_sorted_loader_matches_python_prep(tmp_path):
    """Native C++ prep == pipeline.prepare_scan, bit for bit."""
    import dataclasses

    from groundgrid_tpu.config import GroundGridConfig
    from groundgrid_tpu.data.native_loader import SortedPrefetchingLoader
    from groundgrid_tpu.data.semantickitti import SemanticKITTI, write_sequence
    from groundgrid_tpu.data.synthetic import synthetic_sequence
    from groundgrid_tpu.pipeline import CenterTracker, prepare_scan

    scans = list(synthetic_sequence(3, seed=13, n_beams=12, n_azimuth=300))
    write_sequence(tmp_path, 0, [(p, l, T) for p, l, T in scans])
    ds = SemanticKITTI(tmp_path, 0)
    cfg = GroundGridConfig(
        dimension=24.0, resolution=0.5, max_points=4096, ray_steps=28,
        max_outlier_candidates=256, sorted_scans=True,
    )

    loader = SortedPrefetchingLoader(ds, cfg, n_threads=2, queue_depth=2)
    tracker = None
    got = list(loader)
    loader.close()
    assert len(got) == 3

    for prep_rec, rec in zip(got, ds.iter_scans()):
        pos = rec.t_map_velo[:2, 3].astype(np.float32)
        if tracker is None:
            tracker = CenterTracker(cfg, pos)
        center = tracker.update(pos)
        want_scan, want_order = prepare_scan(
            cfg, rec.points[:, :3], rec.labels, rec.t_map_velo, center
        )
        if loader.native:
            np.testing.assert_array_equal(prep_rec.order, want_order)
            for field in ("px", "py", "pz", "rings", "valid", "center"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(prep_rec.scan, field)),
                    np.asarray(getattr(want_scan, field)),
                    err_msg=field,
                )
        # always: original-order labels round-trip and cells are sorted
        np.testing.assert_array_equal(prep_rec.labels, rec.labels[: cfg.max_points])
        assert prep_rec.n_points == min(len(rec.points), cfg.max_points)
