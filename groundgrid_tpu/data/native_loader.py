"""ctypes binding for the native threaded scan loader (native/loader.cpp).

The C++ loader prefetches SemanticKITTI scans ahead of the consumer on worker
threads and returns buffers already padded to the pipeline's static point
capacity -- the native counterpart of the reference's Python data feeder
(``scripts/kitti_data_publisher.py``). Falls back transparently to the pure
NumPy reader when the shared library hasn't been built; build it with
``make -C native`` (done automatically on first use if a compiler exists).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

from groundgrid_tpu.data.semantickitti import ScanRecord, SemanticKITTI

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libggloader.so")

_lib: Optional[ctypes.CDLL] = None


def _build_library() -> bool:
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def load_library(auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native loader; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and auto_build and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gg_loader_create.restype = ctypes.c_void_p
    lib.gg_loader_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.gg_loader_next.restype = ctypes.c_int64
    lib.gg_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gg_loader_seek.restype = None
    lib.gg_loader_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gg_loader_destroy.restype = None
    lib.gg_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.gg_loader_create_sorted.restype = ctypes.c_void_p
    lib.gg_loader_create_sorted.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_double,
        ctypes.c_int32,
    ]
    lib.gg_loader_next_sorted.restype = ctypes.c_int64
    lib.gg_loader_next_sorted.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.gg_loader_create_wire.restype = ctypes.c_void_p
    lib.gg_loader_create_wire.argtypes = (
        lib.gg_loader_create_sorted.argtypes
        + [ctypes.c_double, ctypes.c_double]  # wire_sxy, wire_sz
    )
    lib.gg_loader_next_wire.restype = ctypes.c_int64
    lib.gg_loader_next_wire.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return load_library() is not None


class PrefetchingLoader:
    """Iterate a SemanticKITTI sequence with native threaded read-ahead.

    Yields :class:`ScanRecord` like ``SemanticKITTI.iter_scans`` (poses/times
    still come from the Python reader; the hot per-scan file I/O + label
    unpacking runs in C++). Degrades to the NumPy reader when the native
    library is unavailable.
    """

    def __init__(
        self,
        dataset: SemanticKITTI,
        cap: int = 150_000,
        n_threads: int = 4,
        queue_depth: int = 8,
    ):
        self.ds = dataset
        self.cap = cap
        self._lib = load_library()
        self._handle = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(
                self._lib.gg_loader_create(
                    self.ds.root.encode(), len(self.ds), cap, n_threads, queue_depth
                )
            )
        self._pts = np.empty((cap, 4), np.float32)
        self._lab = np.empty((cap,), np.int32)
        self._fallback_start = 0

    @property
    def native(self) -> bool:
        return self._handle is not None

    def seek(self, index: int) -> None:
        if self._handle is not None:
            self._lib.gg_loader_seek(self._handle, index)
        self._fallback_start = index

    def __iter__(self) -> Iterator[ScanRecord]:
        if self._handle is None:
            for idx in range(self._fallback_start, len(self.ds)):
                rec = self.ds.read_scan(idx)
                yield ScanRecord(
                    index=rec.index, timestamp=rec.timestamp,
                    points=rec.points[: self.cap], labels=rec.labels[: self.cap],
                    t_map_velo=rec.t_map_velo,
                )
            return
        count = ctypes.c_int32(0)
        while True:
            idx = self._lib.gg_loader_next(
                self._handle,
                self._pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.byref(count),
            )
            if idx < 0:
                if idx == -2:
                    raise IOError("native loader failed to read a scan")
                return
            c = count.value
            yield ScanRecord(
                index=int(idx),
                timestamp=float(self.ds.times[idx]),
                points=self._pts[:c].copy(),
                labels=self._lab[:c].copy(),
                t_map_velo=self.ds.poses[idx],
            )

    def close(self) -> None:
        if self._handle is not None:
            self._lib.gg_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


import dataclasses


@dataclasses.dataclass
class PreparedRecord:
    """A device-ready, host-prepared (sorted-scan mode) scan.

    ``scan`` is a pipeline :class:`~groundgrid_tpu.pipeline.Scan`: map-frame
    SoA coordinates sorted by predicted flat cell id, with the host-tracked
    grid center attached. ``order`` is the applied permutation
    (``sorted = original[order]``); per-point outputs restore with
    ``out[order] = sorted_out``. ``labels`` are the original-order ground
    truth labels (for host-side evaluation).
    """

    index: int
    timestamp: float
    scan: object  # pipeline.Scan
    order: np.ndarray
    n_points: int
    labels: np.ndarray
    t_map_velo: np.ndarray


class WirePrefetchingLoader:
    """Native threaded loader emitting s16 wire-prepared scans.

    The wire analog of :class:`SortedPrefetchingLoader`: workers quantize
    each scan to the s16 wire format (per-axis power-of-two steps,
    ``pipeline.wire_scales``) and stable-sort by the
    dequantized coordinates' cell ids (``pipeline.prepare_scan_wire``
    semantics, bit-identical -- verified by tests/test_native_loader.py).
    Yields :class:`PreparedRecord` whose ``scan`` is a
    :class:`~groundgrid_tpu.pipeline.WireScan`; consume with a
    ``config.wire_format`` pipeline. Falls back to the NumPy wire prep when
    the native library is unavailable.
    """

    def __init__(self, dataset: SemanticKITTI, config, n_threads: int = 4,
                 queue_depth: int = 8):
        from groundgrid_tpu.pipeline import CenterTracker

        if not getattr(config, "wire_format", False):
            raise ValueError("WirePrefetchingLoader needs config.wire_format")
        self.ds = dataset
        self.config = config
        cap = config.max_points
        self.cap = cap
        n = len(dataset)
        self._poses = np.ascontiguousarray(
            np.stack([np.asarray(dataset.poses[i], np.float64) for i in range(n)])
        )
        centers64 = np.empty((n, 2), np.float64)
        tracker = None
        for i in range(n):
            pos = self._poses[i, :2, 3].astype(np.float64)
            if tracker is None:
                tracker = CenterTracker(config, pos)
            centers64[i] = tracker.update(pos)
        self._centers64 = np.ascontiguousarray(centers64)
        # ds images shipped to the device (Scan.center / Scan.center_lo)
        from groundgrid_tpu.core.exactf32 import f64_to_ds
        self._chi, self._clo = f64_to_ds(centers64)

        self._lib = load_library()
        self._handle = None
        if self._lib is not None and n > 0:
            from groundgrid_tpu.pipeline import wire_scales

            sxy, sz = wire_scales(config)
            self._handle = ctypes.c_void_p(
                self._lib.gg_loader_create_wire(
                    self.ds.root.encode(), n, cap, n_threads, queue_depth,
                    self._poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    self._centers64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    ctypes.c_double(config.resolution),
                    ctypes.c_double(config.half_length),
                    config.cell_count,
                    ctypes.c_double(float(sxy)),
                    ctypes.c_double(float(sz)),
                )
            )
        self._qx = np.empty((cap,), np.int16)
        self._qy = np.empty((cap,), np.int16)
        self._qz = np.empty((cap,), np.int16)
        self._lab = np.empty((cap,), np.int16)
        self._order = np.empty((cap,), np.int32)
        self._fallback_start = 0

    @property
    def native(self) -> bool:
        return self._handle is not None

    def seek(self, index: int) -> None:
        if self._handle is not None:
            self._lib.gg_loader_seek(self._handle, index)
        self._fallback_start = index

    def __iter__(self):
        import jax.numpy as jnp

        from groundgrid_tpu.core import transforms as tf
        from groundgrid_tpu.pipeline import WireScan, prepare_scan_wire

        cfg = self.config
        if self._handle is None:
            for idx in range(self._fallback_start, len(self.ds)):
                rec = self.ds.read_scan(idx)
                w, order = prepare_scan_wire(
                    cfg, rec.points[:, :3], rec.labels, rec.t_map_velo,
                    self._centers64[idx],
                )
                count = min(rec.points.shape[0], self.cap)
                yield PreparedRecord(
                    index=idx, timestamp=rec.timestamp, scan=w, order=order,
                    n_points=count, labels=rec.labels[:count],
                    t_map_velo=self._poses[idx],
                )
            return
        count = ctypes.c_int32(0)
        while True:
            idx = self._lib.gg_loader_next_wire(
                self._handle,
                self._qx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                self._qy.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                self._qz.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                self._lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
                self._order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.byref(count),
            )
            if idx < 0:
                if idx == -2:
                    raise IOError("native loader failed to read a scan")
                return
            idx = int(idx)
            c = min(int(count.value), self.cap)
            order = self._order.copy()
            mv, mb, bm = tf.scan_poses(self._poses[idx])
            w = WireScan(
                qx=jnp.asarray(self._qx.copy()), qy=jnp.asarray(self._qy.copy()),
                qz=jnp.asarray(self._qz.copy()),
                rings=jnp.asarray(self._lab.copy()),
                count=jnp.asarray(np.int32(c)),
                t_map_velo=jnp.asarray(np.asarray(mv, np.float32)),
                t_map_base=jnp.asarray(np.asarray(mb, np.float32)),
                t_base_map=jnp.asarray(np.asarray(bm, np.float32)),
                center=jnp.asarray(self._chi[idx]),
                center_lo=jnp.asarray(self._clo[idx]),
            )
            restored = np.empty((self.cap,), np.int32)
            restored[order] = self._lab.astype(np.int32)
            yield PreparedRecord(
                index=idx, timestamp=float(self.ds.times[idx]),
                scan=w, order=order, n_points=c,
                labels=restored[:c], t_map_velo=self._poses[idx],
            )

    def close(self) -> None:
        if self._handle is not None:
            self._lib.gg_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class SortedPrefetchingLoader:
    """Native threaded loader emitting fully prepared sorted scans.

    The per-scan host work of ``config.sorted_scans`` pipelines -- file read,
    label unpack, map-frame transform, cell binning against the host-tracked
    center and the stable cell sort -- all runs in C++ prefetch threads
    (native/loader.cpp ``prep_scan``), bit-identical to
    ``pipeline.prepare_scan`` (verified by tests/test_native_loader.py).
    Falls back to the NumPy prep when the native library is unavailable.
    """

    def __init__(
        self,
        dataset: SemanticKITTI,
        config,
        n_threads: int = 4,
        queue_depth: int = 8,
    ):
        from groundgrid_tpu.pipeline import CenterTracker

        self.ds = dataset
        self.config = config
        cap = config.max_points
        self.cap = cap
        n = len(dataset)
        # host-tracked center recurrence over the whole sequence (poses are
        # known upfront -- the reference's poses.txt), so out-of-order
        # prefetch workers can bin any scan
        self._poses = np.ascontiguousarray(
            np.stack([np.asarray(dataset.poses[i], np.float64) for i in range(n)])
        )
        centers64 = np.empty((n, 2), np.float64)
        tracker = None
        for i in range(n):
            pos = self._poses[i, :2, 3].astype(np.float64)
            if tracker is None:
                tracker = CenterTracker(config, pos)
            centers64[i] = tracker.update(pos)
        self._centers64 = np.ascontiguousarray(centers64)
        # ds images shipped to the device (Scan.center / Scan.center_lo)
        from groundgrid_tpu.core.exactf32 import f64_to_ds
        self._chi, self._clo = f64_to_ds(centers64)

        self._lib = load_library()
        self._handle = None
        if self._lib is not None and n > 0:
            self._handle = ctypes.c_void_p(
                self._lib.gg_loader_create_sorted(
                    self.ds.root.encode(), n, cap, n_threads, queue_depth,
                    self._poses.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    self._centers64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    ctypes.c_double(config.resolution),
                    ctypes.c_double(config.half_length),
                    config.cell_count,
                )
            )
        self._px = np.empty((cap,), np.float32)
        self._py = np.empty((cap,), np.float32)
        self._pz = np.empty((cap,), np.float32)
        self._lab = np.empty((cap,), np.int32)
        self._order = np.empty((cap,), np.int32)
        self._fallback_start = 0

    @property
    def native(self) -> bool:
        return self._handle is not None

    def seek(self, index: int) -> None:
        if self._handle is not None:
            self._lib.gg_loader_seek(self._handle, index)
        self._fallback_start = index

    def __iter__(self):
        import jax.numpy as jnp

        from groundgrid_tpu.core import transforms as tf
        from groundgrid_tpu.pipeline import Scan, prepare_scan

        cfg = self.config
        if self._handle is None:
            # NumPy fallback: same outputs via pipeline.prepare_scan
            for idx in range(self._fallback_start, len(self.ds)):
                rec = self.ds.read_scan(idx)
                scan, order = prepare_scan(
                    cfg, rec.points[:, :3], rec.labels, rec.t_map_velo,
                    self._centers64[idx],
                )
                count = min(rec.points.shape[0], self.cap)
                yield PreparedRecord(
                    index=idx, timestamp=rec.timestamp, scan=scan, order=order,
                    n_points=count, labels=rec.labels[:count],
                    t_map_velo=self._poses[idx],
                )
            return
        count = ctypes.c_int32(0)
        while True:
            idx = self._lib.gg_loader_next_sorted(
                self._handle,
                self._px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._py.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._pz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                ctypes.byref(count),
            )
            if idx < 0:
                if idx == -2:
                    raise IOError("native loader failed to read a scan")
                return
            idx = int(idx)
            c = min(int(count.value), self.cap)
            order = self._order.copy()
            mv, mb, bm = tf.scan_poses(self._poses[idx])
            # explicit copies: jnp.asarray may zero-copy alias host numpy on
            # CPU backends, and these staging buffers are reused next scan
            scan = Scan(
                px=jnp.asarray(self._px.copy()), py=jnp.asarray(self._py.copy()),
                pz=jnp.asarray(self._pz.copy()), rings=jnp.asarray(self._lab.copy()),
                valid=jnp.asarray((order < c).astype(np.int32)),
                t_map_velo=jnp.asarray(mv), t_map_base=jnp.asarray(mb),
                t_base_map=jnp.asarray(bm),
                center=jnp.asarray(self._chi[idx]),
                center_lo=jnp.asarray(self._clo[idx]),
            )
            restored = np.empty((self.cap,), np.int32)
            restored[order] = self._lab
            yield PreparedRecord(
                index=idx,
                timestamp=float(self.ds.times[idx]),
                scan=scan, order=order, n_points=c,
                labels=restored[:c], t_map_velo=self._poses[idx],
            )

    def close(self) -> None:
        if self._handle is not None:
            self._lib.gg_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
