"""The per-scan segmentation pipeline: one jitted function.

Replaces the reference's hot path -- ``GroundGridNodelet::points_callback``
-> ``GroundSegmentation::filter_cloud`` (``GroundGridNodelet.cpp:114-232``,
``GroundSegmentation.cpp:50-197``) plus the odometry-driven grid relocation
(``GroundGrid.cpp:83-147``) -- with a single XLA program:

    state, out = step(state, scan)

Stage order matches the reference exactly:
  transform -> grid move -> bin -> outlier ray-march (vs previous terrain)
  -> rasterize -> patch detection -> spiral interpolation -> classify.

All shapes are static (points padded/masked to ``config.max_points``); config
is closed over, so each :class:`GroundGridConfig` yields one compiled
executable, cached by XLA.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import classify as classifylib
from groundgrid_tpu.core import detect as detectlib
from groundgrid_tpu.core import grid as gridlib
from groundgrid_tpu.core import interpolate as interplib
from groundgrid_tpu.core import outliers as outlierlib
from groundgrid_tpu.core import rasterize as rasterlib
from groundgrid_tpu.core import transforms as tf
from groundgrid_tpu.core.grid import GridState


class Scan(NamedTuple):
    """One LiDAR scan + ego pose, padded to static shapes.

    px/py/pz: (P,) f32 sensor-frame coordinates as three separate flat
            arrays. Fully separate 1-D arrays keep every per-point op on the
            TPU fast path: (P, 3) AoS layouts and even (3, P) row slices
            trigger multi-ms serial relayout copies on this backend.
    rings:  (P,) i32 ring channel; the SemanticKITTI harness packs the
            semantic label here (scripts/kitti_data_publisher.py:123-145),
            and it rides through the pipeline untouched for evaluation.
    valid:  (P,) i32 padding mask (1 = real point). Not bool: packed-pred
            layouts cost serial relayouts on this backend.
    t_map_velo: (4, 4) f32 sensor->map pose (cloud transform + origin).
    t_map_base: (4, 4) f32 base_link->map pose (spiral seed height).
    t_base_map: (4, 4) f32 map->base_link (exposed-cell ground init).
    center: (2,) f32 host-tracked grid center for this scan, or None to
            derive it on device (``config.sorted_scans`` requires it: the
            host sorts points by cell ids binned against this exact value).
    center_lo: (2,) f32 ds tail of the host's f64 center (see
            GridState.center_lo); None degrades to a zero tail.
    """

    px: jax.Array
    py: jax.Array
    pz: jax.Array
    rings: jax.Array
    valid: jax.Array
    t_map_velo: jax.Array
    t_map_base: jax.Array
    t_base_map: jax.Array
    center: jax.Array | None = None
    center_lo: jax.Array | None = None


class StepOutput(NamedTuple):
    """Per-scan results. ``labels``: 49 ground / 99 non-ground / 0 dropped.

    All fields are flat (P,) arrays; outlier is int32 (1 = occlusion outlier,
    force-labeled ground) rather than bool because packed-pred outputs cost
    serial relayouts on this backend. x/y/z are the map-frame coordinates.
    """

    labels: jax.Array  # (P,) int32
    outlier: jax.Array  # (P,) int32 0/1
    x: jax.Array  # (P,) f32 map frame
    y: jax.Array
    z: jax.Array


class AuxLayers(NamedTuple):
    """All published grid layers (reference layer set, SURVEY.md 2.3)."""

    points: jax.Array  # non-ground count after classification
    points_raw: jax.Array
    ground: jax.Array
    groundpatch: jax.Array
    ground_candidates: jax.Array
    plane_dist: jax.Array
    mean_variance: jax.Array
    m2: jax.Array
    min_ground_height: jax.Array
    max_ground_height: jax.Array
    variance: jax.Array


def _validate(config: GroundGridConfig) -> None:
    config.validate()
    # ray bound must cover the grid half-diagonal (see core/outliers.py)
    need = int(math.ceil(config.half_length * math.sqrt(2.0))) + 8
    if config.ray_steps < need:
        raise ValueError(
            f"config.ray_steps={config.ray_steps} too small for a "
            f"{config.dimension}m grid; need >= {need}"
        )
    from groundgrid_tpu.ops.pallas_raster import CHUNK

    if config.sorted_scans and config.max_points % max(CHUNK, 1024):
        # CHUNK for the raster kernel; 1024 for the lookup kernel's groups
        raise ValueError(
            "sorted_scans requires max_points to be a multiple of "
            f"{max(CHUNK, 1024)} (pallas kernel chunking), got {config.max_points}"
        )


def make_step_fn(config: GroundGridConfig, with_aux: bool = False, _salt: int = 0):
    """Build the *unjitted* per-scan step (for vmap/shard_map composition).

    ``_salt`` injects a no-op constant so each value produces a distinct
    program for the compile service -- see :func:`compile_step_verified`.
    """
    _validate(config)
    tables = detectlib.make_tables(config)

    use_pallas = config.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from groundgrid_tpu.ops.pallas_spiral import spiral_interpolation_pallas

        spiral = functools.partial(spiral_interpolation_pallas, config)
    else:
        spiral = functools.partial(interplib.spiral_interpolation, config)

    # Per-point table reads (previous terrain for the candidate test; new
    # terrain + variance for classification) ride the sorted-lookup Pallas
    # kernel in sorted-scan mode: XLA's serial row gathers were the single
    # largest cost block of the pipeline. The kernel is correct for unsorted
    # input too (just slower), so it needs no fallback cond.
    use_lookup = (
        config.sorted_scans and use_pallas and config.max_points % 1024 == 0
    )
    if use_lookup:
        from groundgrid_tpu.ops.pallas_lookup import sorted_lookup

    def step_impl(state: GridState, scan: Scan):
        # --- transform to map frame (GroundGridNodelet.cpp:139-184) ---
        if config.sorted_scans:
            # host-prepared scans are already in the map frame (the host must
            # bin the exact f32 coordinates the device bins; re-running the
            # transform on device could diverge by 1 ulp under XLA's
            # excess-precision FMA formation and break the sort order)
            x, y, z = scan.px, scan.py, scan.pz
        else:
            x, y, z = tf.transform_points_soa(scan.t_map_velo, scan.px, scan.py, scan.pz)
        origin = scan.t_map_velo[:3, 3]
        if _salt:
            # traced no-op (adds f32 +0.0) that cannot fold at trace time:
            # distinct _salt -> distinct program for the compile service/cache
            origin = origin + (scan.rings[_salt % config.max_points] * 0).astype(jnp.float32)

        # --- grid relocation (GroundGrid.cpp:83-147) ---
        state = gridlib.move(
            config, state, origin[:2], scan.t_base_map, new_center=scan.center,
            new_center_lo=scan.center_lo,
        )

        # --- binning (f64-faithful ds form; see rasterize.faithful_cells) ---
        binning = rasterlib.bin_points(
            config, state.center, x, y, z, scan.rings, scan.valid > 0, origin,
            center_lo=state.center_lo,
        )

        # --- outlier ray-march against previous terrain (cpp:242-275) ---
        old_h = None
        if use_lookup:
            (old_h,) = sorted_lookup(
                binning.cell, [state.ground], config.cell_count ** 2
            )
        outlier = outlierlib.detect_outliers(
            config, state.center, state.ground, state.groundpatch,
            binning, x, y, z, origin, old_h=old_h,
            use_lookup_kernel=use_lookup, center_lo=state.center_lo,
        )

        # --- rasterize (cpp:200-311) ---
        accept = binning.inmap & ~binning.ignored & ~outlier
        is_sorted = None
        if config.sorted_scans and use_pallas:
            sorted_fn = functools.partial(
                rasterlib.rasterize_sorted, config, binning, z, origin,
                accept, with_max=with_aux,
                center=state.center, t_base_map=scan.t_base_map,
            )
            if config.sorted_fallback_check:
                is_sorted = jnp.all(binning.cell[1:] >= binning.cell[:-1])
                raster = jax.lax.cond(
                    is_sorted,
                    sorted_fn,
                    functools.partial(
                        rasterlib.rasterize, config, binning, z, origin,
                        accept, with_max=with_aux,
                        center=state.center, t_base_map=scan.t_base_map,
                    ),
                )
            else:
                raster = sorted_fn()
        else:
            raster = rasterlib.rasterize(
                config, binning, z, origin, accept, with_max=with_aux,
                center=state.center, t_base_map=scan.t_base_map,
            )

        # --- ground patch detection (cpp:314-395) ---
        if config.fused_detect:
            from groundgrid_tpu.ops.pallas_detect import (
                detect_ground_patches_fused,
            )

            ground, groundpatch = detect_ground_patches_fused(
                config, tables, raster.points, raster.variance,
                raster.min_ground_height, state.ground, state.groundpatch,
                interpret=not use_pallas,
            )
        else:
            ground, groundpatch = detectlib.detect_ground_patches(
                config, tables, raster.points, raster.variance,
                raster.min_ground_height, state.ground, state.groundpatch,
            )

        # --- spiral interpolation (cpp:398-465) ---
        ground, groundpatch = spiral(ground, groundpatch, scan.t_map_base[2, 3])

        # --- classification (cpp:146-189) ---
        gh_var = None
        if use_lookup:
            gh_var = sorted_lookup(
                binning.cell, [ground, raster.variance], config.cell_count ** 2
            )
        result = classifylib.classify(
            config, binning, z, ground, raster.variance, outlier,
            with_counts=with_aux and not use_lookup, gh_var=gh_var,
        )
        if with_aux and use_lookup:
            # nonground per-cell count via the same one-hot-matmul kernel the
            # rasterizer uses (a plain scatter here costs ~1 ms): the label
            # test IS the considered&nonground indicator (labels==99). Unlike
            # the lookup kernel this REQUIRES sorted cells, so it rides the
            # same fallback cond as the rasterizer.
            from groundgrid_tpu.ops.pallas_raster import raster_sums

            n = config.cell_count
            labels = result.labels

            def count_kernel():
                ng = (labels == classifylib.LABEL_NONGROUND).astype(jnp.float32)
                (counts_flat,) = raster_sums(binning.cell, [ng], [True], n * n)
                return counts_flat.reshape(n, n)

            if is_sorted is not None:
                counts = jax.lax.cond(
                    is_sorted,
                    count_kernel,
                    lambda: classifylib.nonground_counts(config, binning, labels),
                )
            else:
                counts = count_kernel()
            result = result._replace(nonground_count=counts)

        new_state = GridState(
            ground=ground, groundpatch=groundpatch, center=state.center,
            center_lo=state.center_lo,
        )
        out = StepOutput(
            labels=result.labels, outlier=outlier.astype(jnp.int32),
            x=x, y=y, z=z,
        )
        if not with_aux:
            return new_state, out
        aux = AuxLayers(
            points=result.nonground_count,
            points_raw=raster.points_raw,
            ground=ground,
            groundpatch=groundpatch,
            ground_candidates=raster.ground_candidates,
            plane_dist=raster.plane_dist,
            mean_variance=raster.mean_variance,
            m2=raster.m2,
            min_ground_height=raster.min_ground_height,
            max_ground_height=raster.max_ground_height,
            variance=raster.variance,
        )
        return new_state, out, aux

    return step_impl


@functools.lru_cache(maxsize=32)
def make_step(config: GroundGridConfig, with_aux: bool = False, _salt: int = 0):
    """Build the jitted per-scan step for ``config``.

    Returns ``step(state, scan) -> (state', StepOutput[, AuxLayers])``.
    With ``config.wire_format`` the step consumes a :class:`WireScan`
    (device-side dequantization is traced into the same executable).
    The grid state buffers are donated, so steady-state streaming does not
    reallocate the (N, N) layers. Cached per (config, with_aux) so multiple
    drivers share one compiled executable.
    """
    fn = make_step_fn(config, with_aux, _salt)
    if config.wire_format:
        inner = fn

        def fn(state: GridState, w: WireScan):
            return inner(state, dequantize_scan(config, w))

    return jax.jit(fn, donate_argnums=(0,))


def _probe_device_ms(step, state, scan, iters: int = 6):
    """(state', on-device ms/step) from an xplane trace.

    Wall probes on this environment are dispatch-dominated (~5-6 ms/step of
    tunnel RTT even for a healthy sub-ms executable), so they can only catch
    the catastrophic ~500x deopt class; MILD deopts (1.5-2x, also produced
    nondeterministically by the shared compile service) hide inside the
    dispatch noise. The trace reads the executable's actual device duration.
    """
    import tempfile

    import numpy as _np

    import jax as _jax

    from groundgrid_tpu.utils.profiling import jit_device_ms

    tmp = tempfile.mkdtemp(prefix="ggprobe_trace_")
    _jax.profiler.start_trace(tmp)
    out = None
    for _ in range(iters):
        out = step(state, scan)
        state = out[0]
    _ = _np.asarray(out[1].labels)  # force completion inside the window
    _jax.profiler.stop_trace()
    # inf when the trace produced no file / no TPU jit events -- callers
    # fall back to the wall-probe contract
    return state, jit_device_ms(tmp, iters)


def compile_step_verified(
    config: GroundGridConfig,
    example_state: GridState,
    example_scan: Scan,
    with_aux: bool = False,
    attempts: int = 4,
    threshold_ms: float = 10.0,
    device_probe_salts: int = 3,
):
    """Compile the step and *verify its throughput*, re-rolling deopt binaries.

    The axon TPU compile service non-deterministically returns de-optimized
    executables in two classes: catastrophic (~40 ms vs sub-ms -- serialized
    point ops, ~50% of compiles) and MILD (1.5-2x, invisible to wall probes
    under this environment's ~5 ms/step dispatch RTT). Strategy: a wall probe
    filters the catastrophic class per salt (threshold_ms), then an xplane
    DEVICE-TIME probe ranks the survivors and the best of
    ``device_probe_salts`` candidates wins. The winning salt and its device
    time are hinted to disk; later sessions accept the hinted salt
    immediately if its device time is within 15% of the recorded best,
    re-rolling otherwise.

    Returns ``(step, probe_ms)`` where probe_ms is the winning on-device
    ms/step (or the wall probe value when tracing is unavailable). The
    example state is consumed (donated).
    """
    import hashlib
    import os
    import time as _time

    from groundgrid_tpu.utils.compilation_cache import default_cache_dir

    # salt order: a previously verified-good salt first (its binary is pinned
    # in the persistent cache), then fresh salts; time-based salts as a last
    # resort so retries don't re-hit cached deopt binaries.
    key = hashlib.sha1(f"{config!r}|{with_aux}".encode()).hexdigest()[:16]
    hint_path = os.path.join(default_cache_dir(), f"salt_hint_{key}")
    hint_salt, hint_dev = None, None
    try:
        with open(hint_path) as f:
            parts = f.read().strip().split(",")
            hint_salt = int(parts[0])
            if len(parts) > 1:
                hint_dev = float(parts[1])
    except (OSError, ValueError):
        pass
    salts = [] if hint_salt is None else [hint_salt]
    salts += [s for s in range(attempts) if s not in salts]
    salts += [1000 + (int(_time.time()) + i) % 100000 for i in range(2)]
    salts = salts[: attempts + 2]

    def write_hint(salt, dev_ms=None):
        # dev_ms must be an xplane DEVICE time or None: a wall time here
        # would poison the 15% fast-accept check of later sessions (mild
        # deopts hide inside wall numbers, so a ~6 ms wall hint would
        # fast-accept a 2x-slow binary forever)
        try:
            os.makedirs(default_cache_dir(), exist_ok=True)
            with open(hint_path, "w") as f:
                f.write(f"{salt}" if dev_ms is None else f"{salt},{dev_ms:.4f}")
        except OSError:
            pass

    best = None
    best_dev = float("inf")
    best_salt = None
    worst_case = (float("inf"), None)  # least-bad (wall_ms, step) fallback
    state = example_state
    probe_iters = 12  # pipelined: per-call host sync would swamp a 1-shot probe
    import numpy as _np

    probed = 0
    for salt in salts:
        step = make_step(config, with_aux, _salt=salt)
        out = step(state, example_scan)
        state = out[0]
        _ = _np.asarray(out[1].labels)  # force completion (block_until_ready
        t0 = _time.perf_counter()       # can return before deferred work runs)
        for _ in range(probe_iters):
            out = step(state, example_scan)
            state = out[0]
        _ = _np.asarray(out[1].labels)
        wall_ms = (_time.perf_counter() - t0) * 1000.0 / probe_iters
        if wall_ms >= threshold_ms:
            if wall_ms < worst_case[0]:
                worst_case = (wall_ms, step)
            continue  # catastrophic deopt; next salt
        state, dev_ms = _probe_device_ms(step, state, example_scan)
        if not _np.isfinite(dev_ms):
            # no trace events available (e.g. non-TPU backends reached via
            # this path in tests): fall back to the wall-probe contract.
            # Hint the salt only -- never record wall_ms as a device time.
            if best is None:
                write_hint(salt)
                return step, wall_ms
            break
        probed += 1
        if dev_ms < best_dev:
            best, best_dev, best_salt = step, dev_ms, salt
        # hinted salt still in its recorded form: accept without re-rolls
        if (salt == hint_salt and hint_dev is not None
                and dev_ms <= hint_dev * 1.15):
            write_hint(salt, min(dev_ms, hint_dev))
            return step, dev_ms
        if probed >= device_probe_salts:
            break
    if best is not None:
        write_hint(best_salt, best_dev)
        return best, best_dev
    # every salt hit the catastrophic filter: return the least-bad one
    # measured (not whichever happened to compile last)
    return worst_case[1], worst_case[0]


def init_state(config: GroundGridConfig, t_map_velo) -> GridState:
    """First-odometry grid creation (GroundGrid::initGroundGrid).

    ground := odom z, groundpatch := 1e-7, centered on the sensor xy
    (GroundGrid.cpp:50-80). The f64 pose seeds the ds center exactly, as
    grid_map stores its center in doubles.
    """
    t64 = np.asarray(jax.device_get(t_map_velo), np.float64)
    return gridlib.create(config, t64[:2, 3], np.float32(t64[2, 3]))


def pad_scan(
    config: GroundGridConfig,
    points,
    rings,
    t_map_velo,
    t_map_base=None,
    t_base_map=None,
) -> Scan:
    """Host-side helper: pad a raw scan to the static pipeline shapes."""
    import numpy as np

    p = np.asarray(points, dtype=np.float32)
    r = np.asarray(rings, dtype=np.int32)
    count = p.shape[0]
    cap = config.max_points
    if count > cap:
        p, r, count = p[:cap], r[:cap], cap
    pts = np.zeros((3, cap), dtype=np.float32)
    rng = np.zeros((cap,), dtype=np.int32)
    msk = np.zeros((cap,), dtype=np.int32)
    pts[:, :count] = p[:, :3].T
    rng[:count] = r
    msk[:count] = 1

    t_map_velo = np.asarray(t_map_velo, dtype=np.float64)
    if t_map_base is None or t_base_map is None:
        _, t_map_base, t_base_map = tf.scan_poses(t_map_velo)
    return Scan(
        px=jnp.asarray(pts[0]),
        py=jnp.asarray(pts[1]),
        pz=jnp.asarray(pts[2]),
        rings=jnp.asarray(rng),
        valid=jnp.asarray(msk),
        t_map_velo=jnp.asarray(t_map_velo.astype(np.float32)),
        t_map_base=jnp.asarray(np.asarray(t_map_base, np.float32)),
        t_base_map=jnp.asarray(np.asarray(t_base_map, np.float32)),
    )


class CenterTracker:
    """Host-side replica of the grid-center recurrence, in float64.

    In sorted-scan mode the host must know the grid center *before* dispatch
    (to bin + sort points by the cell ids the device will compute), so the
    center evolution lives on the host and its ds image is passed into each
    Scan; the device derives the roll shift from the hi-center delta
    (core/grid.py). The recurrence is grid_map's double math exactly --
    half-away-from-zero whole-cell snap of the f64 position delta, then
    ``center += k * resolution`` in f64 (``getIndexShiftFromPositionShift``;
    golden.py update_odom is the independently-derived oracle copy) -- so
    the shipped ds center tracks the oracle's center bitwise-within-repr
    (~2^-49), not merely to f32.
    """

    def __init__(self, config: GroundGridConfig, center_xy):
        self._res = np.float64(config.resolution)
        self.center64 = np.asarray(center_xy, np.float64).copy()

    @property
    def center(self) -> np.ndarray:
        """f32 hi image (legacy consumers; binning wants :meth:`center_ds`)."""
        return self.center64.astype(np.float32)

    def center_ds(self):
        """(hi, lo) f32 ds image of the f64 center."""
        from groundgrid_tpu.core.exactf32 import f64_to_ds

        return f64_to_ds(self.center64)

    def update(self, position_xy) -> np.ndarray:
        """Advance to (the cell-snapped version of) ``position_xy``.

        Returns the new (2,) float64 center.
        """
        dc = (np.asarray(position_xy, np.float64) - self.center64) / self._res
        # half-away-from-zero via the shared device rule (core/grid.py);
        # np.round would round half-to-even (AUDIT.md #1)
        k = gridlib._snap_cells(dc, xp=np)
        self.center64 = self.center64 + k * self._res
        return self.center64


def _center_ds(center, center_lo=None):
    """Normalize a host center to an f32 (hi, lo) ds pair.

    Accepts a (2,) float64 center (split exactly), or an f32 hi with an
    optional explicit lo tail.
    """
    from groundgrid_tpu.core.exactf32 import f64_to_ds

    c = np.asarray(center)
    if c.dtype == np.float64 and center_lo is None:
        return f64_to_ds(c)
    hi = c.astype(np.float32)
    lo = (
        np.zeros_like(hi)
        if center_lo is None
        else np.asarray(center_lo, np.float32)
    )
    return hi, lo


def predict_cells(config: GroundGridConfig, center, x, y, valid,
                  center_lo=None) -> np.ndarray:
    """Host (numpy f32) replica of the device binning (core/rasterize.py).

    Runs the IDENTICAL double-single op sequence as the device
    (rasterize.faithful_cells with xp=np): every operation is a plain f32
    add/sub/mul/floor with no FMA-fusable pattern left un-pinned, so XLA's
    excess-precision rewrites cannot diverge from numpy -- host and device
    cell ids are bitwise equal, which is what lets the host pre-sort scans.
    ``center`` may be the (2,) f64 tracker center (preferred) or an f32 hi
    with optional ``center_lo`` tail.
    """
    from groundgrid_tpu.core import rasterize as rasterlib2

    n = config.cell_count
    ch, cl = _center_ds(center, center_lo)
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    gi0, gi1 = rasterlib2.faithful_cells(config, ch, cl, x, y, xp=np)
    inmap = (gi0 >= 0) & (gi0 < n) & (gi1 >= 0) & (gi1 < n) & np.asarray(valid, bool)
    return np.where(inmap, gi0.astype(np.int64) * n + gi1, n * n).astype(np.int32)


def prepare_scan(
    config: GroundGridConfig,
    points,
    rings,
    t_map_velo,
    center,
    t_map_base=None,
    t_base_map=None,
):
    """Host-side scan preparation for ``config.sorted_scans`` pipelines.

    Transforms the raw sensor-frame points to the map frame, pads to
    ``max_points``, sorts everything by the predicted flat cell id (binned
    against the host-tracked ``center`` -- preferably the (2,) f64 tracker
    value, shipped to the device as an exact ds pair) and returns
    ``(scan, order)`` where ``order`` is the applied permutation:
    ``sorted_arr = arr[order]``, so per-point outputs are restored with
    ``out[np.argsort(order)]`` (order is host-side only; on-device consumers
    -- eval, grid layers -- are order-invariant).
    """
    p = np.asarray(points, dtype=np.float64)
    r = np.asarray(rings, dtype=np.int32)
    count = min(p.shape[0], config.max_points)
    cap = config.max_points

    t_map_velo = np.asarray(t_map_velo, dtype=np.float64)
    if t_map_base is None or t_base_map is None:
        _, t_map_base, t_base_map = tf.scan_poses(t_map_velo)

    xyz = np.zeros((cap, 3), dtype=np.float32)
    xyz[:count] = tf.transform_points(t_map_velo, p[:count, :3]).astype(np.float32)
    rng = np.zeros((cap,), dtype=np.int32)
    rng[:count] = r[:count]
    msk = np.zeros((cap,), dtype=np.int32)
    msk[:count] = 1

    ch, cl = _center_ds(center)
    cells = predict_cells(config, ch, xyz[:, 0], xyz[:, 1], msk, center_lo=cl)
    order = np.argsort(cells, kind="stable")
    xyz = xyz[order]
    scan = Scan(
        px=jnp.asarray(np.ascontiguousarray(xyz[:, 0])),
        py=jnp.asarray(np.ascontiguousarray(xyz[:, 1])),
        pz=jnp.asarray(np.ascontiguousarray(xyz[:, 2])),
        rings=jnp.asarray(rng[order]),
        valid=jnp.asarray(msk[order]),
        t_map_velo=jnp.asarray(t_map_velo.astype(np.float32)),
        t_map_base=jnp.asarray(np.asarray(t_map_base, np.float32)),
        t_base_map=jnp.asarray(np.asarray(t_base_map, np.float32)),
        center=jnp.asarray(ch),
        center_lo=jnp.asarray(cl),
    )
    return scan, order


def wire_scales(config: GroundGridConfig) -> tuple[np.float32, np.float32]:
    """Per-axis s16 wire quantization steps ``(s_xy, s_z)``, powers of two.

    Powers of two make quantize/dequantize exact f32 multiplies, so the
    NumPy and C++ preps agree bit-for-bit. ``s_xy`` is the *smallest*
    power-of-two step whose +/-32767-step span still covers the grid
    half-span plus a 2 m guard: points beyond that clamp, which is lossless
    for labels because the clamped coordinate is still outside the map (the
    overflow bin both ways). ``s_z`` is one power finer — z never
    participates in cell binning, only in the per-cell min/max/variance
    stats, where its error budget directly perturbs the detection gates.

    Default geometry (120 m grid): s_xy = 2**-9 m = 1.95 mm (+/-64.0 m),
    s_z = 2**-10 m = 0.98 mm (+/-32.0 m around sensor height). The round-4
    1 cm uniform scale let quantization error propagate through the cell
    statistics into 0.4-0.6 pt metric deltas at the KITTI operating point
    (ACCURACY_r5.md); the 5x finer step shrinks both the cell-swap fraction
    (s_xy / resolution of points sit within half a step of a cell edge) and
    the stat perturbation by the same factor, at identical wire bytes.

    The z span additionally floors at +/-16 m: unlike xy (where clamping is
    lossless -- a clamped point is still outside the map), a clamped z is a
    WRONG height inside the map. "One power finer than xy" alone left small
    grids with +/-4-8 m of z span, clamping real overpass/underpass returns
    (wire config fuzz, round 5: 0.4-0.6 pt deltas at dimension <= 17 m), so
    s_z coarsens back -- possibly past s_xy -- until 32767*s_z >= 16 m.
    Unchanged at the default geometry (span was already 32 m).
    """
    need = float(config.half_length) + 2.0
    k = 0
    while 32767.0 * 2.0 ** -(k + 1) >= need:
        k += 1
    kz = k + 1
    while 32767.0 * 2.0 ** -kz < 16.0:
        kz -= 1
    return np.float32(2.0 ** -k), np.float32(2.0 ** -kz)


class WireScan(NamedTuple):
    """Quantized wire format for ingest-bound links (opt-in, ~mm lossy).

    Streaming a scan to the device costs ~2.6 MB in f32 SoA form; on links
    where host->device bandwidth bounds throughput (ROADMAP: the dev
    tunnel's ~50-115 MB/s; any DCN-fed fleet) this 8-byte/point form cuts
    ingest ~2.5x. Coordinates are int16 multiples of the per-axis
    power-of-two steps :func:`wire_scales` (default 1.95 mm xy / 0.98 mm z)
    relative to the grid center (x, y) / sensor height (z); the device
    dequantizes into the standard f32 pipeline. Sorted-scan semantics:
    points are pre-sorted by the cell ids of the *dequantized* coordinates,
    and the valid mask is the length-``count`` prefix (padding and only
    padding sorts behind every real point's bin). Residual classification
    deltas vs the f32 path are measured at the KITTI operating point in
    ACCURACY_r5.md.
    """

    qx: jax.Array  # (P,) int16, (x - center[0]) / s_xy
    qy: jax.Array  # (P,) int16, (y - center[1]) / s_xy
    qz: jax.Array  # (P,) int16, (z - origin_z) / s_z
    rings: jax.Array  # (P,) int16 (SemanticKITTI ids fit)
    count: jax.Array  # () int32: valid prefix length
    t_map_velo: jax.Array
    t_map_base: jax.Array
    t_base_map: jax.Array
    center: jax.Array
    center_lo: jax.Array | None = None  # ds tail (see GridState.center_lo)


def dequantize_scan(config: GroundGridConfig, w: WireScan) -> Scan:
    """Device-side WireScan -> Scan (traced inside the wire step)."""
    sxy, sz = wire_scales(config)
    x = w.qx.astype(jnp.float32) * sxy + w.center[0]
    y = w.qy.astype(jnp.float32) * sxy + w.center[1]
    z = w.qz.astype(jnp.float32) * sz + w.t_map_velo[2, 3]
    valid = (jnp.arange(config.max_points, dtype=jnp.int32) < w.count).astype(jnp.int32)
    return Scan(
        px=x, py=y, pz=z, rings=w.rings.astype(jnp.int32), valid=valid,
        t_map_velo=w.t_map_velo, t_map_base=w.t_map_base,
        t_base_map=w.t_base_map, center=w.center, center_lo=w.center_lo,
    )


def make_wire_step(config: GroundGridConfig, with_aux: bool = False):
    """Jitted per-scan step consuming :class:`WireScan` (sorted-scan mode).

    Equivalent to ``make_step`` with ``config.wire_format=True`` (kept as the
    named entry point for wire consumers).
    """
    if not config.sorted_scans:
        raise ValueError("the wire format requires config.sorted_scans")
    if not config.wire_format:
        config = dataclasses.replace(config, wire_format=True)
    return make_step(config, with_aux)


def prepare_scan_wire(
    config: GroundGridConfig,
    points,
    rings,
    t_map_velo,
    center,
    t_map_base=None,
    t_base_map=None,
):
    """Host prep for the s16 wire format: quantize, then bin/sort the
    *dequantized* f32 coordinates (exactly what the device will see), so the
    device-side sortedness holds. Returns ``(WireScan, order)``."""
    p = np.asarray(points, dtype=np.float64)
    r = np.asarray(rings, dtype=np.int32)
    count = min(p.shape[0], config.max_points)
    cap = config.max_points

    t_map_velo = np.asarray(t_map_velo, dtype=np.float64)
    if t_map_base is None or t_base_map is None:
        _, t_map_base, t_base_map = tf.scan_poses(t_map_velo)
    ch, cl = _center_ds(center)
    origin_z = np.float32(t_map_velo[2, 3].astype(np.float32))

    xyz = np.zeros((cap, 3), dtype=np.float32)
    xyz[:count] = tf.transform_points(t_map_velo, p[:count, :3]).astype(np.float32)
    refs = np.array([ch[0], ch[1], origin_z], np.float32)
    sxy, sz = wire_scales(config)
    scales = np.array([sxy, sxy, sz], np.float32)
    # power-of-two steps: the 1/s multiply is exact, matching the C++ prep
    q = np.clip(
        np.rint((xyz - refs[None, :]) * (np.float32(1.0) / scales)[None, :]),
        -32768, 32767,
    ).astype(np.int16)
    # padding quantizes to garbage offsets; zero it so dequant stays tame
    q[count:] = 0
    dq = q.astype(np.float32) * scales[None, :] + refs[None, :]

    msk = np.zeros((cap,), dtype=np.int32)
    msk[:count] = 1
    cells = predict_cells(config, ch, dq[:, 0], dq[:, 1], msk, center_lo=cl)
    # the wire valid mask is the length-count prefix: padding must sort
    # strictly behind every real point (stable sort keeps real out-of-map
    # points, which share the overflow bin, ahead of padding)
    order = np.argsort(cells, kind="stable")
    q = q[order]
    rng = np.zeros((cap,), dtype=np.int16)
    rng[:count] = r[:count].astype(np.int16)
    w = WireScan(
        qx=jnp.asarray(np.ascontiguousarray(q[:, 0])),
        qy=jnp.asarray(np.ascontiguousarray(q[:, 1])),
        qz=jnp.asarray(np.ascontiguousarray(q[:, 2])),
        rings=jnp.asarray(rng[order]),
        count=jnp.asarray(np.int32(count)),
        t_map_velo=jnp.asarray(t_map_velo.astype(np.float32)),
        t_map_base=jnp.asarray(np.asarray(t_map_base, np.float32)),
        t_base_map=jnp.asarray(np.asarray(t_base_map, np.float32)),
        center=jnp.asarray(ch),
        center_lo=jnp.asarray(cl),
    )
    return w, order
