"""Configuration for the TPU-native GroundGrid engine.

Mirrors the reference's dynamic_reconfigure parameter set
(``cfg/GroundGrid.cfg:8-21``) plus the grid geometry constants
(``include/groundgrid/GroundGrid.h:70-71``) and the algorithm constants
(``include/groundgrid/GroundSegmentation.h:68-70``), re-packaged as a frozen,
hashable dataclass so it can be closed over by ``jax.jit``-compiled pipelines.

Unlike the reference (hot-reload via a ROS dynamic_reconfigure server,
``GroundGridNodelet.cpp:299-302``), a config change here simply builds a new
jitted pipeline; XLA caches compilations per unique config, so flipping back
and forth between configs is cheap after first compile.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class GroundGridConfig:
    """Runtime-tunable parameters. Names & defaults match ``cfg/GroundGrid.cfg``.

    The reference typo ``miminum_point_height_threshold`` is preserved on
    purpose (``cfg/GroundGrid.cfg:13``) so configs written against the
    reference map over 1:1.
    """

    # --- segmentation parameters (cfg/GroundGrid.cfg:8-21) ---
    point_count_cell_variance_threshold: int = 10
    max_ring: int = 1024
    # NOTE: unused by the reference algorithm as well (verified by grep); kept
    # for config-surface parity.
    groundpatch_detection_minimum_threshold: float = 0.01
    distance_factor: float = 0.0001
    minimum_distance_factor: float = 0.0005
    miminum_point_height_threshold: float = 0.3  # sic, reference typo
    minimum_point_height_obstacle_threshold: float = 0.1
    outlier_tolerance: float = 0.1
    ground_patch_detection_minimum_point_count_threshold: float = 0.25
    patch_size_change_distance: float = 20.0
    occupied_cells_decrease_factor: float = 5.0
    occupied_cells_point_count_factor: float = 20.0
    min_outlier_detection_ground_confidence: float = 1.25
    # No-op on TPU (kept for API parity with cfg/GroundGrid.cfg:21): point
    # parallelism is implicit in the vectorized segment ops.
    thread_count: int = 8

    # --- grid geometry (include/groundgrid/GroundGrid.h:70-71) ---
    dimension: float = 120.0  # metres (square grid side length)
    resolution: float = 0.33  # metres per cell

    # --- sensor constants (include/groundgrid/GroundSegmentation.h:68-70) ---
    # 0.2 degrees in radians: HDL-64E average angular spacing per laser.
    vertical_point_ang_dist: float = 0.00174532925 * 2
    min_dist_squared: float = 12.0  # metres^2; closer points are "ignored"

    # --- TPU pipeline shape parameters (no reference equivalent) ---
    # Fixed-size point buffer; scans are padded/masked to this size so the
    # jitted pipeline has static shapes. HDL-64E scans are ~130k points.
    max_points: int = 131072
    # Static upper bound for the outlier occlusion ray-march
    # (GroundSegmentation.cpp:258): steps are whole metres along a unit ray
    # starting at step 3; rays are capped by the grid half-diagonal
    # (~85m for the default 120m grid), so 96 is conservative.
    ray_steps: int = 96
    # Static bound on the number of below-ground candidate points that are
    # ray-marched per scan. The reference marches every candidate; we compact
    # candidates into a fixed-size buffer, keeping the DEEPEST-below-terrain
    # ones on overflow (core/outliers.py) -- the rest are treated as
    # non-outliers (i.e. kept as regular points). Warm-scan candidate counts
    # reach ~1000 at the default geometry on benign scenes
    # (tests/test_full_geometry.py) but peak ~5500 FIRED outliers (candidates
    # higher still) in occlusion storms -- bridge underpasses + sub-surface
    # reflections, measured on the round-3 adversarial benchmark -- so 8192
    # keeps headroom for both. The march cost is adaptive (``march_chunk``),
    # so the large cap prices in only on scans whose candidates actually
    # exceed a chunk boundary. Cold-start scans
    # (fresh grid, everything "below" the sensor-height init) overflow by
    # design and harmlessly: the confidence map is all-zero, so no march can
    # fire anywhere.
    max_outlier_candidates: int = 8192
    # Widest-tier candidate width of the budget-tiered ray-march
    # (core/outliers.py): steps [3, 8) march this many budget-sorted
    # candidates per chunk, steps [8, 64) half as many, steps
    # [64, ray_steps) an eighth (the tiers follow the measured bimodal
    # warm-scan budget distribution, scripts/march_stats.py). Every tier's
    # FIRST chunk is peeled into one fused lattice (warm scans never run a
    # while_loop -- a 1-trip loop costs ~100 us in serial structure alone);
    # occlusion storms continue in per-tier while_loops that stop at each
    # tier's actual active-prefix count, up to
    # ``max_outlier_candidates / (march_chunk / tier_div)`` chunks. A
    # lax.switch chunk-size ladder was measured and rejected: TPU
    # conditionals are scheduling barriers whose cost scales with the
    # branch bodies PRESENT, not just the branch taken -- a 4-tier
    # 1024/2048/4096/8192 switch cost +0.5 ms/scan and a 2-tier 2048/8192
    # +0.8 ms/scan, on steps whose candidates fit the smallest tier either
    # way.
    march_chunk: int = 1024
    # Reproduce the reference's "drop points within 3 cells of the max-index
    # border" quirk (GroundSegmentation.cpp:167-168).
    border_drop: bool = True
    # Pallas TPU kernels: None = auto (on when running on TPU), or force
    # True/False. The Pallas and XLA paths are numerically equivalent
    # (tests/test_pallas_spiral.py); Pallas is ~25x faster on a v5e.
    use_pallas: bool | None = None
    # Sorted-scan mode: scans are host-prepared (see pipeline.prepare_scan) --
    # points pre-transformed to the map frame and pre-sorted by flat cell id,
    # with the host-tracked grid center supplied per scan. Enables the
    # scatter-free Pallas rasterizer (ops/pallas_raster.py). The device
    # verifies monotonicity and falls back to the scatter path for scans
    # that are not actually sorted (e.g. a host/device fp divergence).
    sorted_scans: bool = False
    # Skip the on-device sortedness check + fallback branch (the lax.cond
    # becomes both-branches-execute under vmap, so batched/fleet pipelines
    # set this False only if the host guarantees sorted input).
    sorted_fallback_check: bool = True
    # Quantized s16 wire format for ingest-bound links (pipeline.WireScan):
    # scans ship as int16 offsets in per-axis power-of-two steps derived
    # from the grid span (pipeline.wire_scales; default 1.95 mm xy /
    # 0.98 mm z) -- 8 B/point vs 20 B/point f32 SoA, ~2.5x smaller D2H/DCN
    # ingest -- and dequantize on device. Opt-in (~mm lossy); requires
    # sorted_scans (the wire prep pre-sorts by the dequantized coordinates'
    # cell ids).
    wire_format: bool = False
    # Fused detect stencil (ops/pallas_detect.py): compute all eight windowed
    # reductions of the ground-patch detection stage + the branch ladder in
    # one Pallas VMEM pass instead of eight reduce_window fusion roots.
    # Numerics: identical thresholds (same f64 host tables), but box-sum
    # accumulation order differs from reduce_window by <= a few ulps, so
    # label divergence vs the default path is confined to the near-threshold
    # tie class (own fuzz campaign: scripts/config_fuzz.py --fused). Opt-in.
    fused_detect: bool = False
    # Degraded-mode policy for a scan whose pose is missing/non-finite: False
    # drops the scan (the nodelet's behavior when the cloud transform lookup
    # fails, GroundGridNodelet.cpp:133-136); True reuses the last good pose
    # with a warning (the grid updater's stale-transform fallback,
    # GroundGrid.cpp:102-114). Raw-record streams only -- host-prepared
    # (native sorted loader) scans were already binned against the bad pose
    # and are dropped either way.
    stale_pose_reuse: bool = False

    @property
    def cell_count(self) -> int:
        """Grid cells per side; grid_map rounds (GridMap::setGeometry)."""
        return int(round(self.dimension / self.resolution))

    @property
    def half_length(self) -> float:
        """Half the *actual* grid side length (= cells * resolution / 2)."""
        return self.cell_count * self.resolution / 2.0

    @property
    def center_cell(self) -> int:
        """Spiral-interpolation center index (GroundSegmentation.cpp:403)."""
        return self.cell_count // 2 - 1

    def validate(self) -> "GroundGridConfig":
        if self.cell_count < 8:
            raise ValueError(f"grid too small: {self.cell_count} cells/side")
        if self.max_points <= 0:
            raise ValueError("max_points must be positive")
        if not math.isfinite(self.resolution) or self.resolution <= 0:
            raise ValueError("resolution must be positive")
        if self.wire_format and not self.sorted_scans:
            raise ValueError(
                "wire_format requires sorted_scans (the s16 wire prep "
                "pre-sorts by the dequantized coordinates' cell ids)"
            )
        return self


DEFAULT_CONFIG = GroundGridConfig()

# The 0.1m / 120m stress configuration from BASELINE.json (config 4).
HIGHRES_CONFIG = GroundGridConfig(resolution=0.1)
