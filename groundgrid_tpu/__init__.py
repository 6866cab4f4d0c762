"""groundgrid_tpu: a TPU-native LiDAR ground-segmentation & terrain engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dcmlr/groundgrid (IEEE RA-L 2024, DOI 10.1109/LRA.2023.3333233): a moving
ego-centric elevation grid, a fully-jitted per-scan ground/non-ground
segmentation pipeline, a SemanticKITTI data + evaluation harness, and
streaming/batched (fleet) drivers -- no ROS, no host-side hot loops.
"""

from groundgrid_tpu.config import DEFAULT_CONFIG, HIGHRES_CONFIG, GroundGridConfig
from groundgrid_tpu.core.grid import GridState
from groundgrid_tpu.pipeline import (
    CenterTracker,
    Scan,
    StepOutput,
    WireScan,
    compile_step_verified,
    init_state,
    make_step,
    make_step_fn,
    make_wire_step,
    pad_scan,
    prepare_scan,
    prepare_scan_wire,
)

__version__ = "0.1.0"

__all__ = [
    "GroundGridConfig",
    "DEFAULT_CONFIG",
    "HIGHRES_CONFIG",
    "GridState",
    "Scan",
    "StepOutput",
    "WireScan",
    "CenterTracker",
    "init_state",
    "make_step",
    "make_step_fn",
    "make_wire_step",
    "compile_step_verified",
    "pad_scan",
    "prepare_scan",
    "prepare_scan_wire",
    "__version__",
]


def __getattr__(name):
    # heavier runtime entry points, imported lazily
    if name == "StreamingDriver":
        from groundgrid_tpu.runtime.driver import StreamingDriver

        return StreamingDriver
    if name == "FleetDriver":
        from groundgrid_tpu.runtime.fleet import FleetDriver

        return FleetDriver
    if name == "Evaluator":
        from groundgrid_tpu.eval.metrics import Evaluator

        return Evaluator
    if name == "SemanticKITTI":
        from groundgrid_tpu.data.semantickitti import SemanticKITTI

        return SemanticKITTI
    if name == "SortedPrefetchingLoader":
        from groundgrid_tpu.data.native_loader import SortedPrefetchingLoader

        return SortedPrefetchingLoader
    if name == "WirePrefetchingLoader":
        from groundgrid_tpu.data.native_loader import WirePrefetchingLoader

        return WirePrefetchingLoader
    if name == "DeviceEvaluator":
        from groundgrid_tpu.eval.device import DeviceEvaluator

        return DeviceEvaluator
    if name == "LiveServer":
        from groundgrid_tpu.runtime.live import LiveServer

        return LiveServer
    if name == "run_accuracy_benchmark":
        from groundgrid_tpu.eval.accuracy import run_accuracy_benchmark

        return run_accuracy_benchmark
    if name == "banded_spiral":
        from groundgrid_tpu.parallel.spiral_shard import banded_spiral

        return banded_spiral
    if name == "make_spatial_step":
        from groundgrid_tpu.parallel.spatial import make_spatial_step

        return make_spatial_step
    if name == "MultiHostFleet":
        from groundgrid_tpu.parallel.multihost import MultiHostFleet

        return MultiHostFleet
    raise AttributeError(f"module 'groundgrid_tpu' has no attribute {name!r}")
