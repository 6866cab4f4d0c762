"""groundgrid_tpu: a TPU-native LiDAR ground-segmentation & terrain engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
dcmlr/groundgrid (IEEE RA-L 2024, DOI 10.1109/LRA.2023.3333233): a moving
ego-centric elevation grid, a fully-jitted per-scan ground/non-ground
segmentation pipeline, a SemanticKITTI data + evaluation harness, and
streaming/batched (fleet) drivers -- no ROS, no host-side hot loops.
"""

from groundgrid_tpu.config import DEFAULT_CONFIG, HIGHRES_CONFIG, GroundGridConfig
from groundgrid_tpu.core.grid import GridState
from groundgrid_tpu.pipeline import Scan, StepOutput, init_state, make_step, pad_scan

__version__ = "0.1.0"

__all__ = [
    "GroundGridConfig",
    "DEFAULT_CONFIG",
    "HIGHRES_CONFIG",
    "GridState",
    "Scan",
    "StepOutput",
    "init_state",
    "make_step",
    "pad_scan",
    "__version__",
]
