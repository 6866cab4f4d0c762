"""Checkpoint / resume for the streaming engine.

The reference keeps its grid only in RAM (no persistence at all,
SURVEY.md section 5.4); here the whole recurrent state is one small pytree
(two (N, N) layers + center), so saving and restoring at any scan boundary is
a single .npz. Combined with the data reader's ``seek_index`` (the player's
seek, kitti_data_publisher.py:255-261), an interrupted evaluation resumes
deterministically: state(t) + scans(t+1..) reproduce the uninterrupted run
bit-for-bit (the pipeline is a pure function of (state, scan)).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core.grid import GridState

_FORMAT_VERSION = 2


def save_state(
    path: str,
    state: GridState,
    next_scan_index: int,
    config: GroundGridConfig,
    extra: Optional[dict] = None,
    center64=None,
) -> None:
    """Persist grid state + stream position (atomic via rename).

    ``center64``: the host tracker's exact (2,) f64 center, if available --
    it resumes the sorted-scan binning recurrence bit-exactly; otherwise the
    ds reconstruction ``center + center_lo`` is stored (exact to ~2^-48).
    """
    import jax

    state = jax.device_get(state)
    meta = dict(
        version=_FORMAT_VERSION,
        next_scan_index=int(next_scan_index),
        config={k: getattr(config, k) for k in (
            "dimension", "resolution", "max_points",
        )},
        extra=extra or {},
    )
    center = np.asarray(state.center)
    center_lo = (
        np.zeros_like(center)
        if state.center_lo is None
        else np.asarray(state.center_lo)
    )
    if center64 is None:
        center64 = center.astype(np.float64) + center_lo.astype(np.float64)
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        ground=np.asarray(state.ground),
        groundpatch=np.asarray(state.groundpatch),
        center=center,
        center_lo=center_lo,
        center64=np.asarray(center64, np.float64),
        meta=json.dumps(meta),
    )
    # np.savez appends .npz
    actual_tmp = tmp if tmp.endswith(".npz") else tmp + ".npz"
    os.replace(actual_tmp, path)


def load_state(path: str, config: GroundGridConfig) -> Tuple[GridState, int, dict]:
    """Restore (state, next_scan_index, extra); validates grid geometry."""
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as f:
        meta = json.loads(str(f["meta"]))
        if meta["version"] not in (1, _FORMAT_VERSION):
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        saved = meta["config"]
        if (saved["dimension"], saved["resolution"]) != (config.dimension, config.resolution):
            raise ValueError(
                f"checkpoint grid {saved['dimension']}m/{saved['resolution']}m "
                f"!= config {config.dimension}m/{config.resolution}m"
            )
        center = np.asarray(f["center"])
        center_lo = (
            np.asarray(f["center_lo"])
            if "center_lo" in f.files
            else np.zeros_like(center)
        )
        state = GridState(
            ground=jnp.asarray(f["ground"]),
            groundpatch=jnp.asarray(f["groundpatch"]),
            center=jnp.asarray(center),
            center_lo=jnp.asarray(center_lo),
        )
        extra = meta.get("extra", {})
        if "center64" in f.files:
            extra = dict(extra, center64=np.asarray(f["center64"], np.float64))
        return state, int(meta["next_scan_index"]), extra
