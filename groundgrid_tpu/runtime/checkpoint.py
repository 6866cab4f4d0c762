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

_FORMAT_VERSION = 1


def save_state(
    path: str,
    state: GridState,
    next_scan_index: int,
    config: GroundGridConfig,
    extra: Optional[dict] = None,
) -> None:
    """Persist grid state + stream position (atomic via rename)."""
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
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        ground=np.asarray(state.ground),
        groundpatch=np.asarray(state.groundpatch),
        center=np.asarray(state.center),
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
        if meta["version"] != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {meta['version']}")
        saved = meta["config"]
        if (saved["dimension"], saved["resolution"]) != (config.dimension, config.resolution):
            raise ValueError(
                f"checkpoint grid {saved['dimension']}m/{saved['resolution']}m "
                f"!= config {config.dimension}m/{config.resolution}m"
            )
        state = GridState(
            ground=jnp.asarray(f["ground"]),
            groundpatch=jnp.asarray(f["groundpatch"]),
            center=jnp.asarray(f["center"]),
        )
        return state, int(meta["next_scan_index"]), meta.get("extra", {})
