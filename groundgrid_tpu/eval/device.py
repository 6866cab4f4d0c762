"""On-device evaluation accumulator.

The host evaluator (eval/metrics.py) needs the labels on the host, and on a
remote/tunneled TPU every device-to-host read is a synchronous round trip
(~35 ms) -- 4x the cost of the segmentation step itself. This accumulator
keeps the confusion counts on device: one (P, 4)-column scatter-add per scan
into a (MAX_LABEL_ID, 4) table, fetched once at the end of the run.

Counts are bit-identical to the host evaluator (integer adds), verified in
tests/test_eval.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from groundgrid_tpu.data import labels as L
from groundgrid_tpu.eval.metrics import Evaluator

# column order in the accumulator table
_NONGROUND, _TP, _FP, _TOTAL = range(4)


def init_counts() -> jax.Array:
    return jnp.zeros((L.MAX_LABEL_ID, 4), jnp.int32)


@functools.lru_cache(maxsize=1)
def _ground_set_table() -> np.ndarray:
    t = np.zeros(L.MAX_LABEL_ID, np.bool_)
    t[L.ALL_GROUND_IDS] = True
    return t


@jax.jit
def accumulate(counts, pred_labels, gt_labels):
    """counts += confusion contributions of one scan (all on device).

    pred_labels: (P,) int32 49/99/0 (0 = dropped, not scored).
    gt_labels:   (P,) int32 SemanticKITTI ids (the Scan.rings channel).
    """
    gt = jnp.clip(gt_labels, 0, L.MAX_LABEL_ID - 1)
    gset = jnp.asarray(_ground_set_table())[gt]
    scored = pred_labels > 0
    is_ng = pred_labels == 99
    is_g = pred_labels == 49
    vals = jnp.stack(
        [
            is_ng.astype(jnp.int32),
            (is_g & gset).astype(jnp.int32),
            (is_g & ~gset).astype(jnp.int32),
            scored.astype(jnp.int32),
        ],
        axis=-1,
    )
    tgt = jnp.where(scored, gt, L.MAX_LABEL_ID)
    return counts.at[tgt].add(vals, mode="drop")


class DeviceEvaluator:
    """Drop-in for :class:`Evaluator` that defers all host reads.

    Feed it device arrays (the step's ``labels`` output and ``scan.rings``);
    call :meth:`to_host` once at the end to obtain a populated
    :class:`Evaluator` with identical counts.
    """

    def __init__(self, sequence: str = "00"):
        self.sequence = sequence
        self.counts = init_counts()
        self.clouds = 0

    def add_cloud_device(self, pred_labels, gt_labels) -> None:
        self.counts = accumulate(self.counts, pred_labels, gt_labels)
        self.clouds += 1

    def to_host(self) -> Evaluator:
        ev = Evaluator(self.sequence)
        c = np.asarray(jax.device_get(self.counts)).astype(np.int64)
        ev.nonground_count = c[:, _NONGROUND]
        ev.true_positive = c[:, _TP]
        ev.false_positive = c[:, _FP]
        ev.total = c[:, _TOTAL]
        ev.clouds = self.clouds
        return ev
