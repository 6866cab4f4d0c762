"""f64-faithful ray-march lattice binning (VERDICT r3 weak #1).

The reference bins occlusion-ray samples through grid_map's double-precision
index math (GroundSegmentation.cpp:262-268; golden.py:203-205 via ``_index``).
Round 3 left the device march binning in plain f32 -- content-dependently
harmless, structurally divergent. This module PLANTS lattice samples within
~1 f32 ulp of a cell edge, on a grid whose center is not f32-exact (KITTI
map-frame coordinate scale), arms exactly one cell of the edge pair with
occlusion confidence, and asserts the device march reproduces the f64
oracle's outlier decision bitwise -- in both the XLA row-gather and the
sorted-lookup kernel routes.

The crafting loop *verifies* adversariality: every kept candidate's decisive
sample bins DIFFERENTLY under the old plain-f32 index math than under the
oracle's f64 math, i.e. the pre-fix march provably flips these decisions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import outliers as outlierlib
from groundgrid_tpu.core import rasterize as rasterlib

RES = 0.5
HALF = 20.0  # dimension 40, f32-exact on purpose: isolates the CENTER error
# not f32-exact, and its f32-computed max edge straddles an f32 lattice
# point vs the f64 edge (a ~7.3e-6 m disagreement band above every column
# edge of this grid -- verified by the crafting loop below)
CENTER64 = np.float64(1000.07)

# armed column -> (armed row, arm the f64-side cell?). f64-side arming makes
# the oracle say OUTLIER where plain-f32 binning would miss; old-f32-side
# arming the reverse. Rows are distinct so each column's armed cell is
# isolated; the full armed set is still checked for every ray (rays drift
# across rows at far steps).
COMBOS = {26: (38, True), 30: (39, True), 34: (40, True), 52: (41, False), 61: (42, False)}
STEPS = (7, 10, 17)


def _cfg() -> GroundGridConfig:
    return GroundGridConfig(
        dimension=2 * HALF, resolution=RES, max_points=4096, ray_steps=40,
        max_outlier_candidates=512,
    )


def _golden_index(coord: float) -> int:
    """grid_map f64 binning for one axis (golden.py:92-96)."""
    return int(np.floor(((CENTER64 + np.float64(HALF)) - np.float64(coord)) / np.float64(RES)))


def _old_f32_index(coord: np.float32) -> int:
    """The pre-fix device binning: plain f32 throughout (old outliers.py:267)."""
    c32 = np.float32(CENTER64)
    return int(np.float32(np.float32(np.float32(c32 + np.float32(HALF)) - coord) / np.float32(RES)))


def _armed_cells() -> set[tuple[int, int]]:
    out = set()
    for m, (row, gold_side) in COMBOS.items():
        out.add((row, m - 1 if gold_side else m))
    return out


def _golden_ray(p: np.ndarray, origin: np.ndarray):
    """The oracle's ray setup, transcribed from golden.py:197-202."""
    vec = p.astype(np.float32) - origin
    length = np.float32(np.sqrt(np.sum(vec.astype(np.float64) ** 2)))
    vec = vec / length
    return vec, length


def _golden_marches(p, origin, armed: set, n: int):
    """Full golden march decision for one candidate (golden.py:195-219).

    groundpatch is 1e-7 everywhere except 1.5 at the armed cells (whose 3x3
    block sums pass anywhere adjacent, but the >0.01 cell test passes only
    AT an armed cell); ground is 0 except +10 at armed cells, so a
    descending ray below z~9 hits iff some sample bins into an armed cell.
    """
    vec, length = _golden_ray(p, origin)
    step = 3
    while step * step < length * length and vec[2] < np.float32(-0.01):
        sx = np.float32(origin[0] + np.float32(step * vec[0]))
        sy = np.float32(origin[1] + np.float32(step * vec[1]))
        i0, i1 = _golden_index(sx), _golden_index(sy)
        if not (i0 <= 0 or i1 <= 0 or i0 >= n - 1 or i1 >= n - 1):
            if (i0, i1) in armed:
                # ground=10 >= ray_z + tol for any plausible descending ray
                return True, step
        step += 1
    return False, -1


def _craft_candidates(cfg: GroundGridConfig):
    """Candidates whose decisive lattice sample straddles a cell edge.

    For each (march step k, armed column m) combo, walk the candidate
    point's y coordinate in sub-ulp increments until the k-step sample's y
    lands within 1 ulp of the column edge AND the old plain-f32 binning
    disagrees with the f64 oracle binning -- i.e. the pre-fix march gets
    this decision WRONG.
    """
    n = cfg.cell_count
    armed = _armed_cells()
    origin = np.array([CENTER64, CENTER64, 2.0], dtype=np.float32)
    pts, expected, info = [], [], []
    for k in STEPS:
        for m, (row, gold_side) in COMBOS.items():
            edge = (CENTER64 + HALF) - m * RES
            ulp = np.spacing(np.float32(edge))
            # aim the k-step sample at (row center x, edge y)
            dxk = (CENTER64 + HALF) - (row + 0.5) * RES - CENTER64
            dyk = edge - CENTER64
            lat2 = dxk * dxk + dyk * dyk
            if lat2 > (0.9 * k) ** 2:
                continue  # a unit-speed ray cannot reach the edge by step k
            vx, vy = dxk / k, dyk / k
            vz = -np.sqrt(1.0 - vx * vx - vy * vy)
            L = k + 5.0
            # the candidate point itself must be in-map and past the 12 m^2
            # near-field ignore radius (GroundSegmentation.cpp:237-240)
            if max(abs(L * vx), abs(L * vy)) > 19.0 or (L / k) ** 2 * lat2 < 13.0:
                continue
            base = np.array(
                [origin[0] + L * vx, origin[1] + L * vy, origin[2] + L * vz],
                dtype=np.float32,
            )
            found = 0
            for j in range(-400, 400):
                p = base.copy()
                p[1] = np.float32(base[1] + np.float32(j) * np.float32(ulp) * np.float32(0.4))
                vec, length = _golden_ray(p, origin)
                if not (k * k < length * length and vec[2] < np.float32(-0.01)):
                    continue
                sy = np.float32(origin[1] + np.float32(k * vec[1]))
                if abs(np.float64(sy) - edge) > 1.0001 * ulp:
                    continue
                i1_gold = _golden_index(sy)
                if i1_gold not in (m - 1, m):
                    continue
                if _old_f32_index(sy) == i1_gold:
                    continue  # not adversarial: old f32 math agrees here
                sx = np.float32(origin[0] + np.float32(k * vec[0]))
                if _golden_index(sx) != row:
                    continue
                hit, at_step = _golden_marches(p, origin, armed, n)
                # the decisive sample must be THE near-edge one: a hit at a
                # different step (or a hit that doesn't match the armed
                # side) would not discriminate old-vs-new binning
                if hit != (gold_side and i1_gold == m - 1):
                    continue
                if hit and at_step != k:
                    continue
                pts.append(p)
                expected.append(hit)
                info.append((k, m, i1_gold, hit))
                found += 1
                if found >= 2:
                    break
    return origin, np.array(pts, np.float32), np.array(expected, bool), info


@pytest.fixture(scope="module")
def crafted():
    cfg = _cfg()
    origin, pts, expected, info = _craft_candidates(cfg)
    # non-vacuous: the edge band must be reachable and both decisions present
    assert len(pts) >= 8, f"crafting found only {len(pts)} near-edge candidates: {info}"
    assert expected.any() and (~expected).any(), info
    return cfg, origin, pts, expected


def _run_detect(cfg, origin, pts, use_lookup: bool):
    n = cfg.cell_count
    chead = np.float32(CENTER64)
    clo = np.float32(CENTER64 - np.float64(chead))
    center = jnp.asarray([chead, chead])
    center_lo = jnp.asarray([clo, clo])
    ground = np.zeros((n, n), np.float32)
    patch = np.full((n, n), 1e-7, np.float32)
    for (r, c) in _armed_cells():
        ground[r, c] = 10.0
        patch[r, c] = 1.5

    # pad to a lookup-kernel-friendly point count (multiple of 1024)
    P = 1024
    x = np.zeros(P, np.float32)
    y = np.zeros(P, np.float32)
    z = np.zeros(P, np.float32)
    x[: len(pts)] = pts[:, 0]
    y[: len(pts)] = pts[:, 1]
    z[: len(pts)] = pts[:, 2]
    valid = np.zeros(P, bool)
    valid[: len(pts)] = True
    rings = np.zeros(P, np.int32)

    binning = rasterlib.bin_points(
        cfg, center, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        jnp.asarray(rings), jnp.asarray(valid), jnp.asarray(origin),
        center_lo=center_lo,
    )
    out = outlierlib.detect_outliers(
        cfg, center, jnp.asarray(ground), jnp.asarray(patch), binning,
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), jnp.asarray(origin),
        center_lo=center_lo, use_lookup_kernel=use_lookup, _interpret=use_lookup,
    )
    return np.asarray(out)[: len(pts)]


def test_near_edge_samples_match_oracle(crafted):
    cfg, origin, pts, expected = crafted
    got = _run_detect(cfg, origin, pts, use_lookup=False)
    np.testing.assert_array_equal(got, expected)


def test_near_edge_samples_match_oracle_lookup_kernel(crafted):
    cfg, origin, pts, expected = crafted
    got = _run_detect(cfg, origin, pts, use_lookup=True)
    np.testing.assert_array_equal(got, expected)
