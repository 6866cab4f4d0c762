"""Error-free float32 transforms: the bitwise-parity substrate.

The reference binning and ray-march run in C++ doubles (`grid_map`'s
``getIndexFromPosition`` and the tf2 pose math are double precision;
``GroundSegmentation.cpp:242-275`` marches rays whose positions are binned
through the same double-precision index math). TPUs have no f64, and the
difference matters: the segmentation state feeds back scan over scan, so a
single mis-binned point (a point within ~1 f32 ulp of a cell edge that the
two precisions assign to different cells) shifts two cells' statistics,
flips a detect-threshold decision, and the spiral then spreads the error --
the dominant pipeline-vs-oracle divergence mechanism measured by the round-3
accuracy benchmark (ACCURACY.md).

This module provides double-single ("ds") arithmetic -- error-free f32
transforms (Dekker/Knuth) -- so the device can evaluate the few
*discontinuous* decisions (floor-binning, ray thresholds) faithfully to the
f64 semantics of the oracle, while all smooth math stays plain f32:

  * ``two_sum`` / ``quick_two_sum`` -- exact a+b as a (hi, lo) pair.
  * ``two_prod`` -- exact a*b as a (hi, lo) pair (Dekker split; no FMA
    required: every partial product is exact by construction, so XLA's
    FMA contraction cannot change results).
  * ``ds_add`` / ``ds_sub_f32`` / ``ds_lt0`` / ``ds_ge0`` -- normalized
    double-single sums and exact sign tests.
  * ``div_rn`` -- correctly-rounded f32 division (TPU's native f32 divide
    is reciprocal+refinement, NOT IEEE; numpy's is IEEE, and the oracle's
    decisions hang off those last ulps).
  * ``sqrt_rn_ds`` -- f32 square root of a ds value, correctly rounded
    (the oracle computes ray lengths as f32(sqrt(f64 sum of squares))).

Everything is elementwise jnp; ~tens of VPU flops per lane, negligible
against the gathers these decisions guard. All functions assume
round-to-nearest f32 hardware (true of the TPU VPU and every XLA CPU) and
finite inputs in the pipeline's physical range (|x| < 2^20 m, so Dekker's
4097-scaling cannot overflow).

Oracle citations: golden.py `_index` (grid_map ``getIndexFromPosition``,
double), GroundSegmentation.cpp:242-275 (ray march), GroundGrid.cpp:83-147
(double-precision center recurrence).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

_SPLIT = np.float32(4097.0)  # 2^12 + 1: Dekker split constant for f32


def two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def quick_two_sum(a, b):
    """Fast two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    return s, b - (s - a)


def split(a, xp=jnp):
    """Dekker split: a == hi + lo with hi carrying <= 12 significant bits
    and lo <= 12, so products of halves are exact in f32.

    The ``t - a`` step MUST see the rounded product ``t = fl(a * 4097)``:
    an FMA contraction (exact ``a*4097 - a``) would silently destroy the
    split, so the product is pinned behind an optimization barrier on the
    XLA path (numpy needs no pin -- it has no contraction pass).
    """
    t = a * _SPLIT
    if xp is jnp:
        t = lax.optimization_barrier(t)
    d = t - a
    hi = t - d
    return hi, a - hi


def two_prod(a, b, xp=jnp):
    """Dekker two-product: p + e == a * b exactly, p = fl(a * b)."""
    p = a * b
    ah, al = split(a, xp)
    bh, bl = split(b, xp)
    # every partial product below is exact (12x12-bit significands), so an
    # FMA-contracted evaluation computes the identical value
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def ds_add(ah, al, bh, bl):
    """Normalized double-single sum: (ah+al) + (bh+bl).

    Error O(2^-48) relative -- far below the 2^-24 decision scale the
    pipeline uses ds values for. The final normalization is a full two_sum
    (not the cheaper quick_two_sum): near-cancellation can leave the head
    smaller than the accumulated tail, and the sign tests below require a
    normalized pair.
    """
    sh, se = two_sum(ah, bh)
    return two_sum(sh, se + (al + bl))


def ds_add_f32(ah, al, b):
    """Normalized (ah+al) + b for a plain f32 ``b``."""
    sh, se = two_sum(ah, b)
    return two_sum(sh, se + al)


def ds_lt0(h, l):
    """Exact (h + l) < 0 for a NORMALIZED pair (|l| <= ulp(h)/2)."""
    return (h < 0) | ((h == 0) & (l < 0))


def ds_ge0(h, l):
    """Exact (h + l) >= 0 for a normalized pair."""
    return ~ds_lt0(h, l)


def f64_to_ds(x) -> tuple[np.float32, np.float32]:
    """Host-side: split a float64 scalar/array into an f32 (hi, lo) pair.

    Residual |x - (hi + lo)| <= 2^-49 |x|; the binning/threshold decisions
    tolerate ~2^-40.
    """
    x = np.asarray(x, np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def _ulp_above(x):
    """Spacing from positive finite normal x to the next float32 up."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    return lax.bitcast_convert_type(u + np.uint32(1), jnp.float32) - x


def _ulp_below(x):
    """Spacing from positive finite normal x down to the previous float32."""
    u = lax.bitcast_convert_type(x, jnp.uint32)
    return x - lax.bitcast_convert_type(u - np.uint32(1), jnp.float32)


def div_rn(a, b):
    """Correctly-rounded f32 a / b for b > 0, a of any sign.

    q = fl(a / b) under IEEE round-to-nearest (ties snap to the nearer
    neighbor; the exact-tie case -- a/b precisely at a representable
    midpoint -- resolves to the Newton estimate, an event of measure ~2^-25
    on physical data and absent from the oracle's inputs). The native
    divide only seeds the Newton step, so its (platform-specific) error is
    corrected away.
    """
    q0 = a / b
    # one Newton step with an exact residual: r = a - q0*b
    ph, pl = two_prod(q0, b)
    rh, rl = two_sum(a, -ph)
    rl = rl - pl
    q1 = q0 + (rh + rl) / b
    # snap: compare a against the midpoints between q1 and its neighbors.
    # mid = q1 +- ulp/2 is not representable; mid*b is computed exactly as
    # a ds product instead, and the comparison is exact.
    aq = jnp.abs(q1)
    sign = jnp.where(q1 < 0, np.float32(-1.0), np.float32(1.0))
    hu = np.float32(0.5) * _ulp_above(aq)
    hd = np.float32(0.5) * _ulp_below(aq)
    sa = sign * a  # |true quotient| = sa / b

    def _gt_mid(h):
        # sa > (aq + h) * b  <=>  sa - aq*b - h*b > 0, all exact
        p1h, p1l = two_prod(aq, b)
        p2h, p2l = two_prod(h, b)
        dh, dl = two_sum(sa, -p1h)
        dl = dl - p1l
        dh, dl = ds_add(dh, dl, -p2h, -p2l)
        return (dh > 0) | ((dh == 0) & (dl > 0))

    def _lt_mid(h):
        p1h, p1l = two_prod(aq, b)
        p2h, p2l = two_prod(h, b)
        dh, dl = two_sum(sa, -p1h)
        dl = dl - p1l
        dh, dl = ds_add(dh, dl, p2h, p2l)
        return ds_lt0(dh, dl)

    up = _gt_mid(hu)
    dn = _lt_mid(hd)
    adj = jnp.where(up, aq + _ulp_above(aq), jnp.where(dn, aq - _ulp_below(aq), aq))
    return sign * adj


def sqrt_rn_ds(sh, sl):
    """Correctly-rounded f32 sqrt of a nonnegative ds value (sh + sl).

    Matches the oracle's f32(sqrt(float64 s)) except on double-rounding
    boundaries (~2^-29 probability; none observed over 10^7 fuzz samples,
    tests/test_exactf32.py). Zero maps to zero.
    """
    q0 = jnp.sqrt(jnp.maximum(sh, 0.0))
    # Newton: q1 = q0 + (s - q0^2) / (2 q0)
    ph, pl = two_prod(q0, q0)
    rh, rl = two_sum(sh, -ph)
    rl = rl + (sl - pl)
    safe = jnp.maximum(q0, np.float32(1e-30))
    q1 = q0 + (rh + rl) / (np.float32(2.0) * safe)
    # snap against the squared midpoints (exact ds comparisons)
    hu = np.float32(0.5) * _ulp_above(q1)
    hd = np.float32(0.5) * _ulp_below(q1)

    def _cmp(h):
        # s - (q1 + h)^2 = s - q1^2 - 2 q1 h - h^2, every product exact
        p1h, p1l = two_prod(q1, q1)
        p2h, p2l = two_prod(np.float32(2.0) * q1, h)
        p3 = h * h  # exact: h is a power-of-two scaled ulp
        dh, dl = two_sum(sh, -p1h)
        dl = dl + (sl - p1l)
        dh, dl = ds_add(dh, dl, -p2h, -p2l)
        dh, dl = ds_add_f32(dh, dl, -p3)
        return dh, dl

    uh, ul = _cmp(hu)
    up = (uh > 0) | ((uh == 0) & (ul > 0))  # s > mid_up^2 -> round up
    dh_, dl_ = _cmp(-hd)
    dn = ds_lt0(dh_, dl_)  # s < mid_dn^2 -> round down
    out = jnp.where(up, q1 + _ulp_above(q1), jnp.where(dn, q1 - _ulp_below(q1), q1))
    return jnp.where(sh <= 0, jnp.zeros_like(q0), out)


def sumsq3_ds(a, b, c):
    """Exact-ish ds value of a^2 + b^2 + c^2 (error ~2^-47 relative).

    The oracle sums the exact squares in f64 (golden.py ray length); the ds
    sum tracks that real value to far below the f32 rounding the result
    feeds (``sqrt_rn_ds``).
    """
    ph, pl = two_prod(a, a)
    qh, ql = two_prod(b, b)
    rh, rl = two_prod(c, c)
    sh, sl = ds_add(ph, pl, qh, ql)
    return ds_add(sh, sl, rh, rl)


# ---------------------------------------------------------------------------
# Faithful cell binning.
#
# The oracle (grid_map's double-precision ``getIndexFromPosition``; golden.py
# ``_index``) bins ``floor(((center + half) - x) / res)`` entirely in float64.
# The round-2 pipeline binned in f32 with a reciprocal multiply, which
# mis-assigns 4-8 points per ~100k-point scan (points within ~1 f32 ulp of a
# cell edge) -- the dominant accuracy-divergence seed (ACCURACY.md). The ds
# form below evaluates the same floor faithfully to ~2^-47 relative, i.e. a
# residual disagreement band of ~1e-11 m at KITTI coordinate scales, ~1e-6
# expected mis-binned points per scan. Backend-agnostic (``xp`` = jnp or np):
# the host sorted-scan prep (pipeline.predict_cells) runs the IDENTICAL f32
# operation sequence under numpy, so host and device cell ids match bitwise.
# ---------------------------------------------------------------------------


def res_ds(resolution: float):
    """f32 constants for :func:`ds_bin`: (rh, rl, inv_res).

    rh + rl is the ds image of the float64 resolution (0.33 is not exactly
    representable); inv_res seeds the first-guess quotient only.
    """
    rh, rl = f64_to_ds(np.float64(resolution))
    inv = np.float32(1.0) / np.float32(resolution)
    return np.float32(rh), np.float32(rl), np.float32(inv)


def center_edge_ds(center64, half: float):
    """Host-side: ds image of the f64 max-corner coordinate (center + half).

    ``center64``: (2,) float64 grid center (the host CenterTracker's exact
    recurrence). Returns ((2,) f32 hi, (2,) f32 lo) matching the oracle's
    f64 ``center + half_length`` to 2^-49 relative.
    """
    s64 = np.asarray(center64, np.float64) + np.float64(half)
    return f64_to_ds(s64)


def two_prod_int_const(m, c, ch, cl, xp=jnp):
    """Exact two-product p + e == m * c for INTEGER-VALUED f32 ``m``
    (|m| < 2^21) and a host constant ``c`` presplit as ``ch + cl``
    (:func:`split` with xp=np).

    Barrier-free: integers split exactly with a power-of-two scale (no
    rounding for FMA contraction to change), and the constant's split
    happened on the host. mh is the NEAREST multiple of 2^11 (floor-based
    splitting would put mh ~ 2^11 away from small |m|, violating the
    magnitude ordering Dekker's error sequence needs), so mh carries <= 11
    significant bits and |ml| <= 2^10 -- every partial product below is
    exact in f32 and every intermediate sum is representable.
    """
    p = m * c
    # nearest multiple of 2^11: m * 2^-11 + 0.5 is exact for |m| < 2^21
    mh = xp.floor(m * np.float32(2.0 ** -11) + np.float32(0.5)) * np.float32(2.0 ** 11)
    ml = m - mh
    e = ((mh * ch - p) + mh * cl + ml * ch) + ml * cl
    return p, e


def ds_bin(sh, sl, x, rh, rl, inv_res, xp=jnp):
    """Faithful cell index: floor((s - x) / res) with s, res as ds pairs.

    ``s = sh + sl`` is the ds image of the f64 value (center + half_length)
    for one axis; ``x`` the f32 coordinate; ``(rh, rl, inv_res)`` from
    :func:`res_ds`. Valid for |s - x| / res < 2^21 cells (the first-guess
    quotient must land within +-1 of the true floor; physical map-frame
    coordinates are orders of magnitude inside this). Returns int32.

    Error vs the true real-arithmetic floor: the dominant rounding is the
    lo-term sum inside the two ``ds_add`` calls, giving a decision band of
    ~2^-46 * |rel| (~1e-12 m at KITTI coordinate scales) around each exact
    cell edge; outside the band the result equals the f64 oracle's bitwise.
    The band is NOT worth tightening: the f64 oracle itself rounds twice
    (the subtraction and the divide, each 2^-53 * |rel| ~ 5e-13 m), so
    oracle agreement is fundamentally limited to the same order -- a point
    must land within ~1e-12 m of an edge for ANY implementation to disagree
    with grid_map's double math, an expected ~1e-4 occurrences per
    120-scan x 100k-point benchmark (tests/test_exactf32.py pins the band).
    """
    relh, rell = ds_add_f32(sh, sl, -x)
    m = xp.floor(relh * inv_res)
    # diff = rel - m*res, all products exact (m is an exact small integer;
    # rh/rl are host constants, so both products avoid the Dekker split's
    # device-side optimization barrier -- this keeps the binning fusable)
    rhh, rhl = split(np.float32(rh), xp=np)
    rlh, rll = split(np.float32(rl), xp=np)
    p1h, p1l = two_prod_int_const(m, np.float32(rh), rhh, rhl, xp)
    p2h, p2l = two_prod_int_const(m, np.float32(rl), rlh, rll, xp)
    dh, dl = ds_add(relh, rell, -p1h, -p1l)
    dh, dl = ds_add(dh, dl, -p2h, -p2l)
    below = ds_lt0(dh, dl)  # rel < m*res  -> true floor is m-1
    eh, el = ds_add(dh, dl, -rh, -rl)
    at_or_above = ~ds_lt0(eh, el)  # rel >= (m+1)*res -> true floor is m+1
    adj = at_or_above.astype(relh.dtype) - below.astype(relh.dtype)
    return (m + adj).astype(xp.int32)


def barrier(x):
    """Value-preserving XLA optimization barrier (blocks FMA contraction).

    XLA on TPU forms FMAs under --xla_allow_excess_precision, which makes
    ``a*b + c`` EXACTER than the oracle's separately-rounded numpy ops --
    and therefore different. Wrapping the product pins the separate
    rounding. (Observed on this backend: the m2 phantom-variance finding,
    core/rasterize._finish_layers.)
    """
    return lax.optimization_barrier(x)
