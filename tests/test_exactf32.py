"""Fuzz the error-free f32 transforms against numpy's IEEE semantics.

These utilities underwrite the pipeline's bitwise-faithful binning and
ray-march decisions (core/exactf32.py); every helper is compared against
the float64 / numpy-IEEE oracle over random AND adversarially near-boundary
inputs. Failures here would show up downstream as mis-binned points -- the
round-3 accuracy divergence mechanism (ACCURACY.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groundgrid_tpu.core import exactf32 as ef

RNG = np.random.default_rng(0xE4AC7)


def _rand_f32(n, lo=-300.0, hi=300.0):
    return RNG.uniform(lo, hi, size=n).astype(np.float32)


def test_two_sum_exact():
    a = _rand_f32(100_000)
    b = _rand_f32(100_000, -1e-3, 1e-3)  # force nonzero error terms
    s, e = jax.jit(ef.two_sum)(a, b)
    s, e = np.asarray(s), np.asarray(e)
    # a+b in f64 is exact for two f32 inputs (48-bit worst case)
    exact = a.astype(np.float64) + b.astype(np.float64)
    np.testing.assert_array_equal(s.astype(np.float64) + e.astype(np.float64), exact)
    assert (np.abs(e) > 0).any()  # the test actually exercised error terms


def test_two_prod_exact():
    a = _rand_f32(100_000)
    b = _rand_f32(100_000)
    p, e = jax.jit(ef.two_prod)(a, b)
    p, e = np.asarray(p), np.asarray(e)
    exact = a.astype(np.float64) * b.astype(np.float64)  # 48-bit: exact in f64
    np.testing.assert_array_equal(p.astype(np.float64) + e.astype(np.float64), exact)
    assert (np.abs(e) > 0).any()


def test_div_rn_matches_ieee():
    n = 200_000
    a = _rand_f32(n)
    b = np.abs(_rand_f32(n, 0.5, 200.0)) + np.float32(1e-3)
    got = np.asarray(jax.jit(ef.div_rn)(a, b))
    want = np.divide(a, b, dtype=np.float32)  # numpy f32 divide is IEEE RN
    np.testing.assert_array_equal(got, want)


def test_div_rn_near_midpoints():
    # adversarial: quotients a hair around representable midpoints
    q = np.float32(1.5) + np.arange(4096, dtype=np.float32) * np.float32(1e-4)
    b = np.abs(_rand_f32(4096, 1.0, 100.0))
    for bump in (-2, -1, 0, 1, 2):
        # a such that a/b lands within a couple ulps of q + half-ulp
        mid = q.astype(np.float64) + 2.0 ** -25 * bump
        a = (mid * b.astype(np.float64)).astype(np.float32)
        got = np.asarray(ef.div_rn(a, b))
        want = np.divide(a, b, dtype=np.float32)
        np.testing.assert_array_equal(got, want)


def test_sqrt_rn_ds_matches_oracle():
    n = 200_000
    x = _rand_f32(n, 0.1, 170.0)
    y = _rand_f32(n, 0.1, 170.0)
    z = _rand_f32(n, 0.1, 80.0)
    sh, sl = jax.jit(ef.sumsq3_ds)(x, y, z)
    got = np.asarray(jax.jit(ef.sqrt_rn_ds)(sh, sl))
    # oracle: golden.py ray length = f32(sqrt(f64 sum of exact squares))
    s64 = (
        x.astype(np.float64) ** 2
        + y.astype(np.float64) ** 2
        + z.astype(np.float64) ** 2
    )
    want = np.sqrt(s64).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_sqrt_rn_ds_zero_and_exact_squares():
    x = np.arange(64, dtype=np.float32)
    sh, sl = x * x, np.zeros_like(x)
    got = np.asarray(ef.sqrt_rn_ds(sh, sl))
    np.testing.assert_array_equal(got, x)


def test_ds_sign_tests():
    h = np.array([1.0, -1.0, 0.0, 0.0, 0.0], np.float32)
    l = np.array([0.0, 0.0, -1e-20, 1e-20, 0.0], np.float32)
    lt = np.asarray(ef.ds_lt0(h, l))
    np.testing.assert_array_equal(lt, [False, True, True, False, False])


def test_f64_to_ds_roundtrip():
    x = RNG.uniform(-5e4, 5e4, size=10_000)
    hi, lo = ef.f64_to_ds(x)
    err = np.abs(hi.astype(np.float64) + lo.astype(np.float64) - x)
    assert err.max() <= np.abs(x).max() * 2.0 ** -48


def test_two_prod_int_const_exact():
    """Integer x host-constant product: exact over the full signed domain
    (a floor-based split regressed negative m once -- keep this pinned)."""
    m = RNG.integers(-(1 << 21) + 1, 1 << 21, size=200_000).astype(np.float32)
    for c in (np.float32(0.33), np.float32(-1.3113022e-08), np.float32(0.1)):
        ch, cl = ef.split(c, xp=np)
        p, e = ef.two_prod_int_const(m, c, ch, cl, xp=np)
        exact = m.astype(np.float64) * np.float64(c)
        np.testing.assert_array_equal(
            p.astype(np.float64) + e.astype(np.float64), exact
        )
        pj, ej = jax.jit(lambda mm: ef.two_prod_int_const(mm, c, ch, cl))(m)
        np.testing.assert_array_equal(np.asarray(pj), p)
        np.testing.assert_array_equal(np.asarray(ej), e)


def _bin_oracle(c64, half, res, x32):
    """The golden oracle's f64 binning (golden.py _index)."""
    rel = (np.float64(c64) + np.float64(half)) - x32.astype(np.float64)
    return np.floor(rel / np.float64(res)).astype(np.int64)


def _edge_distance(c64, half, res, x32):
    """Distance (in m, f64) from each point's rel to the nearest cell edge."""
    rel = (np.float64(c64) + np.float64(half)) - x32.astype(np.float64)
    frac = rel - np.floor(rel / np.float64(res)) * np.float64(res)
    return np.minimum(np.abs(frac), np.abs(frac - np.float64(res)))


def _assert_bin_faithful(c64, half, res, x32, got):
    """got == f64 oracle everywhere outside the documented ~2^-46|rel| band;
    inside the band the oracle's own double rounding is the same order, so
    disagreement there is unavoidable for ANY f32-input implementation."""
    want = _bin_oracle(c64, half, res, x32)
    bad = got.astype(np.int64) != want
    if bad.any():
        # the ds lo-term roundings scale with the largest intermediate --
        # |s| itself (sh and x cancel, but their lo terms don't) -- so the
        # band is 2^-46 * max(|rel|, |s|), with a 4x safety factor
        rel = np.abs((np.float64(c64) + half) - x32.astype(np.float64))
        scale = np.maximum(rel, abs(np.float64(c64) + half))
        band = np.maximum(scale, 1.0) * 2.0 ** -44
        dist = _edge_distance(c64, half, res, x32)
        assert (dist[bad] <= band[bad]).all(), (
            f"mis-binned outside the edge band: dist={dist[bad].max()}"
        )


@pytest.mark.parametrize(
    "center", [0.0, 17.234567891, -1234.56789012, 4096.33]
)
def test_ds_bin_random_matches_f64(center):
    half, res = 60.0, 0.33
    x = RNG.uniform(center - 70, center + 70, size=200_000).astype(np.float32)
    sh, sl = ef.center_edge_ds(np.float64(center), half)
    rh, rl, inv = ef.res_ds(res)
    got_np = ef.ds_bin(np.float32(sh), np.float32(sl), x, rh, rl, inv, xp=np)
    _assert_bin_faithful(center, half, res, x, got_np)
    got_jx = np.asarray(
        jax.jit(lambda xx: ef.ds_bin(sh, sl, xx, rh, rl, inv))(x)
    )
    np.testing.assert_array_equal(got_jx, got_np)  # host == device, bitwise


def test_ds_bin_near_cell_edges():
    """Points engineered within a few f32 ulps of f64 cell edges -- the class
    the old reciprocal-multiply binning mis-assigned 4-8x per 100k-pt scan.
    A +-1 f32 ulp of the coordinate (~1e-4 m at these scales) is ~1e8 times
    the residual ds band, so every bumped point must bin exactly; bump 0
    (the coordinate IS the rounded edge) may fall inside the band."""
    half, res = 60.0, 0.33
    for center in (3.1415926535, -987.6543210987, 2048.125):
        s64 = np.float64(center) + half
        m = RNG.integers(1, 363, size=4096)
        edge = s64 - m.astype(np.float64) * np.float64(res)  # exact f64 edges
        x = edge.astype(np.float32)
        for bump in (-3, -2, -1, 0, 1, 2, 3):
            xb = x.view(np.int32) + np.int32(bump)
            xb = xb.view(np.float32)
            sh, sl = ef.center_edge_ds(np.float64(center), half)
            rh, rl, inv = ef.res_ds(res)
            got = ef.ds_bin(np.float32(sh), np.float32(sl), xb, rh, rl, inv, xp=np)
            if bump == 0:
                _assert_bin_faithful(center, half, res, xb, got)
            else:
                want = _bin_oracle(center, half, res, xb)
                np.testing.assert_array_equal(got.astype(np.int64), want)
            got_jx = np.asarray(ef.ds_bin(sh, sl, jnp.asarray(xb), rh, rl, inv))
            np.testing.assert_array_equal(got_jx, np.asarray(got))


def test_ds_bin_accumulated_center_recurrence():
    """Center values from the real recurrence (center0 + k*res in f64) --
    exercises nontrivial lo components of the shipped ds center."""
    res, half = 0.33, 60.0
    rng = np.random.default_rng(7)
    c64 = np.float64(1837.5537109375)  # an f32-exact start, like init
    for _ in range(50):
        k = rng.integers(-40, 40)
        c64 = c64 + np.float64(k) * np.float64(res)
    x = rng.uniform(c64 - 65, c64 + 65, size=50_000).astype(np.float32)
    sh, sl = ef.center_edge_ds(c64, half)
    assert sl != 0.0  # the recurrence produced a genuine f64 (lo matters)
    rh, rl, inv = ef.res_ds(res)
    want = _bin_oracle(c64, half, res, x)
    got = ef.ds_bin(np.float32(sh), np.float32(sl), x, rh, rl, inv, xp=np)
    np.testing.assert_array_equal(got.astype(np.int64), want)


@pytest.mark.parametrize("jit", [False, True])
def test_two_sum_survives_xla_simplification(jit):
    """Guard against XLA rewriting (a - (s - bb)) style cancellation chains."""
    a = np.float32(1.0)
    b = np.float32(2.0 ** -30)  # a + b rounds to a; error must be recovered
    fn = jax.jit(ef.two_sum) if jit else ef.two_sum
    s, e = fn(a, b)
    assert float(s) == 1.0 and float(e) == float(b)
