"""Pallas TPU kernel for the spiral terrain interpolation.

Same math as :mod:`groundgrid_tpu.core.interpolate` (the exact affine-
recurrence formulation of ``GroundSegmentation.cpp:398-465``), but the entire
center-outward sweep runs inside ONE kernel with both grid layers resident in
VMEM, eliminating the per-ring XLA op dispatch that dominates the lax.scan
version (~24 ms on a v5e).

Quad-sweep layout (v2). The ring walk's column segments are the expensive
half of the naive kernel (wide lane-blocked loads + lane rolls + band
transposes: 0.73 of 1.26 ms/scan measured), so the kernel keeps a SECOND,
transposed copy of both layers and processes every segment as a cheap
row-oriented band update:

    top row     -> row ``i``     of (H, C)
    left column -> row ``i``     of (HT, CT)   (HT[a, b] == H[b, a])
    bottom row  -> row ``outer`` of (H, C)
    right column-> row ``outer`` of (HT, CT)

The two copies only interact at the ring corners: each segment reads at most
three cells most recently written by another segment of the same or previous
ring *in the other orientation*. Those values are injected into the loaded
3-row stencil band as masked lane selects from the producing segment's
updated row (carried as (1, PAD) registers across the fori_loop), and stale
copies are provably never read un-injected -- the full cell-by-cell foreign-
read enumeration is in the test suite's exactness check against the
sequential oracle. The final grids merge by last-writer masks: strict W/E
triangles + both main-diagonal halves + the upper anti-diagonal come from the
transposed copy (left/right segments write those last, including the
twice-visited corners), everything else from the row copy.

Walk order, twice-visited corners and the affine recurrence all match the
sequential reference exactly (see tests/test_pallas_spiral.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groundgrid_tpu.config import GroundGridConfig

FLT_TINY = float(jnp.finfo(jnp.float32).tiny)  # C++ FLT_MIN
ROW_BLK = 16  # sublane block height for band loads (8-aligned)


def pad_size(n: int) -> int:
    """Smallest multiple of 128 that fits every block access (>= n + 3)."""
    return ((n + 3 + 127) // 128) * 128


def _roll(x, shift, axis):
    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis=axis)


def _affine_hillis_steele(a, b, descending):
    """Prefix-compose affine maps h[y] = a[y] + b[y]*h[y-+1] along lanes.

    Radix-4: each level composes the three stride-d/2d/3d predecessors
    (independent rolls of the same input -> their latencies overlap), so the
    *sequential* level count drops from log2(PAD)=9 to ceil(log4(PAD))=5.
    The per-segment scan chain dominates the spiral's critical path (720
    corner-coupled segments run back to back), so scan latency is what the
    whole kernel's time scales with. Exact to f32 rounding vs radix-2.
    """
    n = a.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, a.shape, 1)
    d = 1
    while d < n:
        na, nb = a, b
        for s in (d, 2 * d, 3 * d):
            if s >= n:
                continue
            if descending:
                valid = idx < n - s
                shift = -s
            else:
                valid = idx >= s
                shift = s
            a_s = jnp.where(valid, _roll(a, shift, 1), 0.0)
            b_s = jnp.where(valid, _roll(b, shift, 1), 1.0)
            na = na + nb * a_s
            nb = nb * b_s
        a, b = na, nb
        d *= 4
    return a


def _band_update(config: GroundGridConfig, bh, bc, fixed, lo, hi, descending, woff=0):
    """Exact segment update on a lane-major (3, WLEN) stencil band.

    ``bh``/``bc`` rows are [fixed-1, fixed, fixed+1]; lane position ``j``
    holds global cell coordinate ``woff + j`` along the walk (``woff`` is the
    tier's 128-aligned lane-window offset -- see ``_tiers``). Returns the
    updated (1, WLEN) height and confidence rows. See core/interpolate.py
    for the derivation.
    """
    c_idx = config.center_cell
    res2 = float(config.resolution**2)
    dec = float(config.occupied_cells_decrease_factor)
    min_d2 = float(config.min_dist_squared)

    shape = (1, bh.shape[1])
    ys = lax.broadcasted_iota(jnp.int32, shape, 1) + woff
    in_seg = (ys >= lo) & (ys < hi)

    # confidence decay (cpp:462-464): height-independent, precomputable
    fy = ys.astype(jnp.float32)
    fx = (fixed - c_idx).astype(jnp.float32)
    d2 = (fx * fx + (fy - c_idx) * (fy - c_idx)) * res2
    occ = bc[1:2]
    c_dec = jnp.where(d2 > min_d2, jnp.maximum(occ - occ / dec, 0.001), occ)
    c_new = jnp.where(in_seg, c_dec, occ)

    sgn = -1 if descending else 1
    pred = lambda x: _roll(x, sgn, 1)  # walk-predecessor position
    succ = lambda x: _roll(x, -sgn, 1)  # walk-successor position

    hh = bh[1:2]
    w = bc * bh
    lo_w, mid_w, hi_w = w[0:1], w[1:2], w[2:3]
    lo_c, mid_c, hi_c = bc[0:1], bc[1:2], bc[2:3]
    num_known = (
        pred(lo_w) + lo_w + succ(lo_w)
        + pred(hi_w) + hi_w + succ(hi_w)
        + mid_w + succ(mid_w)
    )
    den_known = (
        pred(lo_c) + lo_c + succ(lo_c)
        + pred(hi_c) + hi_c + succ(hi_c)
        + mid_c + succ(mid_c)
    )

    pred_in_seg = pred(in_seg.astype(jnp.float32)) > 0.5
    c_pred = jnp.where(pred_in_seg, pred(c_new), pred(mid_c))
    den = den_known + c_pred + FLT_TINY

    blend = jnp.where(in_seg, 1.0 - occ, 0.0)
    b_coef = jnp.where(pred_in_seg, blend * c_pred / den, 0.0)
    num_static = num_known + jnp.where(pred_in_seg, 0.0, c_pred * pred(hh))
    a_coef = jnp.where(in_seg, blend * num_static / den + occ * hh, hh)

    h_new = _affine_hillis_steele(a_coef, b_coef, descending)
    return h_new, c_new


def _segment(config, h_ref, c_ref, sc_h, sc_c, out_slot, fixed, lo, hi,
             descending, injections, woff, wlen):
    """Row-band segment update with corner injections.

    ``injections``: list of ``(band_row, dest_lane, src_slot, shift)`` --
    patch band row ``band_row`` (0/1/2 == fixed-1/fixed/fixed+1) at global
    lane ``dest_lane`` with the other-orientation value
    ``scratch[src_slot, dest_lane - shift]``. Sources live in a small VMEM
    scratch (``sc_h``/``sc_c``, one row per segment kind N/W/S/E) that each
    segment also writes its updated row into: static sublane indices, so
    tier transitions need no carry re-embedding (Mosaic supports neither
    lane-concatenate of offset-mismatched rows nor dynamic_update_slice).
    Lanes of a scratch row outside its writer's window are stale, but the
    single-lane ``sel`` always reads inside it (windows nest).

    ``woff``/``wlen``: the tier's 128-aligned lane window (see ``_tiers``);
    all loads, stores and rows live on lanes [woff, woff+wlen), which must
    cover [lo-1, hi].
    """
    base = pl.multiple_of((fixed - 1) // 8 * 8, 8)
    off = fixed - 1 - base
    blk_h = h_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)]
    blk_c = c_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)]
    # rotate the stencil band to static rows [0, 3)
    sh = pltpu.roll(blk_h, (ROW_BLK - off) % ROW_BLK, axis=0)
    sc = pltpu.roll(blk_c, (ROW_BLK - off) % ROW_BLK, axis=0)

    rows_h = [sh[0:1], sh[1:2], sh[2:3]]
    rows_c = [sc[0:1], sc[1:2], sc[2:3]]
    lane = lax.broadcasted_iota(jnp.int32, (1, wlen), 1) + woff
    for band_row, dest, slot, shift in injections:
        sel = lane == dest
        src_h = sc_h[slot : slot + 1, pl.ds(woff, wlen)]
        src_c = sc_c[slot : slot + 1, pl.ds(woff, wlen)]
        rows_h[band_row] = jnp.where(sel, _roll(src_h, shift, 1), rows_h[band_row])
        rows_c[band_row] = jnp.where(sel, _roll(src_c, shift, 1), rows_c[band_row])
    bh = jnp.concatenate(rows_h, axis=0)
    bc = jnp.concatenate(rows_c, axis=0)

    h_new, c_new = _band_update(config, bh, bc, fixed, lo, hi, descending, woff)

    rows = lax.broadcasted_iota(jnp.int32, (ROW_BLK, wlen), 0)
    sel = rows == (off + 1)
    h_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, h_new, blk_h)
    c_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, c_new, blk_c)
    sc_h[out_slot : out_slot + 1, pl.ds(woff, wlen)] = h_new
    sc_c[out_slot : out_slot + 1, pl.ds(woff, wlen)] = c_new


@functools.lru_cache(maxsize=16)
def _tiers(pad: int, c_idx: int):
    """Lane-window tiers: [(woff, wlen, ring_start, ring_stop), ...].

    Ring ``k`` touches global lanes [c_idx-1-k, c_idx+1+k] and its stencil
    reads one lane beyond on each side; inner rings fit in a narrow
    128-aligned lane window, making every vector op in the segment update
    proportionally cheaper (1 vreg instead of pad/128). The tier list covers
    rings [0, c_idx-1) with nondecreasing window sizes.
    """
    total = c_idx - 1
    tiers = []
    prev = -1
    w = 128
    while w <= pad and prev < total - 1:
        best = None
        for woff in range(0, pad - w + 1, 128):
            # window must cover [c_idx-2-k, c_idx+2+k] (ring + 1-lane stencil)
            kmax = min(c_idx - 2 - woff, woff + w - 3 - c_idx)
            if best is None or kmax > best[0]:
                best = (kmax, woff)
        kmax, woff = best
        kmax = min(kmax, total - 1)
        if kmax > prev:
            tiers.append((woff, w, prev + 1, kmax + 1))
            prev = kmax
        w += 128
    assert tiers and tiers[-1][3] == total, (tiers, pad, c_idx)
    # windows must nest (carries re-embed; injection rolls must never wrap)
    for (o1, w1, _, _), (o2, w2, _, _) in zip(tiers, tiers[1:]):
        assert o2 <= o1 and o2 + w2 >= o1 + w1, tiers
    return tuple(tiers)


_N, _W, _S, _E = 0, 1, 2, 3  # scratch row slots, one per segment kind


def _spiral_kernel(config: GroundGridConfig, pad,
                   z_ref, h_in, c_in, ht_in, ct_in, h_ref, c_ref, ht_ref, ct_ref,
                   sc_h, sc_c):
    # inputs alias outputs (input_output_aliases): in-place updates.
    del h_in, c_in, ht_in, ct_in
    c_idx = config.center_cell
    z = z_ref[0, 0]

    # seed center cell in both orientations (GroundSegmentation.cpp:405-411)
    for ref, val in ((h_ref, z), (ht_ref, z)):
        ref[pl.ds(c_idx, 1), pl.ds(c_idx, 1)] = jnp.full((1, 1), val)
    for ref in (c_ref, ct_ref):
        ref[pl.ds(c_idx, 1), pl.ds(c_idx, 1)] = jnp.ones((1, 1), jnp.float32)

    # ring-0 foreign reads all resolve to the seed cell (z, conf 1)
    sc_h[:] = jnp.full(sc_h.shape, z, jnp.float32)
    sc_c[:] = jnp.ones(sc_c.shape, jnp.float32)

    def make_ring(woff, wlen):
        def ring(k, _):
            i = c_idx - 1 - k
            outer = 2 * c_idx - i

            # N: top row i, ascending (reference walk order, cpp:421-439).
            # foreign reads: (i+1, i+1) <- W(k-1) double-visit [same lane],
            # (i+1, outer-1) <- E(k-1) [its lane i+1]
            _segment(config, h_ref, c_ref, sc_h, sc_c, _N, i, i, outer, False, [
                (2, i + 1, _W, 0),
                (2, outer - 1, _E, outer - i - 2),
            ], woff, wlen)
            # W: left column == HT row i, ascending.
            # foreign: (i, i) <- N(k) [lane i], (i, i+1) <- N(k) [lane i+1 -> i],
            # (outer-1, i+1) <- S(k-1) [lane i+1 -> outer-1]
            _segment(config, ht_ref, ct_ref, sc_h, sc_c, _W, i, i, outer, False, [
                (1, i, _N, 0),
                (2, i, _N, -1),
                (2, outer - 1, _S, outer - i - 2),
            ], woff, wlen)
            # S: bottom row outer, descending.
            # foreign: (outer-1, i) <- W(k) [lane outer-1 -> i],
            # (outer-1, outer-1) <- E(k-1) double-visit [same lane]
            _segment(config, h_ref, c_ref, sc_h, sc_c, _S, outer, i, outer + 1, True, [
                (0, i, _W, i - outer + 1),
                (0, outer - 1, _E, 0),
            ], woff, wlen)
            # E: right column == HT row outer, descending.
            # foreign: (i, outer-1) <- N(k) [lane outer-1 -> i],
            # (outer, outer-1) <- S(k) [lane outer-1 -> outer],
            # (outer, outer) <- S(k) double-visit [same lane]
            _segment(config, ht_ref, ct_ref, sc_h, sc_c, _E, outer, i, outer + 1, True, [
                (0, i, _N, i - outer + 1),
                (0, outer, _S, 1),
                (1, outer, _S, 0),
            ], woff, wlen)
            return 0

        return ring

    for woff, wlen, k_start, k_stop in _tiers(pad, c_idx):
        lax.fori_loop(k_start, k_stop, make_ring(woff, wlen), 0)


@functools.lru_cache(maxsize=8)
def _owner_masks(n: int, c_idx: int):
    """(N, N) bool: True where the transposed copy holds the final value.

    Last-writer rule per ring (walk order top, left, bottom, right): the
    left/right segments own the strict W/E triangles, the main diagonal
    (both (i, i) and (outer, outer) are column-segment double-visits) and the
    upper anti-diagonal corner (i, outer); the bottom segment (row copy) owns
    the lower anti-diagonal corner (outer, i).
    """
    m = 2 * c_idx
    r = np.arange(n)[:, None]
    c = np.arange(n)[None, :]
    d_r = np.minimum(r, m - r)
    d_c = np.minimum(c, m - c)
    return (d_c < d_r) | (r == c) | ((r + c == m) & (r < c_idx))


def spiral_interpolation_pallas(
    config: GroundGridConfig, ground, groundpatch, base_z, interpret: bool = False
):
    """Drop-in replacement for core.interpolate.spiral_interpolation."""
    n = config.cell_count
    pad = pad_size(n)
    z = jnp.asarray(base_z, jnp.float32).reshape(1, 1)
    pad_spec = ((0, pad - n), (0, pad - n))
    gp = jnp.pad(ground, pad_spec)
    cp = jnp.pad(groundpatch, pad_spec)
    gpt = jnp.pad(ground.T, pad_spec)
    cpt = jnp.pad(groundpatch.T, pad_spec)
    kernel = functools.partial(_spiral_kernel, config, pad)
    out = jax.ShapeDtypeStruct((pad, pad), jnp.float32)
    h, c, ht, ct = pl.pallas_call(
        kernel,
        out_shape=(out, out, out, out),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        scratch_shapes=[
            pltpu.VMEM((8, pad), jnp.float32),  # segment-output rows (N/W/S/E)
            pltpu.VMEM((8, pad), jnp.float32),
        ],
        interpret=interpret,
    )(z, gp, cp, gpt, cpt)
    mask = jnp.asarray(_owner_masks(n, config.center_cell))
    h_out = jnp.where(mask, ht[:n, :n].T, h[:n, :n])
    c_out = jnp.where(mask, ct[:n, :n].T, c[:n, :n])
    return h_out, c_out
