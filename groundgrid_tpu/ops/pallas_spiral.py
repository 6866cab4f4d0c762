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

Paired sweep (v3). The kernel is instruction-issue-bound (per-ring time ==
the segment updates' vector-op count; its (1, W)/(3, W) operands fill 1-3 of
each vreg's 8 sublanes), and the four segments form two perfectly
homogeneous pairs -- N+W both walk ascending over lanes [i, outer) with
``fixed = i``, S+E both descending over [i, outer+1) with ``fixed = outer``,
differing only in which layer copy they touch. Hoisted rings
(k >= HOIST_MIN) therefore run each pair as ONE stacked update: bands
interleave into (6, W) grouped-by-band-row blocks and every elementwise op,
roll and scan level does both segments' work in the same issue slots
(an (r, W) group occupies the same vregs as (1, W) for r <= 8). The corner
couplings keep their exact dataflow:

  * carry-sourced couplings (previous ring's rows, including the
    "late" reads of E(k-1)/S(k-1)'s last walk cells) inject upfront -- they
    sit in fori-carry registers at band time, so deferring them (as v2 did)
    wasted a _band_delta + two repair steps per ring;
  * the intra-pair walk-start couplings (W's two cells from N, E's from S --
    the twice-visited corners) apply as an exact post-hoc 3-lane refix: the
    consumer's band update re-runs at r=1 WITH the injections (same formula,
    same op order as the sequential path -> bitwise) and only lanes
    [d-1, d+1] merge back, the enumerated support of the perturbation;
  * the two TRUE late couplings (S <- W(k), E <- N(k)) stay deferred as the
    stacked post-scan two-lane repair.

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


def _affine_hillis_steele(a, b, descending, span=None):
    """Prefix-compose affine maps h[y] = a[y] + b[y]*h[y-+1] along lanes.

    Radix-4: each level composes the three stride-d/2d/3d predecessors
    (independent rolls of the same input -> their latencies overlap), so the
    *sequential* level count drops from log2(PAD)=9 to ceil(log4(PAD))=5.
    The per-segment scan chain dominates the spiral's critical path (720
    corner-coupled segments run back to back), so scan latency is what the
    whole kernel's time scales with. Exact to f32 rounding vs radix-2.

    The rolls are deliberately UNMASKED (circular): every lane outside the
    caller's segment has b == 0 -- including both window-boundary lanes,
    since the tier windows cover [lo-1, hi] (see ``_tiers``) -- so any
    wrapped-around range's composed b-product crosses a zero and the bogus
    contribution vanishes exactly. Dropping the per-(level, stride) iota
    compare + two selects cut the kernel's critical path ~20%.

    ``span``: the longest walk length the scan must cover (defaults to the
    full lane width). The scan stops once the composed range reaches it --
    contributions beyond the segment start are killed by b == 0 anyway --
    so ring ranges short relative to their tier window save whole levels.
    """
    n = a.shape[1]
    if span is None:
        span = n
    sgn = -1 if descending else 1
    d = 1
    while d < min(span, n):
        na, nb = a, b
        for s in (d, 2 * d, 3 * d):
            if s >= n:
                continue
            a_s = _roll(a, sgn * s, 1)
            b_s = _roll(b, sgn * s, 1)
            na = na + nb * a_s
            nb = nb * b_s
        a, b = na, nb
        d *= 4
    return a


def _band_update(config: GroundGridConfig, bh, bc, fixed, lo, hi, descending,
                 woff=0, export=False, r=1):
    """Exact segment update on a lane-major (3r, WLEN) stencil band.

    ``bh``/``bc`` rows are [fixed-1, fixed, fixed+1] groups of ``r`` stacked
    same-direction segments (grouped by band row: rows [B*r, B*r+r) hold
    band row ``B`` of all ``r`` segments); lane position ``j`` holds global
    cell coordinate ``woff + j`` along the walk (``woff`` is the tier's
    128-aligned lane-window offset -- see ``_tiers``; it may be a traced
    scalar for the narrow-refix window). Returns the updated (r, WLEN)
    height and confidence rows. See core/interpolate.py for the derivation.
    ``export=True`` additionally returns the intermediates
    :func:`_band_delta` needs to cheaply re-derive (a, b) after a deferred
    corner injection.

    Stacking is free on TPU: an (r, W) row group occupies the same vregs as
    a (1, W) row for r <= 8, so every elementwise op here does r segments'
    work for one segment's issue slots -- the lever that halved the kernel
    (see ``make_ring``'s pairing). All formulas are elementwise across the
    stacked rows, so r=2 results are bitwise the two r=1 results.
    """
    c_idx = config.center_cell
    res2 = float(config.resolution**2)
    dec = float(config.occupied_cells_decrease_factor)
    min_d2 = float(config.min_dist_squared)

    shape = (r, bh.shape[1])
    ys = lax.broadcasted_iota(jnp.int32, shape, 1) + woff
    in_seg = (ys >= lo) & (ys < hi)

    # confidence decay (cpp:462-464): height-independent, precomputable
    fy = ys.astype(jnp.float32)
    fx = (fixed - c_idx).astype(jnp.float32)
    d2 = (fx * fx + (fy - c_idx) * (fy - c_idx)) * res2
    occ = bc[r : 2 * r]
    c_dec = jnp.where(d2 > min_d2, jnp.maximum(occ - occ / dec, 0.001), occ)
    c_new = jnp.where(in_seg, c_dec, occ)

    sgn = -1 if descending else 1
    pred = lambda x: _roll(x, sgn, 1)  # walk-predecessor position
    succ = lambda x: _roll(x, -sgn, 1)  # walk-successor position

    # Roll the (3r, W) h/c/w BLOCKS, not rows: a (3r, W) array occupies the
    # same vregs as a (1, W) row for 3r <= 8 (both pad to 8 sublanes), so one
    # block roll replaces three row rolls at identical cost -- 4 rolls
    # instead of 10 on the 3x3-stencil sums below.
    hh = bh[r : 2 * r]
    w = bc * bh
    wp, ws = pred(w), succ(w)  # (3r, W) each
    cp, cs = pred(bc), succ(bc)
    tw = wp + w + ws  # row groups: pred+self+succ of [lo_w, mid_w, hi_w]
    tc = cp + bc + cs
    mid_c = bc[r : 2 * r]
    # stencil sums (cpp:453-460): all eight 3x3 neighbors in walk order =
    # full row-sums of the lo/hi rows + self+succ of the mid row
    num_known = tw[0:r] + tw[2 * r : 3 * r] + (w[r : 2 * r] + ws[r : 2 * r])
    den_known = tc[0:r] + tc[2 * r : 3 * r] + (mid_c + cs[r : 2 * r])

    pred_in_seg = pred(in_seg.astype(jnp.float32)) > 0.5
    c_pred = jnp.where(pred_in_seg, pred(c_new), cp[r : 2 * r])
    den = den_known + c_pred + FLT_TINY

    blend = jnp.where(in_seg, 1.0 - occ, 0.0)
    b_coef = jnp.where(pred_in_seg, blend * c_pred / den, 0.0)
    num_static = num_known + jnp.where(pred_in_seg, 0.0, c_pred * pred(hh))
    a_coef = jnp.where(in_seg, blend * num_static / den + occ * hh, hh)
    if not export:
        return a_coef, b_coef, c_new
    internals = dict(
        in_seg=in_seg, pred_in_seg=pred_in_seg, blend=blend,
        blend_cpred=blend * c_pred, occ_hh=occ * hh, hh=hh,
        num_static=num_static, den=den, sgn=sgn,
    )
    return a_coef, b_coef, c_new, internals


def _band_delta(it, bh, bc, band_row, sel, src_h, src_c, shift, r=1):
    """(a, b) of the band WITH one extra injection, from exported internals.

    The injection replaces the band value at one (row, lane) position, which
    perturbs the 3x3 stencil sums at three lanes only; rebuilding (a, b)
    from the deltas costs ~14 row ops instead of a second full band update.
    Matches the full recompute to ~1 ulp (the delta addition reassociates
    the num/den sums). Stacked (``r > 1``): each of the r rows applies its
    own injection (same band_row/sel/shift, per-row ``src`` rows).
    """
    sgn = it["sgn"]
    pred = lambda x: _roll(x, sgn, 1)
    succ = lambda x: _roll(x, -sgn, 1)
    vh = _roll(src_h, shift, 1)
    vc = _roll(src_c, shift, 1)
    row = slice(band_row * r, band_row * r + r)
    w_row = bc[row] * bh[row]
    dw = jnp.where(sel, vh * vc - w_row, 0.0)
    dc = jnp.where(sel, vc - bc[row], 0.0)
    dnum = dw + pred(dw) + succ(dw)
    dden = dc + pred(dc) + succ(dc)
    inv = 1.0 / (it["den"] + dden)
    b1 = jnp.where(it["pred_in_seg"], it["blend_cpred"] * inv, 0.0)
    a1 = jnp.where(
        it["in_seg"],
        it["blend"] * (it["num_static"] + dnum) * inv + it["occ_hh"],
        it["hh"],
    )
    return a1, b1


def _load_band(h_ref, c_ref, fixed, woff, wlen):
    """Load the (ROW_BLK, wlen) block whose rows cover [fixed-1, fixed+1]."""
    base = pl.multiple_of((fixed - 1) // 8 * 8, 8)
    blk_h = h_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)]
    blk_c = c_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)]
    return blk_h, blk_c


def _stack_pair_rows(blkA, blkB, fixed):
    """Rotate two loaded band blocks and interleave their stencil rows.

    Returns 6-row lists (h, c) in grouped-by-band-row order
    [A_lo, B_lo, A_mid, B_mid, A_hi, B_hi] -- the layout
    :func:`_band_update` expects at r=2 (band row B of segment s sits at
    stacked row 2B+s). Both segments of a pair share ``fixed``, so one
    rotation amount serves all four blocks.
    """
    base = pl.multiple_of((fixed - 1) // 8 * 8, 8)
    off = fixed - 1 - base
    rot = lambda x: pltpu.roll(x, (ROW_BLK - off) % ROW_BLK, axis=0)
    ah, ac = rot(blkA[0]), rot(blkA[1])
    bh_, bc_ = rot(blkB[0]), rot(blkB[1])
    rows_h = [ah[0:1], bh_[0:1], ah[1:2], bh_[1:2], ah[2:3], bh_[2:3]]
    rows_c = [ac[0:1], bc_[0:1], ac[1:2], bc_[1:2], ac[2:3], bc_[2:3]]
    return rows_h, rows_c


def _narrow_refix(config, bh, bc, consumer, injections, fixed, lo, hi,
                  descending, woff, wlen, a, b, c_new):
    """Exact post-hoc application of intra-pair early injections.

    The stacked pair update computes the consumer segment WITHOUT the
    values its band owes to the producer segment of the same pair (W's two
    walk-start cells from N; E's from S). Those injections share one dest
    lane ``d`` and only perturb the consumer's (a, b, c) at lanes
    [d-1, d+1] (stencil sums at +-1 lane; the mid-row injection's occ /
    c_new / c_pred effects land in the same window -- enumerated lane by
    lane in the kernel docstring). So: rebuild the consumer's 3-row band
    with the injections, re-run the r=1 band update (SAME formula and op
    order as the sequential path -> bitwise), and merge lanes [d-1, d+1]
    back into the stacked (a, b, c). Out-of-segment merged lanes are
    bitwise no-ops (a=hh, b=0, c=occ, none injected). A 128-lane windowed
    recompute was tried and hits a Mosaic lane-concat layout bug on the
    pad-back; the full-width r=1 recompute costs one extra band update per
    pair, which the pairing's 2x still dominates.
    """
    r = a.shape[0]
    lane1 = lax.broadcasted_iota(jnp.int32, (1, wlen), 1) + woff
    rows_h = [bh[br * r + consumer : br * r + consumer + 1] for br in range(3)]
    rows_c = [bc[br * r + consumer : br * r + consumer + 1] for br in range(3)]
    d = injections[0][1]
    for band_row, dest, (src_h, src_c), shift in injections:
        sel = lane1 == dest
        rows_h[band_row] = jnp.where(sel, _roll(src_h, shift, 1), rows_h[band_row])
        rows_c[band_row] = jnp.where(sel, _roll(src_c, shift, 1), rows_c[band_row])
    cbh = jnp.concatenate(rows_h, axis=0)
    cbc = jnp.concatenate(rows_c, axis=0)
    af, bf, cf = _band_update(config, cbh, cbc, fixed, lo, hi, descending,
                              woff)
    rowsel = lax.broadcasted_iota(jnp.int32, (r, wlen), 0) == consumer
    sel3 = rowsel & (jnp.abs(lane1 - d) <= 1)
    return (jnp.where(sel3, af, a), jnp.where(sel3, bf, b),
            jnp.where(sel3, cf, c_new))


def _writeback(ref_h, ref_c, blk, fixed, woff, wlen, h_new, c_new):
    """Write one segment's updated row back through its 16-row block."""
    base = pl.multiple_of((fixed - 1) // 8 * 8, 8)
    off = fixed - 1 - base
    rows = lax.broadcasted_iota(jnp.int32, (ROW_BLK, wlen), 0)
    sel = rows == (off + 1)
    ref_h[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, h_new, blk[0])
    ref_c[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, c_new, blk[1])


def _segment(config, h_ref, c_ref, fixed, lo, hi,
             descending, injections, woff, wlen, blk=None, deferred=None,
             span=None):
    """Row-band segment update with corner injections.

    ``injections``: list of ``(band_row, dest_lane, (src_h, src_c), shift)``
    -- patch band row ``band_row`` (0/1/2 == fixed-1/fixed/fixed+1) at global
    lane ``dest_lane`` with the other-orientation value
    ``src[dest_lane - shift]``. Sources are the producing segments' updated
    (1, wlen) rows passed in REGISTERS (returned below, carried across rings
    by the fori_loop) -- not through VMEM scratch, which would put a
    store->load roundtrip on the critical path of every corner coupling.
    Lanes of a carried row outside its producer's segment are stale, but the
    single-lane ``sel`` always reads inside it (windows nest across tiers).

    ``woff``/``wlen``: the tier's 128-aligned lane window (see ``_tiers``);
    all loads, stores and rows live on lanes [woff, woff+wlen), which must
    cover [lo-1, hi].

    ``blk``: optionally pre-loaded band block (see ``make_ring``: for rings
    k >= HOIST_MIN all four segment loads hoist to ring start, so each
    load's latency hides under the previous segments' compute).

    Returns ``(early_h, h_new, c_new)``, all (1, wlen):
      * ``h_new`` is the fully scanned height row (written to the grid);
      * ``early_h = a + b*roll(a, 1)`` is valid at the segment's FIRST TWO
        walk positions only (``b == 0`` at the walk start, so the one-stride
        partial scan is already exact there). 7 of the ring walk's 10 corner
        couplings read only a producer's first two cells; feeding them from
        ``early_h`` instead of ``h_new`` takes the producer's full scan off
        their critical path, so the VLIW scheduler overlaps N's scan with
        W's band prep (and S's with E's) -- the scan is ~2/3 of the kernel.
      * ``c_new`` has no scan; every confidence read is "early".

    ``deferred``: optionally ONE injection ``(band_row, dest, src, shift)``
    whose source is a producer's fully-scanned row (a "late" coupling).
    Such an injection only perturbs the stencil at the walk's LAST TWO
    cells, so instead of blocking this segment's scan on the producer's, it
    is applied as a post-scan fix: re-run the (cheap, latency-off-path) band
    update with the injection and recompute just the last two walk lanes
    with two sequential affine steps. With every late coupling deferred,
    all four ring scans are mutually independent and the VLIW scheduler
    runs them concurrently. Requires ring length > 3 (k >= 2): the walk's
    first-two and last-two cells must not overlap.
    """
    base = pl.multiple_of((fixed - 1) // 8 * 8, 8)
    off = fixed - 1 - base
    blk_h, blk_c = blk if blk is not None else _load_band(h_ref, c_ref, fixed, woff, wlen)
    # rotate the stencil band to static rows [0, 3)
    sh = pltpu.roll(blk_h, (ROW_BLK - off) % ROW_BLK, axis=0)
    sc = pltpu.roll(blk_c, (ROW_BLK - off) % ROW_BLK, axis=0)

    rows_h = [sh[0:1], sh[1:2], sh[2:3]]
    rows_c = [sc[0:1], sc[1:2], sc[2:3]]
    lane = lax.broadcasted_iota(jnp.int32, (1, wlen), 1) + woff
    for band_row, dest, (src_h, src_c), shift in injections:
        sel = lane == dest
        rows_h[band_row] = jnp.where(sel, _roll(src_h, shift, 1), rows_h[band_row])
        rows_c[band_row] = jnp.where(sel, _roll(src_c, shift, 1), rows_c[band_row])
    bh = jnp.concatenate(rows_h, axis=0)
    bc = jnp.concatenate(rows_c, axis=0)

    sgn = -1 if descending else 1
    if deferred is None:
        a, b, c_new = _band_update(config, bh, bc, fixed, lo, hi, descending, woff)
        early_h = a + b * _roll(a, sgn, 1)
        h_new = _affine_hillis_steele(a, b, descending, span)
    else:
        a, b, c_new, internals = _band_update(
            config, bh, bc, fixed, lo, hi, descending, woff, export=True
        )
        early_h = a + b * _roll(a, sgn, 1)
        h_new = _affine_hillis_steele(a, b, descending, span)
        band_row, dest, (src_h, src_c), shift = deferred
        sel = lane == dest
        a1, b1 = _band_delta(internals, bh, bc, band_row, sel, src_h, src_c, shift)
        # the injection perturbs a/b only at the walk's last two lanes;
        # h_new upstream of them is valid, so two affine steps repair them
        last = lo if descending else hi - 1
        penult = lo + 1 if descending else hi - 2
        f1 = a1 + b1 * _roll(h_new, sgn, 1)
        h_new = jnp.where(lane == penult, f1, h_new)
        f2 = a1 + b1 * _roll(h_new, sgn, 1)
        h_new = jnp.where(lane == last, f2, h_new)

    rows = lax.broadcasted_iota(jnp.int32, (ROW_BLK, wlen), 0)
    sel = rows == (off + 1)
    h_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, h_new, blk_h)
    c_ref[pl.ds(base, ROW_BLK), pl.ds(woff, wlen)] = jnp.where(sel, c_new, blk_c)
    return early_h, h_new, c_new


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

# Minimum ring index for hoisted band loads: the four segments' 16-row
# writeback blocks (rows [fixed-1-7, fixed-1+15] around i resp. outer) are
# pairwise disjoint iff outer - i = 2k + 2 > 22, i.e. k >= 11; below that a
# later segment's block writeback could clobber an earlier segment's updated
# row with the stale ring-start load, so small rings load per-segment.
HOIST_MIN = 11


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

    # Scratch rows persist segment outputs ONLY for tier transitions (the
    # carry rows re-embed at the next tier's window by re-reading them);
    # within a tier the couplings ride the fori_loop carry in registers.
    # sc_h rows 0..3 = [W.early, S.late, E.early, E.late]; sc_c rows
    # 0..2 = [W.c, S.c, E.c].
    sc_h[:] = jnp.full(sc_h.shape, z, jnp.float32)
    sc_c[:] = jnp.ones(sc_c.shape, jnp.float32)

    def make_ring(woff, wlen, hoist, span):
        def ring(k, carry):
            # ring k-1's coupling rows: early = first-two-walk-cells row,
            # late = fully scanned row (see _segment docstring)
            w_eh, w_c, s_lh, s_c, e_eh, e_lh, e_c = carry
            i = c_idx - 1 - k
            outer = 2 * c_idx - i

            if hoist:
                # ---- paired path: N+W and S+E stacked (see module doc) ----
                # All four band loads issue up-front (rows are pairwise
                # disjoint for k >= HOIST_MIN, so content is identical to
                # loading at segment time).
                blkN = _load_band(h_ref, c_ref, i, woff, wlen)
                blkW = _load_band(ht_ref, ct_ref, i, woff, wlen)
                blkS = _load_band(h_ref, c_ref, outer, woff, wlen)
                blkE = _load_band(ht_ref, ct_ref, outer, woff, wlen)
                lane1 = lax.broadcasted_iota(jnp.int32, (1, wlen), 1) + woff
                lane2 = lax.broadcasted_iota(jnp.int32, (2, wlen), 1) + woff

                def inject(rows_h, rows_c, stacked_row, dest, src_h, src_c,
                           shift):
                    sel = lane1 == dest
                    rows_h[stacked_row] = jnp.where(
                        sel, _roll(src_h, shift, 1), rows_h[stacked_row])
                    rows_c[stacked_row] = jnp.where(
                        sel, _roll(src_c, shift, 1), rows_c[stacked_row])

                # pair 1 = [N (rows copy), W (transposed copy)], ascending,
                # both fixed=i, walk [i, outer). Carry-sourced couplings
                # inject upfront (previous ring's rows sit in registers):
                #   N hi-row lane i+1     <- W(k-1) first walk cell (early)
                #   N hi-row lane outer-1 <- E(k-1) LAST walk cell
                #   W hi-row lane outer-1 <- S(k-1) LAST walk cell
                rows_h, rows_c = _stack_pair_rows(blkN, blkW, i)
                inject(rows_h, rows_c, 4, i + 1, w_eh, w_c, 0)
                inject(rows_h, rows_c, 4, outer - 1, e_lh, e_c, outer - i - 2)
                inject(rows_h, rows_c, 5, outer - 1, s_lh, s_c, outer - i - 2)
                bh1 = jnp.concatenate(rows_h, axis=0)
                bc1 = jnp.concatenate(rows_c, axis=0)
                a1, b1, c1 = _band_update(
                    config, bh1, bc1, i, i, outer, False, woff, r=2)
                # N's walk-start cells feed W's band (the (i, i) corner is a
                # column-segment double-visit): exact 3-lane refix of W
                n_eh = a1[0:1] + b1[0:1] * _roll(a1[0:1], 1, 1)
                a1, b1, c1 = _narrow_refix(
                    config, bh1, bc1, 1,
                    [(1, i, (n_eh, c1[0:1]), 0), (2, i, (n_eh, c1[0:1]), -1)],
                    i, i, outer, False, woff, wlen, a1, b1, c1)
                h1 = _affine_hillis_steele(a1, b1, False, span)
                w_eh = a1[1:2] + b1[1:2] * _roll(a1[1:2], 1, 1)
                _writeback(h_ref, c_ref, blkN, i, woff, wlen, h1[0:1], c1[0:1])
                _writeback(ht_ref, ct_ref, blkW, i, woff, wlen, h1[1:2], c1[1:2])

                # pair 2 = [S, E], descending, both fixed=outer, walk
                # (outer, i] (lanes [i, outer+1)). Upfront from carry:
                #   S lo-row lane outer-1 <- E(k-1) first walk cell (early)
                rows_h, rows_c = _stack_pair_rows(blkS, blkE, outer)
                inject(rows_h, rows_c, 0, outer - 1, e_eh, e_c, 0)
                bh2 = jnp.concatenate(rows_h, axis=0)
                bc2 = jnp.concatenate(rows_c, axis=0)
                a2, b2, c2, internals = _band_update(
                    config, bh2, bc2, outer, i, outer + 1, True, woff,
                    export=True, r=2)
                # S's walk-start cells feed E's band (the (outer, outer)
                # corner double-visit): exact 3-lane refix of E
                s_eh = a2[0:1] + b2[0:1] * _roll(a2[0:1], -1, 1)
                a2, b2, c2 = _narrow_refix(
                    config, bh2, bc2, 1,
                    [(0, outer, (s_eh, c2[0:1]), 1), (1, outer, (s_eh, c2[0:1]), 0)],
                    outer, i, outer + 1, True, woff, wlen, a2, b2, c2)
                h2 = _affine_hillis_steele(a2, b2, True, span)
                e_eh = a2[1:2] + b2[1:2] * _roll(a2[1:2], -1, 1)
                # TRUE late couplings (producers in THIS ring's pair 1):
                #   S lo-row lane i <- W(k) last walk cell,
                #   E lo-row lane i <- N(k) last walk cell
                # -> stacked deferred fix: _band_delta + two affine repair
                # steps at the walk's last two lanes (see _segment doc).
                # The refix lanes (near ``outer``) and the repair lanes
                # (i, i+1) are disjoint for the hoisted ring lengths, so the
                # pre-refix internals stay valid where the delta reads them.
                src_h = jnp.concatenate([h1[1:2], h1[0:1]], axis=0)
                src_c = jnp.concatenate([c1[1:2], c1[0:1]], axis=0)
                a2d, b2d = _band_delta(
                    internals, bh2, bc2, 0, lane1 == i, src_h, src_c,
                    i - outer + 1, r=2)
                f1 = a2d + b2d * _roll(h2, -1, 1)
                h2 = jnp.where(lane2 == i + 1, f1, h2)
                f2 = a2d + b2d * _roll(h2, -1, 1)
                h2 = jnp.where(lane2 == i, f2, h2)
                _writeback(h_ref, c_ref, blkS, outer, woff, wlen, h2[0:1], c2[0:1])
                _writeback(ht_ref, ct_ref, blkE, outer, woff, wlen, h2[1:2], c2[1:2])

                w_c, s_lh, s_c = c1[1:2], h2[0:1], c2[0:1]
                e_lh, e_c = h2[1:2], c2[1:2]
            else:
                # ---- small-ring sequential path (per-segment, upfront
                # injections; blocks may overlap, so loads happen at
                # segment time after the previous segment's writeback) ----
                def seg(ref_h, ref_c, fixed, lo2, hi2, desc, inj):
                    return _segment(config, ref_h, ref_c, fixed, lo2, hi2,
                                    desc, inj, woff, wlen, None, span=span)

                # N: top row i, ascending (reference walk order,
                # cpp:421-439). foreign reads: (i+1, i+1) <- W(k-1)'s FIRST
                # walk cell (early), (i+1, outer-1) <- E(k-1)'s LAST
                n_eh, n_lh, n_c = seg(h_ref, c_ref, i, i, outer, False, [
                    (2, i + 1, (w_eh, w_c), 0),
                    (2, outer - 1, (e_lh, e_c), outer - i - 2),
                ])
                # W: left column == HT row i, ascending.
                # foreign: (i, i) <- N(k) walk cell 1, (i, i+1) <- N(k)
                # walk cell 2 [lane i+1 -> i], (outer-1, i+1) <- S(k-1) last
                w_eh, w_lh, w_c = seg(ht_ref, ct_ref, i, i, outer, False, [
                    (1, i, (n_eh, n_c), 0),
                    (2, i, (n_eh, n_c), -1),
                    (2, outer - 1, (s_lh, s_c), outer - i - 2),
                ])
                # S: bottom row outer, descending.
                # foreign: (outer-1, i) <- W(k)'s LAST walk cell [lane i],
                # (outer-1, outer-1) <- E(k-1)'s first walk cell (early)
                s_eh, s_lh, s_c = seg(h_ref, c_ref, outer, i, outer + 1, True, [
                    (0, outer - 1, (e_eh, e_c), 0),
                    (0, i, (w_lh, w_c), i - outer + 1),
                ])
                # E: right column == HT row outer, descending.
                # foreign: (i, outer-1) <- N(k)'s LAST walk cell [lane i],
                # (outer, outer-1) <- S(k) walk cell 2, (outer, outer) <-
                # S(k) walk cell 1
                e_eh, e_lh, e_c = seg(ht_ref, ct_ref, outer, i, outer + 1, True, [
                    (0, outer, (s_eh, s_c), 1),
                    (1, outer, (s_eh, s_c), 0),
                    (0, i, (n_lh, n_c), i - outer + 1),
                ])

            # persist for the next tier's carry re-embed (dead until tier end)
            for slot, row in enumerate((w_eh, s_lh, e_eh, e_lh)):
                sc_h[slot : slot + 1, pl.ds(woff, wlen)] = row
            for slot, row in enumerate((w_c, s_c, e_c)):
                sc_c[slot : slot + 1, pl.ds(woff, wlen)] = row
            return (w_eh, w_c, s_lh, s_c, e_eh, e_lh, e_c)

        return ring

    first = True
    for woff, wlen, k_start, k_stop in _tiers(pad, c_idx):
        if first:
            seed_h = jnp.full((1, wlen), z, jnp.float32)
            seed_c = jnp.ones((1, wlen), jnp.float32)
            carry = (seed_h, seed_c, seed_h, seed_c, seed_h, seed_h, seed_c)
            first = False
        else:
            # re-embed the carry rows at this tier's (wider) window
            h_rows = [sc_h[s : s + 1, pl.ds(woff, wlen)] for s in range(4)]
            c_rows = [sc_c[s : s + 1, pl.ds(woff, wlen)] for s in range(3)]
            carry = (h_rows[0], c_rows[0], h_rows[1], c_rows[1],
                     h_rows[2], h_rows[3], c_rows[2])
        # ring subranges: hoisting needs k >= HOIST_MIN; extra cuts at every
        # radix-4 scan-span boundary (walk length 2k+3 crosses 4^m at
        # k = 7, 31, 127, 511) give each shorter-ring range one fewer
        # sequential scan level -- at 1200^2 the 511 cut alone saves a level
        # on 384 rings (the single-cut version ran rings 127-510 at the
        # 6-level span of ring 599)
        cuts = sorted({
            k_start,
            min(max(k_start, HOIST_MIN), k_stop),
            *(min(max(k_start, c), k_stop) for c in (7, 31, 127, 511)),
            k_stop,
        })
        for a, b in zip(cuts, cuts[1:]):
            span = 2 * (b - 1) + 3  # longest walk in rings [a, b)
            carry = lax.fori_loop(
                a, b, make_ring(woff, wlen, a >= HOIST_MIN, span), carry
            )


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
