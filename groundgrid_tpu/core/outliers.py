"""Occlusion-based outlier rejection (vectorized ray-march).

TPU-native replacement for the per-point while-loop inside
``GroundSegmentation::insert_cloud`` (``GroundSegmentation.cpp:242-275``):
points that fall >= 0.2 m below the current terrain estimate are traced from
the sensor origin in whole-metre steps along the (unit) ray; if the line of
sight crosses a cell whose 3x3 ground-confidence block sum exceeds
``min_outlier_detection_ground_confidence`` (plus the cell-level confidence
and height tests), the point is an occluded-return outlier and is force
labeled ground.

Design notes:
  * The test reads the **previous scan's** ``ground``/``groundpatch`` --
    identical to the reference, where those layers are only written by later
    stages, so insert-threads always saw the prior scan's terrain.
  * Candidates (z < ground - 0.2) are rare (<~1% of a scan), so they are
    compacted into a fixed ``max_outlier_candidates`` buffer by a
    budget-descending sort, and ray-marched in fixed-size chunks that stop
    at the actual candidate count; overflow sheds the shortest-budget
    candidates first and degrades gracefully to "not outlier".
  * The three per-sample table tests (3x3 confidence block sum, cell
    confidence, terrain height vs ray height) fold into ONE table lookup: a
    per-cell monotonic-uint32 key that is 0 where the confidence tests fail
    and an order-preserving encoding of ``ground`` elsewhere, so
    ``key[cell] >= key(ray_z + tol)`` reproduces the reference's float
    comparison exactly.
  * Everything is flat 1-D: the (K x S) candidate-x-step lattice is linearized
    and rebuilt from a 1-D iota (candidate = i // S, step = i % S + 3).
    Outer-product broadcasts / (K, S) reshapes hit multi-millisecond XLA
    slow paths on TPU; the 1-D formulation runs the whole march in ~40 us.
  * The march is f64-faithful end to end (matches the reference's
    double-precision tf2/Eigen/grid_map math as transcribed by golden.py):
    ray length = correctly-rounded f32 sqrt of the f64 sum of squares
    (exactf32.sqrt_rn_ds), direction = IEEE-rounded quotients
    (exactf32.div_rn), the step budget is the oracle's own
    ``step^2 < fl32(length^2)`` loop test, lattice samples bin through the
    same ds index math as every point-binning site
    (rasterize.faithful_cells), and the sample/threshold products are
    barrier-pinned against XLA FMA contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from groundgrid_tpu.config import GroundGridConfig
from groundgrid_tpu.core import exactf32
from groundgrid_tpu.core.rasterize import Binning, faithful_cells

U32_TOP = np.uint32(0x80000000)

# largest point count whose indices fit the u32 sort key's low 17 bits;
# beyond it candidate selection falls back to the (f32, i32) top_k pair sort
U32_SORT_MAX_POINTS = 1 << 17

# row-count granularity of the sorted-lookup kernel (pallas_lookup.GROUP;
# literal here so importing this module never touches pallas)
_LOOKUP_GROUP = 1024


def _mono_u32(f):
    """Order-preserving f32 -> uint32 (total order on non-NaN floats)."""
    u = lax.bitcast_convert_type(f, jnp.uint32)
    return jnp.where(f >= 0, u | U32_TOP, ~u)


def occlusion_key_table(config: GroundGridConfig, ground, groundpatch):
    """Per-cell monotonic occlusion key (flattened, (N*N,) uint32).

    key = mono(ground) where [3x3 block sum of confidence > min_conf AND
    confidence > 0.01], else 0. The block sum uses the reference's low-side
    index clamp: block<3,3>(max(i-1,2), max(j-1,2)) == centered sum at
    (max(i,3), max(j,3)) (GroundSegmentation.cpp:268).
    """
    box = lax.reduce_window(groundpatch, 0.0, lax.add, (3, 3), (1, 1), "SAME")
    # low-side clamp: rows/cols 0..2 read the row/col-3 block sum
    box = jnp.concatenate([jnp.broadcast_to(box[3:4, :], (3,) + box.shape[1:]), box[3:]], axis=0)
    box = jnp.concatenate([jnp.broadcast_to(box[:, 3:4], box.shape[:1] + (3,)), box[:, 3:]], axis=1)
    ok = (box > np.float32(config.min_outlier_detection_ground_confidence)) & (
        groundpatch > np.float32(0.01)
    )
    key = jnp.where(ok, _mono_u32(ground), np.uint32(0))
    return key.reshape(-1)


def _pair_table(config: GroundGridConfig, ground, groundpatch, key_only: bool):
    """(N*N, 2) f32 table: [bitcast(occlusion key), ground-or-key].

    Row gathers of width >= 2 amortize the per-index overhead of this
    backend's serial gathers (~3x faster than 1-wide), so both the candidate
    test (needs ground) and the ray-march (needs the key) read this one
    two-column table.

    ``key_only`` (lookup-kernel mode, where the candidate test never reads
    this table): the key is DUPLICATED into both columns, which lets the
    march's threshold test run in the gather's native (rows, 2) layout as
    ``any(pair >= thr)`` -- exactly equivalent, and it avoids a ~130 us
    XLA column-extract relayout of the gathered rows.
    """
    key = occlusion_key_table(config, ground, groundpatch)
    key_f = lax.bitcast_convert_type(key, jnp.float32)
    if key_only:
        # broadcast, not stack: the gather engine wants a lane-PADDED
        # (n2, 2){1,0:T(8,128)} operand (2 useful of 128 lanes per tile), and
        # the broadcast fuses into that layout directly (~80 us). The stack
        # form costs two relayout copies (~48 + ~33 us); a Pallas
        # lane-interleave kernel was tried and is WORSE (~15 us kernel + a
        # ~93 us XLA relayout of its packed output into the padded layout).
        return jnp.broadcast_to(key_f[:, None], (key_f.shape[0], 2))
    return jnp.stack([key_f, ground.reshape(-1)], axis=-1)


def detect_outliers(
    config: GroundGridConfig,
    center,
    ground,
    groundpatch,
    binning: Binning,
    x,
    y,
    z,
    origin,
    old_h=None,
    use_lookup_kernel: bool = False,
    _interpret: bool = False,
    center_lo=None,
) -> jax.Array:
    """Returns (P,) bool: True for occluded-return outliers.

    ``ground``/``groundpatch`` must be the pre-update (previous scan) layers.

    ``center_lo``: ds tail of the f64 grid center (GridState.center_lo) for
    the f64-faithful lattice binning; ``None`` degrades to a zero tail.

    ``old_h``: optional precomputed per-point previous terrain height
    ``ground[cell]`` -- the sorted-scan pipeline supplies it from the Pallas
    lookup kernel (ops/pallas_lookup.py) instead of the serial XLA row
    gather. Values at non-inmap points may differ (masked by ``inmap``).

    ``use_lookup_kernel``: route the march-lattice key reads through the
    sorted-lookup Pallas kernel (sort lattice cells, look up, sort back by
    position -- see ``lattice_hits``) instead of XLA row gathers. Requires a
    Pallas-capable backend (or ``_interpret`` for tests).
    """
    n = config.cell_count
    # small scans (tests, decimated feeds) can carry fewer points than the
    # configured candidate cap; every candidate fits in a point-count buffer
    k_max = min(config.max_outlier_candidates, int(x.shape[0]))
    if k_max == 0:
        # zero-point scan (or a zero candidate cap): nothing can march
        return jnp.zeros((x.shape[0],), bool)
    tol = np.float32(config.outlier_tolerance)

    # NOTE: the XLA-gather march keeps the 2-wide pair-table row gather even
    # when old_h is precomputed -- a 1-wide gather from the flat u32 key
    # table was measured 4x SLOWER (679 vs 164 us for 95k rows): row gathers
    # of width >= 2 amortize this backend's per-index overhead. The
    # lookup-kernel march instead reads the 1-column key table directly
    # (the kernel's lane gathers have no per-row width penalty), so the
    # (N*N, 2) pair-table broadcast (~105 us) is skipped entirely when every
    # lattice call can ride the kernel.
    key_only = old_h is not None
    key_flat = occlusion_key_table(config, ground, groundpatch)
    pair_table = None

    if old_h is None:
        pair_table = _pair_table(config, ground, groundpatch, key_only)
        flat_cell = jnp.clip(binning.gi0, 0, n - 1) * n + jnp.clip(binning.gi1, 0, n - 1)
        old_h = pair_table[flat_cell][:, 1]  # 2-wide row gather (see _pair_table)
    cand = binning.inmap & ~binning.ignored & (z < old_h - np.float32(0.2))

    # ---- per-point march budgets, elementwise over the whole scan ----
    # The loop-invariant conditions of the reference's per-step while loop
    # (GroundSegmentation.cpp:258) fold into a per-point step budget:
    # non-candidates and non-descending rays march 0 steps. Elementwise over
    # (P,) arrays this is VPU-vectorized and ~free, and it lets candidate
    # SELECTION sort directly on the budget -- no per-candidate gathers
    # before the march chunks (3x 8192-row 1-wide gathers, ~200 us, in the
    # gather-then-sort formulation this replaced).
    #
    # f64-faithful rounding (matches golden.py:198-202 / the reference's
    # double-precision tf2+Eigen math bitwise): length is the correctly-
    # rounded f32 of sqrt(f64 sum of squares) via ds arithmetic, the ray
    # direction components are IEEE round-to-nearest quotients (TPU's native
    # divide is reciprocal+refinement, NOT IEEE), and the step budget is the
    # oracle's own ``step*step < fl32(length*length)`` test -- the BUDGET
    # arrays carry fl32(length^2), and ``within`` compares exact kk^2
    # against it (comparing kk < length instead diverges when length^2
    # rounds exactly onto a perfect square).
    dxa = x - origin[0]
    dya = y - origin[1]
    dza = z - origin[2]
    ssh, ssl = exactf32.sumsq3_ds(dxa, dya, dza)
    length_all = exactf32.sqrt_rn_ds(ssh, ssl)
    len2_all = exactf32.barrier(length_all * length_all)
    vz_all = exactf32.div_rn(dza, length_all)
    budget_all = jnp.where(
        cand & (vz_all < np.float32(-0.01)), len2_all, 0.0
    )

    # Budget-tiered step ranges (measured on the bench workload,
    # scripts/march_stats.py): warm-scan budgets are bimodal -- most
    # candidates are either short (< 8 m) or mid-range (12-64 m), and almost
    # none reach step 64 -- so the lattice runs as THREE tiers with
    # descending candidate widths: steps [3, 8) for every buffered
    # candidate, [8, 64) for the budget-sorted prefix at half width, and
    # [64, ray_steps) at 1/8 width. Each tier is its own chunked while_loop
    # (no lax.cond anywhere: TPU conditionals are scheduling barriers that
    # cost ~70 us even untaken -- the round-3 far-tier cond this replaces).
    # Tier widths in 1/8ths of march_chunk: the mid tier's 5/8 (640) sits
    # just above the measured warm-scan p-max of budget>=8^2 counts (~590),
    # so its storm loop never fires on warm scans.
    TIER_STEPS = (8, 64)
    TIER_EIGHTHS = (8, 5, 1)

    # ---- candidate compaction: ONE budget-descending sort ----
    # (A cumsum + vectorized-binary-search compaction was measured ~3x
    # slower: XLA's searchsorted while-loop costs ~270 us; a one-hot-matmul
    # slot compaction via the raster kernel costs as much in B-matrix DMA as
    # the sort it replaces.) Sorting by budget makes marchable candidates a
    # prefix AND fixes overflow shedding: if a scan ever exceeds
    # ``max_outlier_candidates`` the buffer keeps the longest-budget rays --
    # zero-budget candidates can never fire, so only potentially-firing
    # candidates are ever shed, and only after the 8192 cap (above the
    # ~5500-outlier storm peak measured on the adversarial benchmark; the
    # reference marches every candidate, GroundSegmentation.cpp:242).
    p_total = x.shape[0]
    idx_mask = np.uint32((1 << 17) - 1)
    # truncated monotone budget encoding (top 15 bits); the far-prefix count
    # below uses the SAME truncation so prefix containment is exact
    trunc_all = _mono_u32(budget_all) & ~idx_mask
    if p_total <= U32_SORT_MAX_POINTS:
        # pack (quantized budget, point index) into ONE u32 key and sort a
        # single array: ~2x cheaper than top_k's (f32 key, i32 iota) pair
        # sort (107 -> ~60 us at 131k points). The low 17 bits carry the
        # index; the top 15 bits the monotone budget encoding. is_stable=
        # False: keys are unique (index in the low bits), and a stable sort
        # silently adds a second s32 iota operand (~2x cost).
        key = trunc_all | jnp.arange(p_total, dtype=jnp.uint32)
        # ascending complement == descending key
        nk_sorted = lax.sort(~key, is_stable=False)
        key_sorted = ~lax.slice_in_dim(nk_sorted, 0, k_max)
        pidx = (key_sorted & idx_mask).astype(jnp.int32)
    else:
        _, pidx = lax.top_k(budget_all, k_max)

    # Per-tier prefix counts, elementwise over all P (no gathers). Each
    # count uses the truncated budget encoding: the sort orders by
    # (truncated budget, index), so counting with the same truncation keeps
    # every candidate with exact budget >= s^2 inside the first count
    # positions (truncation is monotone => a superset of the exact set,
    # which is always safe: the extra borderline rows' ``within`` masks
    # still apply the exact test). Budgets carry fl32(length^2), so the
    # tier thresholds are s^2 -- exact in f32 for s <= 2^12. The first
    # tier gates on prefix_count(3), not count(budget > 0): a candidate
    # with 0 < budget < 9 has ``within == False`` at every step >= 3, so
    # skipping it entirely is exact.

    def prefix_count(s: int):
        t = np.uint32(
            (int((np.float32(s) * np.float32(s)).view(np.uint32)) | 0x80000000)
            & ~int(idx_mask)
        )
        return jnp.sum((trunc_all >= t).astype(jnp.int32))

    # static tier geometry: (s_lo, s_hi, chunk, active-prefix count)
    base_chunk = min(config.march_chunk, k_max)
    bounds = [3]
    for s in TIER_STEPS:
        if bounds[-1] < s < config.ray_steps:
            bounds.append(s)
    bounds.append(config.ray_steps)
    tiers = []
    for t, (s_lo, s_hi) in enumerate(zip(bounds, bounds[1:])):
        tchunk = min(max(base_chunk * TIER_EIGHTHS[t] // 8, 1), k_max)
        tiers.append((s_lo, s_hi, tchunk, prefix_count(s_lo)))

    # the march-lattice table reads: 1-column u32 key table for the
    # sorted-lookup kernel route; the (N*N, 2) pair table only if some
    # lattice call must take the XLA row-gather route (its build is a
    # ~105 us relayout broadcast -- skip it when nothing reads it)
    key_table_f = lax.bitcast_convert_type(key_flat, jnp.float32)
    peeled_rows = sum(tc * (s_hi - s_lo) for s_lo, s_hi, tc, _ in tiers)
    lattice_rows = [peeled_rows] + [
        tc * (s_hi - s_lo)
        for s_lo, s_hi, tc, _ in tiers
        if -(-k_max // tc) > 1
    ]
    needs_xla = (not use_lookup_kernel) or any(
        r % _LOOKUP_GROUP for r in lattice_rows
    )
    if needs_xla and pair_table is None:
        pair_table = _pair_table(config, ground, groundpatch, key_only)

    def lattice_parts(kv, s_lo: int, s_hi: int):
        """One tier's (s_hi-s_lo, k') march lattice, stopping short of the
        table read: returns ``(flat_cell, threshold, within & inside)``.

        2-D broadcasts instead of flat candidate-id gathers: device
        traces show per-element gathers/scatters run serially
        (~8.5 ns/elem) on this backend, so the five j-indexed gathers +
        the per-candidate scatter of the flat formulation cost ~34 ms;
        the broadcast form leaves exactly ONE serial gather (the
        occlusion key table).

        STEP-MAJOR layout: the candidate axis is the minor (lane) axis.
        Candidate-major (k', S) arrays waste lanes badly -- a (1024, 5)
        tier pads its minor dim to 128 lanes (25x) -- while (S, k') keeps
        every vreg full (k' is always a multiple of 128 at the default
        geometry); measured ~2x on the lattice's elementwise bucket.
        """
        bvx, bvy, bvz, bbudget = kv
        kk = lax.broadcasted_iota(
            jnp.float32, (s_hi - s_lo, bvx.shape[0]), 0
        ) + np.float32(s_lo)
        # the oracle's loop test is step^2 < fl32(length^2) (golden.py:202,
        # numpy promotes the int to f32); kk^2 is exact for kk < 2^12 and
        # the budget arrays carry fl32(length^2)
        within = kk * kk < bbudget[None, :]

        # sample positions and the ray-height threshold must round exactly
        # like the oracle's separate f32 ops (origin + fl(step*vec)); the
        # barriers pin the products against XLA FMA contraction, which
        # would fuse them EXACTER than the oracle and shift near-edge
        # samples / near-threshold heights by an ulp
        sx = origin[0] + exactf32.barrier(kk * bvx[None, :])
        sy = origin[1] + exactf32.barrier(kk * bvy[None, :])
        # f64-faithful lattice binning (GroundSegmentation.cpp:262-268 bins
        # ray samples through grid_map's double-precision index math; the
        # ds form matches it bitwise outside a ~1e-12 m edge band -- same
        # treatment as every point-binning site, rasterize.faithful_cells)
        i0, i1 = faithful_cells(config, center, center_lo, sx, sy)
        inside = (i0 > 0) & (i1 > 0) & (i0 < n - 1) & (i1 < n - 1)
        flat = jnp.clip(i0, 0, n - 1) * n + jnp.clip(i1, 0, n - 1)
        thr = _mono_u32(exactf32.barrier(kk * bvz[None, :]) + origin[2] + tol)
        return flat, thr, within & inside

    def table_hits(parts):
        """Table reads + per-candidate hit reduction for one OR MORE tier
        lattices in a single pass: the parts' flattened rows concatenate
        into one table read (one sort pair + one kernel call on the
        sorted-lookup route), and the hits split back per part. Returns one
        (k',) 0/1 array per part.
        """
        sizes = [p[0].shape[0] * p[0].shape[1] for p in parts]
        rows = sum(sizes)
        flat1 = jnp.concatenate([p[0].reshape(-1) for p in parts])
        thr1 = jnp.concatenate([p[1].reshape(-1) for p in parts])
        if use_lookup_kernel and rows % _LOOKUP_GROUP == 0:
            # sorted-lookup route: XLA row gathers run ~8 ns/row serial on
            # this backend, the lookup kernel's lane gathers ~0.5 ns/row on
            # SORTED cells -- so sort the lattice cells (positions ride as
            # payload), look up, and sort back by position. Two unstable
            # 2-operand sorts + the kernel beat the row gather ~2x at
            # 29696 rows; duplicates are fine (equal cells read equal
            # values, and the restore key -- the position -- is unique).
            from groundgrid_tpu.ops.pallas_lookup import sorted_lookup

            pos = jnp.arange(rows, dtype=jnp.uint32)
            cell_s, pos_s = lax.sort(
                (flat1.astype(jnp.uint32), pos), num_keys=1, is_stable=False
            )
            (val_s,) = sorted_lookup(
                cell_s.astype(jnp.int32), [key_table_f], n * n,
                interpret=_interpret,
            )
            _, val_u = lax.sort(
                (pos_s, lax.bitcast_convert_type(val_s, jnp.uint32)),
                num_keys=1, is_stable=False,
            )
            key_hit1 = val_u >= thr1
        elif key_only:
            # both table columns hold the key: test in the gather's
            # native (rows, 2) layout -- no column extract/relayout
            pairs = lax.bitcast_convert_type(pair_table[flat1], jnp.uint32)
            key_hit1 = jnp.any(pairs >= thr1[:, None], axis=-1)
        else:
            key = lax.bitcast_convert_type(
                pair_table[flat1][:, 0], jnp.uint32
            )
            key_hit1 = key >= thr1
        hits = []
        off = 0
        for (flat, _, mask), size in zip(parts, sizes):
            kh = lax.slice_in_dim(key_hit1, off, off + size).reshape(flat.shape)
            off += size
            hits.append(jnp.any(mask & kh, axis=0).astype(jnp.int32))
        return hits

    # ---- tiered march: peeled first chunk + per-tier storm loops ----
    # The march's dominant cost at warm candidate counts is SERIAL
    # STRUCTURE, not lattice rows (measured: a 1-trip while_loop costs
    # ~80-110 us regardless of body size -- loop barrier + chunk gathers +
    # sort pair + kernel dispatch -- while kernel lattice rows cost
    # ~0.6 ns/row). So the first chunk of every tier is PEELED out of the
    # loops and fused into ONE combined lattice: one set of candidate
    # gathers (the tier widths nest, so narrower tiers slice prefixes of
    # the widest tier's chunk data), one table read (one sort pair + one
    # lookup-kernel call), one hit scatter. Warm scans (every tier's
    # active prefix inside its first chunk -- the overwhelmingly common
    # case, scripts/march_stats.py) never touch a while_loop at all; the
    # per-tier loops only engage from chunk 1 on occlusion storms (bridge
    # underpasses reach ~5500 fired outliers; cold starts buffer k_max).
    #
    # Exact: the budget sort makes each tier's active candidates a prefix,
    # the peeled chunk + loop chunks cover that prefix, and every chunk's
    # candidates see the identical per-ray test (a candidate below a
    # tier's budget threshold has ``within == False`` at every tier step,
    # so over-processing -- peeled slots beyond the active count, or the
    # truncated prefix encoding's borderline extras -- is harmless, and
    # re-marching a slot is idempotent under the .max() scatter). A
    # lax.switch chunk-size ladder was measured and rejected -- TPU
    # conditionals are scheduling barriers whose cost grows with the branch
    # bodies PRESENT (a 4-tier ladder cost +0.5 ms/scan, a 2-tier ladder
    # +0.8 ms/scan on steps that only ever took the smallest tier), and the
    # round-3 narrow/wide far-width lax.cond cost ~70 us/step even on its
    # narrow branch -- the peel subsumes both. Under vmap a while_loop runs
    # until every batch lane is done; the fleet path batches with lax.map,
    # which keeps the per-vehicle trip counts independent.
    loop_tiers = [t for t in tiers if -(-k_max // t[2]) > 1]
    pad_to = max(
        [-(-k_max // tc) * tc for _, _, tc, _ in loop_tiers], default=k_max
    )
    if pad_to > k_max:
        # padding slots repeat point 0; its budget gathers to its true value
        # and the hit scatter is a .max() -- marching a point twice is
        # idempotent, so duplicates are harmless
        pidx = jnp.concatenate(
            [pidx, jnp.zeros((pad_to - k_max,), pidx.dtype)]
        )

    def ray_data(cpidx):
        # per-chunk candidate data: three 1-wide chunk-row gathers + an
        # elementwise rebuild of the unit ray (bitwise equal to the
        # elementwise budget pass above -- same ops, same order), plus the
        # exact budget gathered from the precomputed per-point array
        cpx = x[cpidx]
        cpy = y[cpidx]
        cpz = z[cpidx]
        cbud = budget_all[cpidx]
        dx = cpx - origin[0]
        dy = cpy - origin[1]
        dz = cpz - origin[2]
        csh, csl = exactf32.sumsq3_ds(dx, dy, dz)
        length = exactf32.sqrt_rn_ds(csh, csl)
        # IEEE-rounded quotients, bitwise the oracle's vec /= length
        # (golden.py:200; TPU's native divide is not correctly rounded)
        cvx = exactf32.div_rn(dx, length)
        cvy = exactf32.div_rn(dy, length)
        cvz = exactf32.div_rn(dz, length)
        return cvx, cvy, cvz, cbud

    # peeled chunk 0: tier widths are nonincreasing, so every tier's first
    # chunk is a static prefix of the widest tier's -- one gather set
    width0 = tiers[0][2]
    c0 = lax.slice_in_dim(pidx, 0, width0)
    rd0 = ray_data(c0)
    parts0 = [
        lattice_parts(tuple(lax.slice_in_dim(a, 0, tc) for a in rd0), s_lo, s_hi)
        for s_lo, s_hi, tc, _ in tiers
    ]
    hits0 = table_hits(parts0)
    hit0 = hits0[0]
    for h, (_, _, tc, _) in zip(hits0[1:], tiers[1:]):
        hit0 = jnp.maximum(hit0, jnp.pad(h, (0, width0 - tc)))
    out = jnp.zeros((x.shape[0],), jnp.int32).at[c0].max(hit0)

    # storm continuation: per-tier while_loops over chunks 1..
    for s_lo, s_hi, tchunk, count in loop_tiers:
        max_trips = -(-k_max // tchunk)

        def loop_cond(st, max_trips=max_trips, tchunk=tchunk, count=count):
            i, _ = st
            return (i < max_trips) & (i * tchunk < count)

        def loop_body(st, s_lo=s_lo, s_hi=s_hi, tchunk=tchunk):
            i, hits = st
            cpidx = lax.dynamic_slice_in_dim(pidx, i * tchunk, tchunk)
            (hit_c,) = table_hits([lattice_parts(ray_data(cpidx), s_lo, s_hi)])
            return i + 1, hits.at[cpidx].max(hit_c)

        _, out = lax.while_loop(loop_cond, loop_body, (jnp.int32(1), out))
    return out > 0
