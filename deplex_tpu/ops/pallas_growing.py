"""Pallas TPU kernel for the region-growing rounds loop.

The XLA while_loop in ops/growing.py is latency-bound: ~40 sequential
rounds x ~150 small HLO ops each, every op paying fixed dispatch overhead.
This kernel runs the ENTIRE loop on-core: the cell grid lives in VMEM
(padded to (8,128)-aligned tiles) and every round is a handful of VPU
vector ops, so the stage drops from milliseconds to microseconds.

Same output contract as growing.grow_rounds (RoundData) — the batched
fits/gates/labels post-pass (growing.finalize_rounds) is shared.

Design notes (what stays OUT of the sequential loop):
  * Per-round moment sums are NOT computed in the kernel. The loop only
    decides WHICH cells each round consumes (round_map) and each round's
    seed id; growing.region_sums recovers the (R_MAX, 16) statistics
    afterwards with one-hot MXU contractions. The former in-kernel sums
    cost ~11 masked VPU reductions per frame per round — the kernel's
    single largest cost.
  * The mutable normals histogram is kept per frame as an (8, 128) f32
    register tile (bins <= 1024), maintained LAZILY: consuming a region
    never updates it (a per-bin decrement is a scatter, and regions can
    span ~70 distinct bins — low-polar normals quantize into wildly
    varying azimuth bins — so an eager distinct-bin extraction loop
    measured as the kernel's second-largest cost). Counts are corrected
    only at selection time: argmax the stale tile, recount the winning bin
    against the live `bins` canvas (one comparison + reduction), write the
    true count back, and repeat until the argmax verifies. Since
    consumption only lowers true counts, stale >= true is an invariant, so
    a verified peak dominates every other bin's true count and the
    selected bin (first-max tie-break) is exactly the one an eagerly
    maintained histogram would give: any earlier bin with the same true
    count would also be a stale maximum and would have won the first-max.
    Each failing probe strictly lowers one stale count, so the loop
    terminates; in practice it verifies in ~1 probe per round because a
    stale bin is only probed once its stale count tops the running max.
  * Flood fill is 4-neighbor mask propagation with zero-padded shifts
    (slice+concat, which Mosaic lowers to lane/sublane shifts), 8 hops per
    fixpoint check, exactly like the XLA path.

VMEM budget: ~12 f32 planes of (PH, PW) + small outputs; supported() gates
grids whose padded planes fit comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deplex_tpu.config import Config
from deplex_tpu.ops.cellstats import CellStats
from deplex_tpu.ops.histogram import normal_bins

_LANES = 128
_SUBLANES = 8


def _round_up(n, m):
    return (n + m - 1) // m * m


def _pack_factor(n_frames: int, gw: int) -> int:
    """Frames packed side-by-side along lanes in one sublane band.

    A 640-wide frame at patch 10 has gw=64 cells: padding it alone to the
    128-lane tile wastes half of every vector op. Packing two frames per
    band (cols [0,64) and [64,128)) makes the canvas half the size, so the
    shared flood-fill / consumption vector work runs ~2x faster. Leak-safe
    because admissibility edges are False on every frame border
    (growing.admissibility_edges) and padding cells are non-planar.
    """
    return 2 if (gw <= _LANES // 2 and n_frames % 2 == 0) else 1


def pallas_batched_supported(n_frames: int, grid_shape, config: Config) -> bool:
    """VMEM check for the stacked-batch kernel ((NB*PH, PW) planes)."""
    gh, gw = grid_shape
    k = _pack_factor(n_frames, gw)
    ph, pw = _round_up(gh, _SUBLANES), _round_up(gw, _LANES)
    if config.histogram_bins_per_coord ** 2 > _SUBLANES * _LANES:
        return False
    vmem = (12 * (n_frames // k) * ph * pw * 4
            + n_frames * (_SUBLANES * _LANES
                          + _round_up(config.max_region_growing_rounds, _LANES)) * 4)
    if vmem > 10 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_supported(grid_shape, config: Config) -> bool:
    """True if the kernel's VMEM plan fits this grid (and we're on TPU)."""
    return pallas_batched_supported(1, grid_shape, config)


def pallas_batched_chunk(n_frames: int, grid_shape, config: Config) -> int | None:
    """Largest divisor of n_frames whose stacked canvas fits the VMEM plan.

    The serving path's batch-size negotiation: a batch that misses the plan
    at B (e.g. 720p's 90x160 grid at B=8) runs the SAME stacked kernel over
    B/chunk sequential chunks instead of silently falling off to the XLA
    growing path — the kernel's per-round amortization is preserved at any
    serving batch size. Returns None when even one frame doesn't fit.
    """
    for b in range(n_frames, 0, -1):
        if n_frames % b == 0 and pallas_batched_supported(b, grid_shape, config):
            return b
    return None


def _shift(x, dr, dc):
    """Zero-padded shift: result[r, c] = x[r-dr, c-dc]."""
    z_row = jnp.zeros((1, x.shape[1]), x.dtype)
    z_col = jnp.zeros((x.shape[0], 1), x.dtype)
    if dr == 1:
        x = jnp.concatenate([z_row, x[:-1, :]], axis=0)
    elif dr == -1:
        x = jnp.concatenate([x[1:, :], z_row], axis=0)
    if dc == 1:
        x = jnp.concatenate([z_col, x[:, :-1]], axis=1)
    elif dc == -1:
        x = jnp.concatenate([x[:, 1:], z_col], axis=1)
    return x


def _kernel_batched(hist0_ref, planar_ref, bins_ref, mse_ref,
                    eu_ref, ed_ref, el_ref, er_ref,
                    round_map_ref, seeds_ref, nrounds_ref, *,
                    n_frames: int, ph: int, r_max: int, min_candidates: int,
                    k: int):
    """Batched rounds loop: frames stacked along sublanes AND lanes.

    Each sublane band of `ph` rows holds `k` frames side by side along the
    lane axis (k = _pack_factor; 2 for VGA-at-patch-10 grids whose 64-cell
    width would otherwise waste half of every 128-lane vector op). Flood
    fill and consumption run once on the stacked canvas. Shifts cannot leak
    across frames: border edge masks are False in both directions.

    NO per-frame scalar reductions appear in the loop body: a cross-lane
    reduction that lands in a scalar register costs ~100+ cycles of
    serialization, and the previous kernel issued ~55 of them per round
    (dominant cost, measured). Instead every per-frame quantity (dominant
    bin, verified count, seed id, region size, round counter) is kept as a
    (B, PW) BROADCAST ROW PLANE — row f holds frame f's value in every lane
    — computed by native sublane reductions plus log2(PW) lane-roll
    doubling, entirely in vector registers. The only scalars are the three
    while-loop conditions (~5 scalar reductions per round total).
    """
    B, PH = n_frames, ph
    NB = B // k
    BPH, PW = planar_ref.shape
    HALF = PW // k
    R_PAD = seeds_ref.shape[1]
    f32 = jnp.float32

    planar = planar_ref[:]
    bins0 = bins_ref[:]
    mse = mse_ref[:]
    eu, ed, el, er = eu_ref[:], ed_ref[:], el_ref[:], er_ref[:]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (BPH, PW), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (BPH, PW), 1)
    # Frame-local flat id (identical across bands/halves so slices compare
    # alike; monotonic in (row, col) so argmin tie-breaks match the XLA path).
    flat_iota = (row_iota % PH) * HALF + col_iota % HALF
    big = jnp.int32(PH * HALF + 1)

    hrow_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)
    hcol_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    hbin_iota = hrow_iota * _LANES + hcol_iota
    lane_rpad = jax.lax.broadcasted_iota(jnp.int32, (B, R_PAD), 1)

    # Lane-half masks as (1, PW) rows (None when the band is one frame).
    lrow = jax.lax.broadcasted_iota(jnp.int32, (1, PW), 1)
    if k == 1:
        half_rows = [None]
    else:
        half_rows = [(lrow >= h * HALF) & (lrow < (h + 1) * HALF)
                     for h in range(k)]

    def band(x, b):
        return x[b * PH:(b + 1) * PH, :]

    def _lroll(x, s):
        """Circular lane roll by s (static)."""
        return jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1)

    def lane_reduce(x, jop):
        """All-lane reduction: every lane ends holding the row reduction."""
        s = 1
        while s < x.shape[1]:
            x = jop(x, _lroll(x, s))
            s *= 2
        return x

    def widen(rows):
        """All-lane (B, 128) histogram-layout rows -> (B, PW) canvas-layout
        rows. Values are lane-constant, so tiling the 128-lane block is a
        pure copy; a concat (not a broadcast) keeps Mosaic off the
        unimplemented both-dims broadcast when a splat() follows."""
        if rows.shape[1] == PW:
            return rows
        return jnp.concatenate([rows] * (PW // rows.shape[1]), axis=1)

    def segreduce(x, jred, jop, ident):
        """Canvas (BPH, PW) -> (B, PW) rows; row f = frame f's reduction,
        broadcast to all lanes. jred: sublane reducer (jnp.sum/min/max with
        axis/keepdims); jop: elementwise combiner; ident: fill value."""
        rows = jnp.concatenate(
            [jred(band(x, b), axis=0, keepdims=True) for b in range(NB)],
            axis=0)                                            # (NB, PW)
        if k == 1:
            return lane_reduce(rows, jop)
        outs = [lane_reduce(jnp.where(half_rows[h], rows, ident), jop)
                for h in range(k)]                             # k x (NB, PW)
        parts = []
        for b in range(NB):
            for h in range(k):
                parts.append(outs[h][b:b + 1, :])
        return jnp.concatenate(parts, axis=0)                  # (B, PW)

    def splat(rows):
        """(B, PW) broadcast rows -> (BPH, PW) canvas: band b's half h takes
        frame (b*k+h)'s value."""
        parts = []
        for b in range(NB):
            comb = rows[b * k:b * k + 1, :]
            for h in range(1, k):
                comb = jnp.where(half_rows[h], rows[b * k + h:b * k + h + 1, :],
                                 comb)
            parts.append(jnp.broadcast_to(comb, (PH, PW)))
        return parts[0] if NB == 1 else jnp.concatenate(parts, axis=0)

    round_map_ref[:] = jnp.full((BPH, PW), -1, jnp.int32)

    # Initial exact histogram comes precomputed from XLA (one dense one-hot
    # reduction outside beats any in-kernel construction); carried per frame
    # as an (8, 128) register tile so corrections are single-vreg ops.
    hist0 = tuple(hist0_ref[f * _SUBLANES:(f + 1) * _SUBLANES, :]
                  for f in range(B))

    seeds0 = jnp.full((B, R_PAD), big, jnp.int32)
    remaining0 = segreduce(planar, jnp.sum, jnp.add, 0.0)      # (B, PW)
    # Masks carried across while_loop iterations must be f32 0/1 planes:
    # Mosaic cannot relayout i1 vectors (or 1-D slices) in loop carries.
    active0 = (remaining0 > 0.0).astype(f32)
    g0 = jnp.zeros((B, PW), jnp.int32)

    def cond(state):
        return jnp.sum(state[2][:, :1]) > 0.0

    def body(state):
        g, remaining, active, hist, bins, unassigned, seeds = state

        # --- 1. per-frame dominant bin, lazily verified (see module doc) ---
        def sel_cond(ss):
            done = ss[1]
            return jnp.sum(1.0 - done[:, :1]) > 0.0

        def sel_body(ss):
            hist, done, mf, peaks = ss
            # Stale peak per frame: sublane max of each tile, lane-rolled.
            # (Histogram tiles are (8, 128); canvas rows are (B, PW) —
            # widen() bridges the two when PW > 128.)
            peak128 = lane_reduce(jnp.concatenate(
                [jnp.max(h, axis=0, keepdims=True) for h in hist], axis=0),
                jnp.maximum)                                   # (B, 128)
            # First-max bin id per frame.
            bin128 = lane_reduce(jnp.concatenate(
                [jnp.min(jnp.where(h == peak128[f:f + 1, :], hbin_iota,
                                   jnp.int32(1 << 20)),
                         axis=0, keepdims=True)
                 for f, h in enumerate(hist)], axis=0), jnp.minimum)
            bin_all = widen(bin128)
            # True live count of the winning bin, for all frames at once.
            memb = (bins == splat(bin_all)).astype(f32)
            cnt_all = segreduce(memb, jnp.sum, jnp.add, 0.0)   # (B, PW)
            ok = cnt_all >= widen(peak128)  # cnt <= peak; == verifies
            cnt128 = (cnt_all[:, :_LANES] if PW > _LANES else cnt_all)
            done128 = (done[:, :_LANES] if PW > _LANES else done)
            nh = tuple(
                jnp.where(done128[f:f + 1, :] > 0, h,
                          jnp.where(hbin_iota == bin128[f:f + 1, :],
                                    cnt128[f:f + 1, :], h))
                for f, h in enumerate(hist))
            undone = done <= 0
            return (nh, jnp.maximum(done, ok.astype(f32)),
                    jnp.where(undone, bin_all, mf),
                    jnp.where(undone, cnt_all, peaks))

        done0 = 1.0 - active
        hist, _, mf, peaks = jax.lax.while_loop(
            sel_cond, sel_body,
            (hist, done0, jnp.zeros((B, PW), jnp.int32),
             jnp.zeros((B, PW), f32)))

        stops = peaks < float(min_candidates)

        # --- 2. seed: min-MSE cell of the dominant bin ---
        mf_splat = splat(mf)
        cand = bins == mf_splat
        smse = jnp.where(cand, mse, jnp.inf)
        m_all = segreduce(smse, jnp.min, jnp.minimum, jnp.inf)
        seed_flat = segreduce(
            jnp.where(smse == splat(m_all), flat_iota, big),
            jnp.min, jnp.minimum, big)                         # (B, PW)
        ok_rows = (active > 0) & jnp.logical_not(stops)
        seed_sel = jnp.where(ok_rows, seed_flat, big)
        seed = (flat_iota == splat(seed_sel)).astype(f32)

        # --- 3. shared flood fill over all frames at once ---
        def hop(a):
            grown = (_shift(a, 1, 0) * eu + _shift(a, -1, 0) * ed
                     + _shift(a, 0, 1) * el + _shift(a, 0, -1) * er)
            return jnp.maximum(a, jnp.minimum(grown, 1.0) * unassigned)

        def flood_cond(fs):
            a, prev = fs
            return jnp.sum(a) > prev

        def flood_body(fs):
            a, _ = fs
            prev = jnp.sum(a)
            for _ in range(8):
                a = hop(a)
            return a, prev

        region, _ = jax.lax.while_loop(flood_cond, flood_body,
                                       (seed * unassigned, -1.0))
        region_f = region

        # --- 4. consume. The histogram stays stale by design EXCEPT the
        # just-consumed dominant bin: its stale count is the likeliest to
        # top the next round's argmax, so decrementing it now (exact count,
        # one canvas pass — the stale >= true invariant is preserved) saves
        # ~1 verify probe per round.
        consumed_mf = segreduce(jnp.where(cand, region_f, 0.0),
                                jnp.sum, jnp.add, 0.0)         # (B, PW)
        cons128 = (consumed_mf[:, :_LANES] if PW > _LANES else consumed_mf)
        mf128 = (mf[:, :_LANES] if PW > _LANES else mf)
        hist = tuple(
            jnp.where(hbin_iota == mf128[ff:ff + 1, :],
                      jnp.maximum(h - cons128[ff:ff + 1, :], 0.0), h)
            for ff, h in enumerate(hist))
        bins = jnp.where(region_f > 0, -1, bins)
        unassigned = unassigned * (1.0 - region)

        # --- 5. bookkeeping + seed recording, all in row planes ---
        size_all = segreduce(region_f, jnp.sum, jnp.add, 0.0)
        rem = remaining - size_all
        g_next = g + active.astype(jnp.int32)
        act_pad = jnp.broadcast_to(active[:, :1], (B, R_PAD)) > 0
        seeds = jnp.where(
            act_pad & (lane_rpad == jnp.broadcast_to(g[:, :1], (B, R_PAD))),
            jnp.broadcast_to(seed_sel[:, :1], (B, R_PAD)), seeds)
        new_active = (active * jnp.where(stops, 0.0, 1.0)
                      * (rem > 0.0).astype(f32)
                      * (g_next < r_max).astype(f32))

        round_map_ref[:] = jnp.where(region_f > 0, splat(g), round_map_ref[:])

        return g_next, rem, new_active, hist, bins, unassigned, seeds

    g_fin, _, _, _, _, _, seeds_fin = jax.lax.while_loop(
        cond, body, (g0, remaining0, active0, hist0, bins0, planar, seeds0))
    seeds_ref[:] = seeds_fin
    for f in range(B):
        nrounds_ref[f, 0] = g_fin[f, 0]


def grow_rounds_pallas_batched(stats: CellStats, config: Config, *,
                               interpret: bool = False):
    """Batched Pallas rounds loop: stats arrays carry a leading frame axis.

    Returns RoundData with leading batch dimension; equivalent to
    jax.vmap(grow_rounds) but ~an order of magnitude cheaper per frame
    (vector ops amortize across the stacked frame bands).
    """
    from deplex_tpu.ops.growing import RoundData, admissibility_edges, region_sums
    from deplex_tpu.ops.histogram import histogram_counts

    B, gh, gw = stats.planar.shape
    K = _pack_factor(B, gw)
    PH, PW = _round_up(gh, _SUBLANES), _round_up(gw, _LANES)
    HALF = PW // K
    NB = B // K
    R_MAX = config.max_region_growing_rounds
    R_PAD = _round_up(R_MAX, _LANES)
    nb = config.histogram_bins_per_coord

    edges = jax.vmap(lambda s: admissibility_edges(s, config))(stats)
    bins = jax.vmap(lambda n, p: normal_bins(n, p, nb))(stats.normal, stats.planar)
    hist0 = jax.vmap(lambda b: jnp.zeros(_SUBLANES * _LANES, jnp.float32)
                     .at[:nb * nb].set(histogram_counts(b, nb).astype(jnp.float32))
                     .reshape(_SUBLANES, _LANES))(bins)

    def stack(x, fill):
        """(B, gh, gw) -> (NB*PH, PW): K frames per sublane band."""
        xp = jnp.pad(x, ((0, 0), (0, PH - gh), (0, HALF - gw)),
                     constant_values=fill)
        if K == 1:
            return xp.reshape(B * PH, PW)
        return xp.reshape(NB, K, PH, HALF).swapaxes(1, 2).reshape(NB * PH, PW)

    f = jnp.float32
    inputs = [
        hist0.reshape(B * _SUBLANES, _LANES),
        stack(stats.planar.astype(f), 0.0),
        stack(bins.astype(jnp.int32), -1),
        stack(stats.mse.astype(f), jnp.inf),
        stack(edges["from_up"].astype(f), 0.0),
        stack(edges["from_down"].astype(f), 0.0),
        stack(edges["from_left"].astype(f), 0.0),
        stack(edges["from_right"].astype(f), 0.0),
    ]

    kernel = functools.partial(
        _kernel_batched, n_frames=B, ph=PH, r_max=R_MAX,
        min_candidates=config.min_region_growing_candidate_size, k=K)

    round_map_p, seeds, nrounds = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NB * PH, PW), jnp.int32),
            jax.ShapeDtypeStruct((B, R_PAD), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(*inputs)

    round_map = (round_map_p.reshape(NB, PH, K, HALF).swapaxes(1, 2)
                 .reshape(B, PH, HALF)[:, :gh, :gw])

    # Kernel seed ids are in padded-canvas coordinates (stride HALF);
    # convert to cropped-grid flat ids for region_sums (out-of-range ->
    # sentinel gh*gw, which matches no cell).
    sf = seeds[:, :R_MAX]
    sr, sc = sf // HALF, sf % HALF
    valid = (sr < gh) & (sc < gw)
    seed_ids = jnp.where(valid, sr * gw + sc, gh * gw).astype(jnp.int32)

    sums = jax.vmap(lambda rm, si, s: region_sums(rm, si, s, R_MAX))(
        round_map, seed_ids, stats)

    return RoundData(round_map=round_map, sums=sums, nr_rounds=nrounds[:, 0])


def grow_rounds_pallas(stats: CellStats, config: Config, *,
                       interpret: bool = False):
    """Pallas counterpart of growing.grow_rounds; same RoundData contract.

    Thin B=1 wrap of the batched kernel (identical code path, so the
    single-frame and batched results are bit-equal by construction).
    """
    rd = grow_rounds_pallas_batched(
        jax.tree.map(lambda a: jnp.asarray(a)[None], stats), config,
        interpret=interpret)
    return jax.tree.map(lambda a: a[0], rd)
