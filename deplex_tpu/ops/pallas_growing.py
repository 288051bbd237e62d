"""Pallas TPU kernel for the region-growing rounds loop.

The XLA while_loop in ops/growing.py is latency-bound: ~40 sequential
rounds x ~150 small HLO ops each, every op paying fixed dispatch overhead.
This kernel runs the ENTIRE loop on-core: the cell grid lives in VMEM
(padded to (8,128)-aligned tiles) and every round is a handful of VPU
vector ops, so the stage drops from milliseconds to microseconds.

Same output contract as growing.grow_rounds (RoundData) — the batched
fits/gates/labels post-pass (growing.finalize_rounds) is shared.

Algorithmic notes:
  * The mutable normals histogram is kept as a (8,128) f32 register tile
    (bins <= 1024), maintained LAZILY: consuming a region never updates
    it (a per-bin decrement is a scatter, and regions can span ~70
    distinct bins — low-polar normals quantize into wildly varying
    azimuth bins — so an eager distinct-bin extraction loop measured as
    the kernel's largest cost). Instead counts are only corrected at
    selection time: argmax the stale tile, recount the winning bin
    against the live `bins` canvas (one comparison + reduction), write
    the true count back, and repeat until the argmax verifies. Since
    consumption only ever lowers true counts, stale >= true is an
    invariant, so a verified peak dominates every other bin's true count
    and the selected bin (with first-max tie-break on the corrected
    tile) is exactly the one an eagerly-maintained histogram would give.
    Each failing probe strictly lowers one stale count, so the loop
    terminates; in practice it verifies in ~1 probe per round because a
    stale bin is only ever probed once its stale count tops the running
    maximum.
  * Flood fill is 4-neighbor mask propagation with zero-padded shifts
    (slice+concat, which Mosaic lowers to lane/sublane shifts), 8 hops per
    fixpoint check, exactly like the XLA path.
  * Seed double-counting (reference plane_extractor.cpp:318-323) is
    reproduced by weighting the seed cell 2x in the region sums.

VMEM budget: ~17 f32 planes of (PH, PW) + (R_MAX, 128) output; supported()
gates grids whose padded planes fit comfortably.
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


def _pad_to(x, ph, pw, fill):
    gh, gw = x.shape[:2]
    return jnp.pad(x, ((0, ph - gh), (0, pw - gw)) + ((0, 0),) * (x.ndim - 2),
                   constant_values=fill)


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
    vmem = (22 * (n_frames // k) * ph * pw * 4
            + n_frames * config.max_region_growing_rounds * _LANES * 4)
    if vmem > 10 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_supported(grid_shape, config: Config) -> bool:
    """True if the kernel's VMEM plan fits this grid (and we're on TPU)."""
    gh, gw = grid_shape
    ph, pw = _round_up(gh, _SUBLANES), _round_up(gw, _LANES)
    nbins2 = config.histogram_bins_per_coord ** 2
    if nbins2 > _SUBLANES * _LANES:
        return False
    # ~20 f32 planes of state + inputs, plus outputs; keep well under 16MB.
    vmem = 22 * ph * pw * 4 + config.max_region_growing_rounds * _LANES * 4
    if vmem > 8 * 1024 * 1024:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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


def _kernel(nr_pts_ref, hist0_ref, planar_ref, bins_ref, mse_ref, eu_ref,
            ed_ref, el_ref, er_ref, csx_ref, csy_ref, csz_ref, mx_ref, my_ref,
            mz_ref, sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref,
            round_map_ref, sums_ref, nrounds_ref, *,
            r_max: int, min_candidates: int, hist_rows: int):
    PH, PW = planar_ref.shape
    f32 = jnp.float32
    nr_pts = nr_pts_ref[0, 0]

    planar = planar_ref[:]
    bins = bins_ref[:]
    mse = mse_ref[:]
    eu, ed, el, er = eu_ref[:], ed_ref[:], el_ref[:], er_ref[:]

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 0)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 1)
    flat_iota = row_iota * PW + col_iota
    big = jnp.int32(PH * PW + 1)

    hrow_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)
    hcol_iota = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    hbin_iota = hrow_iota * _LANES + hcol_iota

    # Initial histogram comes precomputed from XLA (one dense one-hot
    # reduction outside beats a serial distinct-bin loop in here).
    hist = hist0_ref[:]

    round_map_ref[:] = jnp.full((PH, PW), -1, jnp.int32)
    sums_ref[:] = jnp.zeros_like(sums_ref)
    remaining0 = jnp.sum(planar)

    def cond(state):
        r, remaining, stop, _, _, _ = state
        return (remaining > 0.0) & jnp.logical_not(stop) & (r < r_max)

    def body(state):
        r, remaining, _, hist, bins, unassigned = state

        # --- 1. dominant bin (first-max tie-break) ---
        peak = jnp.max(hist)
        mf_bin = jnp.min(jnp.where(hist == peak, hbin_iota, jnp.int32(1 << 20)))
        stop = peak < float(min_candidates)

        # --- 2. seed: min-MSE cell of the dominant bin ---
        candidates = (bins == mf_bin)
        seed_mse = jnp.where(candidates, mse, jnp.inf)
        m = jnp.min(seed_mse)
        seed_flat = jnp.min(jnp.where(seed_mse == m, flat_iota, big))
        seed = (flat_iota == seed_flat).astype(f32)

        # --- 3. flood fill (directed reachability) ---
        def hop(active):
            grown = (_shift(active, 1, 0) * eu + _shift(active, -1, 0) * ed
                     + _shift(active, 0, 1) * el + _shift(active, 0, -1) * er)
            return jnp.maximum(active, jnp.minimum(grown, 1.0) * unassigned)

        def flood_cond(fs):
            active, prev = fs
            return jnp.sum(active) > prev

        def flood_body(fs):
            active, _ = fs
            prev = jnp.sum(active)
            for _ in range(8):
                active = hop(active)
            return active, prev

        region0 = seed * unassigned
        region, _ = jax.lax.while_loop(flood_cond, flood_body, (region0, -1.0))
        region = jnp.where(stop, jnp.zeros_like(region), region)
        size = jnp.sum(region)

        # --- 4. consume: histogram decrement via distinct-bin extraction ---
        def dec_cond(ds):
            _, rem = ds
            return jnp.sum(rem) > 0.0

        def dec_body(ds):
            hist, rem = ds
            sel = jnp.min(jnp.where(rem > 0, flat_iota, big))
            b = jnp.sum(jnp.where(flat_iota == sel, bins, 0))
            members = (bins == b) & (rem > 0)
            cnt = jnp.sum(members.astype(f32))
            hist = hist - jnp.where(hbin_iota == b, cnt, 0.0)
            rem = jnp.where(members, 0.0, rem)
            return hist, rem

        hist, _ = jax.lax.while_loop(dec_cond, dec_body, (hist, region))
        bins = jnp.where(region > 0, -1, bins)
        unassigned = unassigned * (1.0 - region)
        remaining = remaining - size

        # --- 5. region sums (seed counted twice, Chan-combined scatter) ---
        wgt = region + seed * region
        n_tot = jnp.sum(wgt) * nr_pts
        n_safe = jnp.maximum(n_tot, 1.0)
        sx = jnp.sum(wgt * csx_ref[:])
        sy = jnp.sum(wgt * csy_ref[:])
        sz = jnp.sum(wgt * csz_ref[:])
        mux, muy, muz = sx / n_safe, sy / n_safe, sz / n_safe
        dx = mx_ref[:] - mux
        dy = my_ref[:] - muy
        dz = mz_ref[:] - muz
        xx = jnp.sum(wgt * (sxx_ref[:] + nr_pts * dx * dx))
        xy = jnp.sum(wgt * (sxy_ref[:] + nr_pts * dx * dy))
        xz = jnp.sum(wgt * (sxz_ref[:] + nr_pts * dx * dz))
        yy = jnp.sum(wgt * (syy_ref[:] + nr_pts * dy * dy))
        yz = jnp.sum(wgt * (syz_ref[:] + nr_pts * dy * dz))
        zz = jnp.sum(wgt * (szz_ref[:] + nr_pts * dz * dz))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        vals = [n_tot, sx, sy, sz, xx, xy, xz, yy, yz, zz, size]
        row = jnp.zeros((1, _LANES), f32)
        for i, v in enumerate(vals):
            row = row + jnp.where(lane == i, v, 0.0)
        sums_ref[pl.ds(r, 1), :] = row

        # --- 6. labels ---
        round_map_ref[:] = jnp.where(region > 0, r, round_map_ref[:])

        return r + 1, remaining, stop, hist, bins, unassigned

    r_fin, *_ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), remaining0, jnp.bool_(False), hist, bins, planar))
    nrounds_ref[0, 0] = r_fin


def _kernel_batched(nr_pts_ref, hist0_ref, planar_ref, bins_ref, mse_ref,
                    eu_ref, ed_ref, el_ref, er_ref, csx_ref, csy_ref, csz_ref,
                    mx_ref, my_ref, mz_ref, sxx_ref, sxy_ref, sxz_ref,
                    syy_ref, syz_ref, szz_ref,
                    round_map_ref, sums_ref, nrounds_ref, *,
                    n_frames: int, ph: int, r_max: int, min_candidates: int,
                    k: int):
    """Batched rounds loop: frames stacked along sublanes AND lanes.

    Each sublane band of `ph` rows holds `k` frames side by side along the
    lane axis (k = _pack_factor; 2 for VGA-at-patch-10 grids whose 64-cell
    width would otherwise waste half of every 128-lane vector op). Flood
    fill / consumption / bins updates run once on the stacked canvas, while
    tiny per-frame scalar steps (argmax bin, seed argmin, row writes)
    unroll over static band slices + lane-half masks. Shifts cannot leak
    across frames: border edge masks are False in both directions.
    """
    B, PH = n_frames, ph
    NB = B // k
    BPH, PW = planar_ref.shape
    HALF = PW // k
    f32 = jnp.float32
    nr_pts = nr_pts_ref[0, 0]

    planar = planar_ref[:]
    bins = bins_ref[:]
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
    # Stacked-histogram versions: bin index within each frame's 8-row band.
    hrow_full = jax.lax.broadcasted_iota(jnp.int32, (B * _SUBLANES, _LANES), 0)
    hcol_full = jax.lax.broadcasted_iota(jnp.int32, (B * _SUBLANES, _LANES), 1)
    hbin_full = (hrow_full % _SUBLANES) * _LANES + hcol_full
    hband_masks = [(hrow_full >= f * _SUBLANES) & (hrow_full < (f + 1) * _SUBLANES)
                   for f in range(B)]

    # Per-band lane-half masks ((PH, PW); None when the band is one frame).
    bcol = jax.lax.broadcasted_iota(jnp.int32, (PH, PW), 1)
    if k == 1:
        half_masks = [None]
    else:
        half_masks = [(bcol >= h * HALF) & (bcol < (h + 1) * HALF)
                      for h in range(k)]

    def mwhere(h, x, fill):
        return x if half_masks[h] is None else jnp.where(half_masks[h], x, fill)

    def hsel(vals):
        """Per-band (PH, PW) plane holding vals[h] on lane-half h."""
        if k == 1:
            return jnp.broadcast_to(vals[0], (PH, PW))
        out = jnp.where(half_masks[0], vals[0], vals[1])
        for h in range(2, k):
            out = jnp.where(half_masks[h], vals[h], out)
        return out

    round_map_ref[:] = jnp.full((BPH, PW), -1, jnp.int32)
    sums_ref[:] = jnp.zeros_like(sums_ref)

    def band(x, b):
        return x[b * PH:(b + 1) * PH, :]

    def assemble(parts):
        """NB per-band (PH, PW) planes -> (BPH, PW) canvas."""
        return parts[0] if NB == 1 else jnp.concatenate(parts, axis=0)

    hist = hist0_ref[:]                      # (B*8, 128)

    remaining0 = tuple(
        jnp.sum(mwhere(f % k, band(planar, f // k), 0.0)) for f in range(B))
    active0 = tuple(r > 0.0 for r in remaining0)
    r0 = tuple(jnp.int32(0) for _ in range(B))

    def cond(state):
        _, _, active, _, _, _ = state
        alive = active[0]
        for f in range(1, B):
            alive = alive | active[f]
        return alive

    def body(state):
        g, remaining, active, hist, bins, unassigned = state

        # --- per-frame: dominant bin + seed (band slices + half masks) ---
        seeds = []
        stops = []
        for f in range(B):
            b, hf = divmod(f, k)
            h = hist[f * _SUBLANES:(f + 1) * _SUBLANES, :]
            peak = jnp.max(h)
            mf_bin = jnp.min(jnp.where(h == peak, hbin_iota, jnp.int32(1 << 20)))
            stop_f = peak < float(min_candidates)
            cand_f = band(bins, b) == mf_bin
            if half_masks[hf] is not None:
                cand_f = cand_f & half_masks[hf]
            smse = jnp.where(cand_f, band(mse, b), jnp.inf)
            m = jnp.min(smse)
            seed_flat = jnp.min(jnp.where(smse == m, band(flat_iota, b), big))
            ok = active[f] & jnp.logical_not(stop_f)
            seeds.append(jnp.where(ok, seed_flat, big))
            stops.append(stop_f)

        # Seed plane: per-band assembly of the broadcast seed ids.
        seed_bc = assemble([hsel(seeds[b * k:(b + 1) * k]) for b in range(NB)])
        seed = (flat_iota == seed_bc).astype(f32)

        # --- shared flood fill over all frames at once ---
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

        # --- shared consumption: histogram decrement, distinct bins ---
        def dec_cond(ds):
            _, rem = ds
            return jnp.sum(rem) > 0.0

        def dec_body(ds):
            hist, rem = ds
            sels = []
            for f in range(B):
                b, hf = divmod(f, k)
                rpos = band(rem, b) > 0
                if half_masks[hf] is not None:
                    rpos = rpos & half_masks[hf]
                sels.append(jnp.min(jnp.where(rpos, band(flat_iota, b), big)))
            sel_bc = assemble([hsel(sels[b * k:(b + 1) * k])
                               for b in range(NB)])
            is_sel = (flat_iota == sel_bc) & (rem > 0)
            hist_delta = jnp.zeros_like(hist)
            bsel = []
            for f in range(B):
                b, hf = divmod(f, k)
                sel_f = band(is_sel, b)
                if half_masks[hf] is not None:
                    sel_f = sel_f & half_masks[hf]
                b_f = jnp.sum(jnp.where(sel_f, band(bins, b), 0))
                memb_f = band(bins, b) == b_f
                if half_masks[hf] is not None:
                    memb_f = memb_f & half_masks[hf]
                cnt = jnp.sum(memb_f & (band(rem, b) > 0))
                hist_delta = hist_delta + jnp.where(
                    hband_masks[f] & (hbin_full == b_f), cnt.astype(f32), 0.0)
                bsel.append(memb_f)
            members = assemble([
                bsel[b * k] if k == 1 else
                functools.reduce(jnp.logical_or, bsel[b * k:(b + 1) * k])
                for b in range(NB)])
            hist = hist - hist_delta
            rem = jnp.where(members & (rem > 0), 0.0, rem)
            return hist, rem

        hist, _ = jax.lax.while_loop(dec_cond, dec_body, (hist, region))
        bins = jnp.where(region > 0, -1, bins)
        unassigned = unassigned * (1.0 - region)

        # --- per-frame sums + row writes ---
        wgt = region + seed * region
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
        new_remaining = []
        new_active = []
        new_g = []
        for b in range(NB):
            w_b = band(wgt, b)
            reg_b = band(region, b)
            csx_b, csy_b, csz_b = band(csx_ref[:], b), band(csy_ref[:], b), \
                band(csz_ref[:], b)
            # Per-half masked weights; first moments per frame.
            firsts = []
            for hf in range(k):
                w_f = mwhere(hf, w_b, 0.0)
                size_f = jnp.sum(mwhere(hf, reg_b, 0.0))
                n_tot = jnp.sum(w_f) * nr_pts
                n_safe = jnp.maximum(n_tot, 1.0)
                sx = jnp.sum(w_f * csx_b)
                sy = jnp.sum(w_f * csy_b)
                sz = jnp.sum(w_f * csz_b)
                firsts.append((w_f, size_f, n_tot,
                               sx, sy, sz, sx / n_safe, sy / n_safe, sz / n_safe))
            # Shared second-moment terms: mean broadcast over halves, Chan
            # combination computed once per band for all packed frames.
            dx = band(mx_ref[:], b) - hsel([fr[6] for fr in firsts])
            dy = band(my_ref[:], b) - hsel([fr[7] for fr in firsts])
            dz = band(mz_ref[:], b) - hsel([fr[8] for fr in firsts])
            xxt = band(sxx_ref[:], b) + nr_pts * dx * dx
            xyt = band(sxy_ref[:], b) + nr_pts * dx * dy
            xzt = band(sxz_ref[:], b) + nr_pts * dx * dz
            yyt = band(syy_ref[:], b) + nr_pts * dy * dy
            yzt = band(syz_ref[:], b) + nr_pts * dy * dz
            zzt = band(szz_ref[:], b) + nr_pts * dz * dz
            for hf in range(k):
                f = b * k + hf
                w_f, size_f, n_tot, sx, sy, sz, _, _, _ = firsts[hf]
                xx = jnp.sum(w_f * xxt)
                xy = jnp.sum(w_f * xyt)
                xz = jnp.sum(w_f * xzt)
                yy = jnp.sum(w_f * yyt)
                yz = jnp.sum(w_f * yzt)
                zz = jnp.sum(w_f * zzt)
                vals = [n_tot, sx, sy, sz, xx, xy, xz, yy, yz, zz, size_f]
                row = jnp.zeros((1, _LANES), f32)
                for i, v in enumerate(vals):
                    row = row + jnp.where(lane == i, v, 0.0)
                row = jnp.where(active[f], row, jnp.zeros_like(row))
                idx = f * r_max + jnp.minimum(g[f], r_max - 1)
                sums_ref[pl.ds(idx, 1), :] = jnp.where(
                    active[f], row, sums_ref[pl.ds(idx, 1), :])
                rem_f = remaining[f] - size_f
                g_next = g[f] + active[f].astype(jnp.int32)
                new_remaining.append(rem_f)
                new_active.append(active[f] & jnp.logical_not(stops[f])
                                  & (rem_f > 0.0) & (g_next < r_max))
                new_g.append(g_next)

        round_bc = assemble([hsel([g[b * k + h] for h in range(k)])
                             for b in range(NB)])
        round_map_ref[:] = jnp.where(region > 0, round_bc, round_map_ref[:])

        return (tuple(new_g), tuple(new_remaining), tuple(new_active),
                hist, bins, unassigned)

    g_fin, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (r0, remaining0, active0, hist, bins, planar))
    for f in range(B):
        nrounds_ref[f, 0] = g_fin[f]


def grow_rounds_pallas_batched(stats: CellStats, config: Config, *,
                               interpret: bool = False):
    """Batched Pallas rounds loop: stats arrays carry a leading frame axis.

    Returns RoundData with leading batch dimension; equivalent to
    jax.vmap(grow_rounds) but ~an order of magnitude cheaper per frame
    (vector ops amortize across the stacked frame bands).
    """
    from deplex_tpu.ops.growing import RoundData, admissibility_edges
    from deplex_tpu.ops.histogram import histogram_counts

    B, gh, gw = stats.planar.shape
    K = _pack_factor(B, gw)
    PH, PW = _round_up(gh, _SUBLANES), _round_up(gw, _LANES)
    HALF = PW // K
    NB = B // K
    R_MAX = config.max_region_growing_rounds
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
        # nr_pts is P*P, identical across the batch.
        jnp.reshape(jnp.reshape(stats.nr_pts, (-1,))[0], (1, 1)).astype(f),
        hist0.reshape(B * _SUBLANES, _LANES),
        stack(stats.planar.astype(f), 0.0),
        stack(bins.astype(jnp.int32), -1),
        stack(stats.mse.astype(f), jnp.inf),
        stack(edges["from_up"].astype(f), 0.0),
        stack(edges["from_down"].astype(f), 0.0),
        stack(edges["from_left"].astype(f), 0.0),
        stack(edges["from_right"].astype(f), 0.0),
        stack(stats.coord_sum[..., 0].astype(f), 0.0),
        stack(stats.coord_sum[..., 1].astype(f), 0.0),
        stack(stats.coord_sum[..., 2].astype(f), 0.0),
        stack(stats.mean[..., 0].astype(f), 0.0),
        stack(stats.mean[..., 1].astype(f), 0.0),
        stack(stats.mean[..., 2].astype(f), 0.0),
        stack(stats.scatter[..., 0, 0].astype(f), 0.0),
        stack(stats.scatter[..., 0, 1].astype(f), 0.0),
        stack(stats.scatter[..., 0, 2].astype(f), 0.0),
        stack(stats.scatter[..., 1, 1].astype(f), 0.0),
        stack(stats.scatter[..., 1, 2].astype(f), 0.0),
        stack(stats.scatter[..., 2, 2].astype(f), 0.0),
    ]

    kernel = functools.partial(
        _kernel_batched, n_frames=B, ph=PH, r_max=R_MAX,
        min_candidates=config.min_region_growing_candidate_size, k=K)

    round_map_p, sums, nrounds = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NB * PH, PW), jnp.int32),
            jax.ShapeDtypeStruct((B * R_MAX, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(inputs) - 1)),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(*inputs)

    return RoundData(
        round_map=round_map_p.reshape(NB, PH, K, HALF).swapaxes(1, 2)
        .reshape(B, PH, HALF)[:, :gh, :gw],
        sums=sums.reshape(B, R_MAX, _LANES)[:, :, :16],
        nr_rounds=nrounds[:, 0],
    )


def grow_rounds_pallas(stats: CellStats, config: Config, *,
                       interpret: bool = False):
    """Pallas counterpart of growing.grow_rounds; same RoundData contract."""
    from deplex_tpu.ops.growing import RoundData, admissibility_edges

    gh, gw = stats.planar.shape
    PH, PW = _round_up(gh, _SUBLANES), _round_up(gw, _LANES)
    R_MAX = config.max_region_growing_rounds

    edges = admissibility_edges(stats, config)
    bins = normal_bins(stats.normal, stats.planar, config.histogram_bins_per_coord)

    from deplex_tpu.ops.histogram import histogram_counts

    nb2 = config.histogram_bins_per_coord ** 2
    hist0 = jnp.zeros(_SUBLANES * _LANES, jnp.float32).at[:nb2].set(
        histogram_counts(bins, config.histogram_bins_per_coord).astype(jnp.float32)
    ).reshape(_SUBLANES, _LANES)

    f = jnp.float32
    inputs = [
        jnp.reshape(stats.nr_pts, (1, 1)).astype(f),
        hist0,
        _pad_to(stats.planar.astype(f), PH, PW, 0.0),
        _pad_to(bins.astype(jnp.int32), PH, PW, -1),
        _pad_to(stats.mse.astype(f), PH, PW, jnp.inf),
        _pad_to(edges["from_up"].astype(f), PH, PW, 0.0),
        _pad_to(edges["from_down"].astype(f), PH, PW, 0.0),
        _pad_to(edges["from_left"].astype(f), PH, PW, 0.0),
        _pad_to(edges["from_right"].astype(f), PH, PW, 0.0),
        _pad_to(stats.coord_sum[..., 0].astype(f), PH, PW, 0.0),
        _pad_to(stats.coord_sum[..., 1].astype(f), PH, PW, 0.0),
        _pad_to(stats.coord_sum[..., 2].astype(f), PH, PW, 0.0),
        _pad_to(stats.mean[..., 0].astype(f), PH, PW, 0.0),
        _pad_to(stats.mean[..., 1].astype(f), PH, PW, 0.0),
        _pad_to(stats.mean[..., 2].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 0, 0].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 0, 1].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 0, 2].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 1, 1].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 1, 2].astype(f), PH, PW, 0.0),
        _pad_to(stats.scatter[..., 2, 2].astype(f), PH, PW, 0.0),
    ]

    kernel = functools.partial(
        _kernel, r_max=R_MAX,
        min_candidates=config.min_region_growing_candidate_size,
        hist_rows=_SUBLANES)

    round_map_p, sums, nrounds = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((PH, PW), jnp.int32),
            jax.ShapeDtypeStruct((R_MAX, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(inputs) - 1)),
        # hist0 and the rest are VMEM; only nr_pts is an SMEM scalar.
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=interpret,
    )(*inputs)

    # sums rows are (128,) lanes; RoundData wants (R_MAX, 16).
    return RoundData(round_map=round_map_p[:gh, :gw],
                     sums=sums[:, :16],
                     nr_rounds=nrounds[0, 0])
