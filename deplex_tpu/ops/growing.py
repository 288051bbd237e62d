"""Stage 3 — region growing as data-parallel label propagation.

The reference implements this as a serial loop of BFS flood fills with a
mutable histogram (plane_extractor.cpp:297-392). The key observation that
makes a TPU recast exact (not an approximation): the grown region of a seed
equals directed reachability from the seed over "admissibility" edges
    b -> c  admissible  iff  n_b . n_c >= min_cos
                        and (n_b . mu_c + d_b)^2 <= tol_c
restricted to unassigned planar cells — BFS order does not change this set,
because a cell that fails the test from one popped neighbor is re-tested by
every other popped neighbor (plane_extractor.cpp:372-387).

So each round:
  1. argmax over the histogram of live cells        (scatter-add + argmax)
  2. seed = min-MSE cell of the dominant bin        (masked argmin)
  3. flood = iterated 4-neighbor mask propagation   (lax.while_loop stencil)
  4. consume region, fit merged plane via Chan-combined scatter, accept/reject

The admissibility edge masks are precomputed ONCE per frame (they depend only
on per-cell stats), so one flood iteration is four shifted boolean ANDs.

Plane slots are fixed at config.max_planes for static shapes; the reference
has no cap (observed plane counts: TUM 34, ICL 45; default cap 64).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deplex_tpu.config import Config
from deplex_tpu.ops.cellstats import CellStats
from deplex_tpu.ops.eigh3x3 import eigh3x3_min
from deplex_tpu.ops.histogram import histogram_counts, normal_bins


class PlaneSegments(NamedTuple):
    """Fixed-capacity (max_planes) plane-segment slots, index 0 = plane 1."""

    nr_planes: jax.Array     # () int32 — number of occupied slots
    n: jax.Array             # (MAXP,) f32 — point counts
    coord_sum: jax.Array     # (MAXP, 3)
    scatter: jax.Array       # (MAXP, 3, 3) centered second moments
    normal: jax.Array        # (MAXP, 3)
    mean: jax.Array          # (MAXP, 3)
    d: jax.Array             # (MAXP,)
    mse: jax.Array           # (MAXP,)
    score: jax.Array         # (MAXP,)


def _fit_plane(scatter, coord_sum, n):
    """fitPlane (cell_segment_stat.cpp:55-80) on (possibly batched) stats."""
    w, v = eigh3x3_min(scatter)
    mean = coord_sum / n[..., None]
    d_raw = -jnp.sum(mean * v, axis=-1)
    normal = jnp.where((d_raw > 0)[..., None], v, -v)
    d = jnp.abs(d_raw)
    mse = w[..., 0] / n
    wsum = jnp.sum(w, axis=-1)
    score = jnp.where(wsum != 0, w[..., 2] / wsum, 0.0)
    return normal, mean, d, mse, score


def admissibility_edges(stats: CellStats, config: Config):
    """Directed edge masks b->c for the four in-neighbor directions.

    Returns dict with keys 'from_up', 'from_down', 'from_left', 'from_right';
    mask[r, c] == True iff the neighbor of (r, c) in that direction may
    activate (r, c). Shapes (gh, gw); border entries are False.
    """
    n_c = stats.normal
    mu_c = stats.mean
    tol_c = stats.tol
    min_cos = jnp.float32(config.min_cos_angle_merge)

    def pred(nb_normal, nb_d):
        cos = jnp.sum(nb_normal * n_c, axis=-1)
        dist = (jnp.sum(nb_normal * mu_c, axis=-1) + nb_d) ** 2
        return (cos >= min_cos) & (dist <= tol_c)

    def shift(x, dr, dc):
        """x shifted so result[r,c] = x[r-dr, c-dc], zero/False padded."""
        return jnp.roll(x, (dr, dc), axis=(0, 1))

    gh, gw = tol_c.shape
    row = jnp.arange(gh)[:, None]
    col = jnp.arange(gw)[None, :]

    edges = {}
    for name, (dr, dc) in (("from_up", (1, 0)), ("from_down", (-1, 0)),
                           ("from_left", (0, 1)), ("from_right", (0, -1))):
        nb_normal = shift(n_c, dr, dc)
        nb_d = shift(stats.d, dr, dc)
        ok = pred(nb_normal, nb_d)
        # Invalidate wrapped borders.
        if dr == 1:
            ok = ok & (row >= 1)
        elif dr == -1:
            ok = ok & (row < gh - 1)
        if dc == 1:
            ok = ok & (col >= 1)
        elif dc == -1:
            ok = ok & (col < gw - 1)
        edges[name] = ok
    return edges


def flood_fill(seed_mask: jax.Array, allowed: jax.Array, edges, hops_per_step: int = 8):
    """Directed reachability from seed_mask within `allowed` cells.

    One while-loop iteration performs `hops_per_step` propagation hops to
    amortize loop overhead; terminates at fixpoint.
    """

    def one_hop(active):
        up = jnp.roll(active, 1, axis=0) & edges["from_up"]
        down = jnp.roll(active, -1, axis=0) & edges["from_down"]
        left = jnp.roll(active, 1, axis=1) & edges["from_left"]
        right = jnp.roll(active, -1, axis=1) & edges["from_right"]
        return active | (allowed & (up | down | left | right))

    def cond(state):
        active, prev_count = state
        return jnp.sum(active) > prev_count

    def body(state):
        active, _ = state
        prev_count = jnp.sum(active)
        for _ in range(hops_per_step):
            active = one_hop(active)
        return active, prev_count

    active, _ = jax.lax.while_loop(cond, body, (seed_mask, jnp.int32(-1)))
    return active


def grow_planes(stats: CellStats, config: Config):
    """Full region-growing loop. Returns (labels_map (gh,gw) int32, segments).

    labels_map value k > 0 means plane slot k-1 in the returned PlaneSegments.
    """
    gh, gw = stats.planar.shape
    MAXP = config.max_planes
    nbins = config.histogram_bins_per_coord
    edges = admissibility_edges(stats, config)
    bins0 = normal_bins(stats.normal, stats.planar, nbins)

    cell_flat = jnp.arange(gh * gw).reshape(gh, gw)

    segments0 = PlaneSegments(
        nr_planes=jnp.int32(0),
        n=jnp.zeros(MAXP, jnp.float32),
        coord_sum=jnp.zeros((MAXP, 3), jnp.float32),
        scatter=jnp.zeros((MAXP, 3, 3), jnp.float32),
        normal=jnp.zeros((MAXP, 3), jnp.float32),
        mean=jnp.zeros((MAXP, 3), jnp.float32),
        d=jnp.zeros(MAXP, jnp.float32),
        mse=jnp.zeros(MAXP, jnp.float32),
        score=jnp.zeros(MAXP, jnp.float32),
    )

    class LoopState(NamedTuple):
        bins: jax.Array          # (gh, gw) int32, -1 = consumed/non-planar
        unassigned: jax.Array    # (gh, gw) bool
        labels_map: jax.Array    # (gh, gw) int32
        segments: PlaneSegments
        remaining: jax.Array     # () int32
        stop: jax.Array          # () bool
        rounds: jax.Array        # () int32

    state0 = LoopState(
        bins=bins0,
        unassigned=stats.planar,
        labels_map=jnp.zeros((gh, gw), jnp.int32),
        segments=segments0,
        remaining=jnp.sum(stats.planar).astype(jnp.int32),
        stop=jnp.bool_(False),
        rounds=jnp.int32(0),
    )

    def cond(s: LoopState):
        return (s.remaining > 0) & (~s.stop) & (s.rounds < config.max_region_growing_rounds)

    def body(s: LoopState):
        # 1. Dominant bin of live cells (first-max tie-break = argmax).
        hist = histogram_counts(s.bins, nbins)
        mf_bin = jnp.argmax(hist)
        candidates = s.bins == mf_bin
        stop = hist[mf_bin] < config.min_region_growing_candidate_size

        # 2. Seed: min cell MSE among candidates (first-min tie-break).
        seed_mse = jnp.where(candidates, stats.mse, jnp.inf)
        seed_id = jnp.argmin(seed_mse.reshape(-1))
        seed_mask = cell_flat == seed_id.reshape(())

        # 3. Grow.
        region = flood_fill(seed_mask & s.unassigned, s.unassigned, edges)
        region = region & ~stop  # a stopped round consumes nothing
        size = jnp.sum(region).astype(jnp.int32)

        # 4. Consume.
        bins = jnp.where(region, -1, s.bins)
        unassigned = s.unassigned & ~region
        remaining = s.remaining - size

        # 5. Merged plane fit. The reference seeds the accumulator with a COPY
        # of the seed cell and then adds every region cell including the seed,
        # so the seed is counted twice (plane_extractor.cpp:318-323).
        wgt = region.astype(jnp.float32) + (seed_mask & region).astype(jnp.float32)
        n_tot = jnp.sum(wgt) * stats.nr_pts
        sum_tot = jnp.einsum("gh,ghi->i", wgt, stats.coord_sum)
        mu = sum_tot / jnp.maximum(n_tot, 1.0)
        dmu = stats.mean - mu  # (gh, gw, 3)
        # Chan combine about the global mean: no catastrophic cancellation.
        sc_tot = (jnp.einsum("gh,ghij->ij", wgt, stats.scatter)
                  + stats.nr_pts * jnp.einsum("gh,ghi,ghj->ij", wgt, dmu, dmu))
        normal, mean, d, mse, score = _fit_plane(sc_tot, sum_tot, jnp.maximum(n_tot, 1.0))

        big_enough = size >= config.min_region_growing_cells_activated
        has_slot = s.segments.nr_planes < MAXP
        accept = big_enough & (score > config.min_region_planarity_score) & has_slot & ~stop

        slot = s.segments.nr_planes
        new_id = slot + 1
        labels_map = jnp.where(region & accept, new_id, s.labels_map)

        def set_slot(arr, val):
            return jnp.where(accept, arr.at[slot].set(val), arr)

        segments = PlaneSegments(
            nr_planes=s.segments.nr_planes + accept.astype(jnp.int32),
            n=set_slot(s.segments.n, n_tot),
            coord_sum=set_slot(s.segments.coord_sum, sum_tot),
            scatter=set_slot(s.segments.scatter, sc_tot),
            normal=set_slot(s.segments.normal, normal),
            mean=set_slot(s.segments.mean, mean),
            d=set_slot(s.segments.d, d),
            mse=set_slot(s.segments.mse, mse),
            score=set_slot(s.segments.score, score),
        )
        return LoopState(bins=bins, unassigned=unassigned, labels_map=labels_map,
                         segments=segments, remaining=remaining, stop=stop,
                         rounds=s.rounds + 1)

    final = jax.lax.while_loop(cond, body, state0)
    return final.labels_map, final.segments
