"""Stage 1 — batched cell-grid statistics (planarity estimation).

TPU-native equivalent of the reference's per-cell serial loop
(cell_grid.cpp:36-43 + cell_segment.cpp:21-110 + cell_segment_stat.cpp:29-81):
instead of constructing a CellSegment object per cell, every gate and the PCA
plane fit are computed for ALL cells of the frame simultaneously as dense
(gh, gw)-shaped tensor ops, and the per-cell dsyevh3 calls become one batched
closed-form eigensolve.

Layout note: all per-cell reductions use the free reshape
(H, W) -> (gh, P, gw, P) (row-major compatible — a view, not a copy) and
reduce over the in-cell axes; the cell-contiguous transpose the reference
materializes (cell_grid.cpp:69-83, and an earlier version of this file)
never exists on device. In-cell pixel walks (depth continuity, cell
diameter) become strided image slices.

Semantics notes (kept bit-faithful to the reference):
  * Cell statistics count ALL patch pixels, including invalid (z == 0) points
    which back-project to (0,0,0) (cell_segment_stat.cpp:29-35 uses every row).
  * The valid-point gate is  count(z>0) >= (P*P*3) // min_pts_per_cell
    because MatrixX3f::size() is rows*cols (cell_segment.cpp:24).
  * Depth continuity walks LINEAR in-cell indices [P*P//2, P*P//2+P) and
    [P//2 :: P], carrying `prev` only across continuous valid pixels
    (cell_segment.cpp:62-97). For odd P the mid-row walk wraps into the next
    in-cell row exactly like the reference's flat indexing.
  * The covariance is the scatter matrix  X'X - s s'/n  (not divided by n);
    MSE = lambda_min/n, score = lambda_max/sum(lambda)
    (cell_segment_stat.cpp:56-80). We compute the scatter in centered form
    (exactly equal in exact arithmetic, far better conditioned in f32).
  * Merge tolerance = clamp(diam * sin(angle), 20, max_merge_dist)^2 with the
    20.0 lower bound hardcoded as in the reference (cell_segment.cpp:33,104-110).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from deplex_tpu.config import Config
from deplex_tpu.ops.eigh3x3 import eigh3x3_min


def matmul_band_split(gh: int, cell_height: int, cell_width: int) -> int | None:
    """Row-band count S for the MXU segment-matmul moment reduction, or None.

    Shared between the fused Pallas kernel (ops/pallas_cellstats.py) and the
    XLA mirror below so both tile identically — a requirement for their
    bit-equality. S must divide gh (cells never straddle bands), keep the
    band's cell rows sublane-aligned, and keep a ~6-plane f32 working set of
    one band inside VMEM.
    """
    for s in range(1, gh + 1):
        if gh % s == 0 and (gh // s) % 8 == 0 and \
                6 * (cell_height // s) * cell_width * 4 <= 6 * 1024 * 1024:
            return s
    return None


def moments_band_plan(gh: int, patch: int, cell_width: int):
    """(gh_pad, S) for the anchored MXU moment reduction, or None.

    Grids whose row count has no sublane-aligned band split (720p@P8:
    gh=90 — no divisor s leaves (90/s) % 8 == 0) are PADDED with zero cell
    rows up to the nearest gh_pad that splits; padded rows hold z=0 pixels,
    produce all-zero moments, and are cropped before the gates, so the
    real cells' arithmetic is unchanged. Both the Pallas kernel and the
    XLA mirror use this same plan (bit-equality requirement)."""
    for gh_pad in range(gh, gh + 65):
        S = matmul_band_split(gh_pad, gh_pad * patch, cell_width)
        if S is not None:
            return gh_pad, S
    return None


class CellStats(NamedTuple):
    """Per-cell quantities, all shaped (gh, gw, ...)."""

    planar: jax.Array        # (gh, gw) bool
    normal: jax.Array        # (gh, gw, 3) unit normal, oriented so d >= 0
    mean: jax.Array          # (gh, gw, 3) mean over all P*P points
    d: jax.Array             # (gh, gw) plane offset, >= 0
    mse: jax.Array           # (gh, gw) lambda_min / n
    tol: jax.Array           # (gh, gw) squared merge tolerance
    nr_pts: jax.Array        # () scalar: points per cell (P*P)
    coord_sum: jax.Array     # (gh, gw, 3) sum of points
    scatter: jax.Array       # (gh, gw, 3, 3) centered second-moment matrix


class CellMoments(NamedTuple):
    """Raw per-cell moments, the backend-independent intermediate between
    the pixel-level reduction (XLA block sums here, or the fused Pallas
    depth kernel in ops/pallas_cellstats.py) and the shared gate/eigensolve
    finalization. All shaped (gh, gw, ...)."""

    nr_valid: jax.Array      # (gh, gw) count of z > 0 points
    disc_h: jax.Array        # (gh, gw) mid-row depth discontinuities
    disc_v: jax.Array        # (gh, gw) mid-column depth discontinuities
    coord_sum: jax.Array     # (gh, gw, 3) sum of points (zeros included)
    scatter: jax.Array       # (gh, gw, 3, 3) centered second moments
    diam: jax.Array          # (gh, gw) first-to-last pixel distance


def finalize_cell_stats(m: CellMoments, P: int, config: Config) -> CellStats:
    """Shared tail: PCA eigensolve + all validity gates on (gh, gw) planes.

    Mirrors cell_segment.cpp:57-110 + cell_segment_stat.cpp:55-81 exactly
    (see the module docstring for the bit-faithfulness notes).
    """
    n = jnp.float32(P * P)
    valid_thr = (P * P * 3) // config.min_pts_per_cell
    has_valid = m.nr_valid >= valid_thr
    max_disc = config.max_number_depth_discontinuity
    continuous = (m.disc_h < max_disc) & (m.disc_v < max_disc)

    mean = m.coord_sum / n
    w, v = eigh3x3_min(m.scatter)
    d_raw = -jnp.sum(mean * v, axis=-1)
    flip = d_raw > 0
    normal = jnp.where(flip[..., None], v, -v)
    d = jnp.abs(d_raw)
    mse = w[..., 0] / n

    sigma = config.depth_sigma_coeff * mean[..., 2] ** 2 + config.depth_sigma_margin
    small_error = mse <= sigma * sigma
    planar = has_valid & continuous & small_error

    import math
    sin_angle = math.sqrt(max(0.0, 1.0 - min(config.min_cos_angle_merge, 1.0) ** 2))
    tol = jnp.clip(m.diam * sin_angle, 20.0, config.max_merge_dist) ** 2

    # Non-planar cells keep +inf MSE so they never win seed selection
    # (CellSegmentStat default, cell_segment_stat.cpp:27).
    mse = jnp.where(planar, mse, jnp.float32(jnp.finfo(jnp.float32).max))

    return CellStats(planar=planar, normal=normal, mean=mean, d=d, mse=mse,
                     tol=tol, nr_pts=n, coord_sum=m.coord_sum, scatter=m.scatter)


def compute_cell_stats(points: jax.Array, image_height: int, image_width: int,
                       config: Config) -> CellStats:
    """points: (H*W, 3) organized cloud -> per-cell statistics.

    All arithmetic in float32 on device; fully parallel over cells.
    """
    H, W = image_height, image_width
    P = min(config.patch_size, min(H, W))
    gh, gw = H // P, W // P

    pts = jnp.asarray(points).reshape(H, W, 3)[: gh * P, : gw * P, :].astype(jnp.float32)
    x_img, y_img, z_img = pts[..., 0], pts[..., 1], pts[..., 2]

    def blocks(a):
        """(gh*P, gw*P) -> per-cell sum (gh, gw); reshape is a free view."""
        return jnp.sum(a.reshape(gh, P, gw, P), axis=(1, 3))

    n = jnp.float32(P * P)

    # --- validity gate ---
    valid_thr = (P * P * 3) // config.min_pts_per_cell
    nr_valid = blocks((z_img > 0).astype(jnp.float32))
    has_valid = nr_valid >= valid_thr

    # --- depth continuity (carried-prev scans over strided slices) ---
    thr = jnp.float32(config.depth_discontinuity_threshold)
    max_disc = config.max_number_depth_discontinuity
    mid = P * P // 2

    def scan_discontinuities(in_cell_indices):
        """Walk the given linear in-cell indices; count depth jumps."""

        def cell_slice(i):
            r, c = i // P, i % P
            return z_img[r::P, c::P]                     # (gh, gw)

        def body(carry, i):
            prev, disc = carry
            curr = cell_slice(i)
            pos = curr > 0
            cont = pos & (jnp.abs(curr - prev) < thr)
            prev = jnp.where(cont, curr, prev)
            disc = disc + (pos & ~cont)
            return (prev, disc), None

        init = (cell_slice(in_cell_indices[0]),
                jnp.zeros((gh, gw), dtype=jnp.int32))
        carry = init
        for i in in_cell_indices:
            carry, _ = body(carry, i)
        return carry[1]

    disc_h = scan_discontinuities([mid + t for t in range(P)])
    disc_v = scan_discontinuities([P // 2 + t * P for t in range(P)])
    continuous = (disc_h < max_disc) & (disc_v < max_disc)

    # --- PCA plane fit over ALL P*P points (zeros included) ---
    plan = moments_band_plan(gh, P, gw * P)
    if plan is not None:
        # MXU segment-matmul moments with first-pixel anchoring — the same
        # tiling/order as the fused Pallas kernel (bit-equal to it), and
        # ~100x less λ_min rounding noise than the plain centered sums.
        gh_pad, S = plan
        if gh_pad != gh:
            pad = ((0, (gh_pad - gh) * P), (0, 0))
            xi, yi, zi = (jnp.pad(a, pad) for a in (x_img, y_img, z_img))
        else:
            xi, yi, zi = x_img, y_img, z_img
        coord_sum, scatter = _moments_matmul(xi, yi, zi, P, gh_pad, gw, S)
        coord_sum, scatter = coord_sum[:gh], scatter[:gh]
    else:
        # Small/odd grids (tiny frames): plain block reductions.
        sx, sy, sz = blocks(x_img), blocks(y_img), blocks(z_img)
        coord_sum = jnp.stack([sx, sy, sz], axis=-1)    # (gh, gw, 3)
        mean_ = coord_sum / n

        def bc(m):
            """Broadcast per-cell scalar over its pixels: (gh,gw)->(ghP,gwP)."""
            return jnp.broadcast_to(m[:, None, :, None], (gh, P, gw, P)).reshape(
                gh * P, gw * P)

        cx_, cy_, cz_ = (x_img - bc(mean_[..., 0]), y_img - bc(mean_[..., 1]),
                         z_img - bc(mean_[..., 2]))
        sxx, sxy, sxz = blocks(cx_ * cx_), blocks(cx_ * cy_), blocks(cx_ * cz_)
        syy, syz, szz = blocks(cy_ * cy_), blocks(cy_ * cz_), blocks(cz_ * cz_)
        scatter = jnp.stack([
            jnp.stack([sxx, sxy, sxz], -1),
            jnp.stack([sxy, syy, syz], -1),
            jnp.stack([sxz, syz, szz], -1),
        ], -2)                                          # (gh, gw, 3, 3)

    # --- merge tolerance (cell diameter = first vs last pixel) ---
    first = pts[::P, ::P, :]
    last = pts[P - 1::P, P - 1::P, :]
    dd = first - last
    diam = jnp.sqrt(dd[..., 0] * dd[..., 0] + dd[..., 1] * dd[..., 1]
                    + dd[..., 2] * dd[..., 2])

    moments = CellMoments(nr_valid=nr_valid, disc_h=disc_h, disc_v=disc_v,
                          coord_sum=coord_sum, scatter=scatter, diam=diam)
    return finalize_cell_stats(moments, P, config)


def _moments_matmul(x_img, y_img, z_img, P: int, gh: int, gw: int, S: int):
    """Per-cell (coord_sum, scatter) via MXU segment matmuls, bit-compatible
    with the fused Pallas kernel (ops/pallas_cellstats.py:_kernel): the jnp
    dots lower to the same MXU contractions Mosaic emits, over the same
    row-band tiling (equality asserted in tests/test_pallas_cellstats.py).

    Each cell's coordinates are anchored to its first pixel before the
    centered second moments: the scatter matrix is translation-invariant in
    exact arithmetic, and summing cell-local-small values instead of
    absolute coordinates shrinks the f32 rounding noise in λ_min (and the
    fitted normal) by ~2 orders of magnitude. On noiseless data (ICL-NUIM)
    λ_min is pure rounding noise, so this is what stabilizes seed selection
    — the P=4 conformance fix (BASELINE.md)."""
    Hc, Wc = gh * P, gw * P
    ghs, hcs = gh // S, Hc // S
    n = jnp.float32(P * P)
    dot = functools.partial(jax.lax.dot, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)

    def block(rows, cols, transpose=False):
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return ((i // P == j) if transpose else (j // P == i)).astype(jnp.float32)

    Sv = block(ghs, hcs)                  # (ghs, hcs): sum rows per cell-row
    Sh = block(Wc, gw, transpose=True)    # (Wc, gw): sum cols per cell-col

    def per_band(xb, yb, zb, axb, ayb, azb):
        def bsum(a):                      # (hcs, Wc) -> (ghs, gw)
            return dot(dot(Sv, a), Sh)

        def bc(m):                        # exact per-cell broadcast
            return jnp.broadcast_to(m[:, None, :, None],
                                    (ghs, P, gw, P)).reshape(hcs, Wc)

        sx, sy, sz = bsum(xb), bsum(yb), bsum(zb)
        xs, ys, zs = xb - bc(axb), yb - bc(ayb), zb - bc(azb)
        sxs, sys_, szs = bsum(xs), bsum(ys), bsum(zs)
        # Mean-centering folded algebraically (round 5):
        # bsum((xs-mx)(ys-my)) = bsum(xs*ys) - sxs*sys/n for per-cell
        # means mx = sxs/n — the second centering pass and its 3 per-cell
        # mean broadcasts disappear. Conditioning: the subtrahend is
        # O(mean^2/extent^2) ~ 4x the result, costing ~2 of the ~7 bits
        # of margin first-pixel anchoring buys (BASELINE.md history);
        # validated by the same TUM/ICL conformance gates as the r2 fix.
        return (sx, sy, sz,
                bsum(xs * xs) - sxs * (sxs / n),
                bsum(xs * ys) - sxs * (sys_ / n),
                bsum(xs * zs) - sxs * (szs / n),
                bsum(ys * ys) - sys_ * (sys_ / n),
                bsum(ys * zs) - sys_ * (szs / n),
                bsum(zs * zs) - szs * (szs / n))

    ax, ay, az = x_img[::P, ::P], y_img[::P, ::P], z_img[::P, ::P]  # (gh, gw)
    outs = jax.lax.map(
        lambda t: per_band(*t),
        (x_img.reshape(S, hcs, Wc), y_img.reshape(S, hcs, Wc),
         z_img.reshape(S, hcs, Wc),
         ax.reshape(S, ghs, gw), ay.reshape(S, ghs, gw), az.reshape(S, ghs, gw)))
    sx, sy, sz, sxx, sxy, sxz, syy, syz, szz = [o.reshape(gh, gw) for o in outs]
    coord_sum = jnp.stack([sx, sy, sz], -1)
    scatter = jnp.stack([
        jnp.stack([sxx, sxy, sxz], -1),
        jnp.stack([sxy, syy, syz], -1),
        jnp.stack([sxz, syz, szz], -1),
    ], -2)
    return coord_sum, scatter
