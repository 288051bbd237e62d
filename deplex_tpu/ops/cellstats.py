"""Stage 1 — batched cell-grid statistics (planarity estimation).

TPU-native equivalent of the reference's per-cell serial loop
(cell_grid.cpp:36-43 + cell_segment.cpp:21-110 + cell_segment_stat.cpp:29-81):
instead of constructing a CellSegment object per cell, every gate and the PCA
plane fit are computed for ALL cells of the frame simultaneously as dense
(gh, gw)-shaped tensor ops, and the per-cell dsyevh3 calls become one batched
closed-form eigensolve.

Semantics notes (kept bit-faithful to the reference):
  * Cell statistics count ALL patch pixels, including invalid (z == 0) points
    which back-project to (0,0,0) (cell_segment_stat.cpp:29-35 uses every row).
  * The valid-point gate is  count(z>0) >= (P*P*3) // min_pts_per_cell
    because MatrixX3f::size() is rows*cols (cell_segment.cpp:24).
  * Depth continuity walks LINEAR in-cell indices [P*P//2, P*P//2+P) and
    [P//2 :: P], carrying `prev` only across continuous valid pixels
    (cell_segment.cpp:62-97).
  * The covariance is the scatter matrix  X'X - s s'/n  (not divided by n);
    MSE = lambda_min/n, score = lambda_max/sum(lambda)
    (cell_segment_stat.cpp:56-80). We compute the scatter in centered form
    (exactly equal in exact arithmetic, far better conditioned in f32).
  * Merge tolerance = clamp(diam * sin(angle), 20, max_merge_dist)^2 with the
    20.0 lower bound hardcoded as in the reference (cell_segment.cpp:33,104-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deplex_tpu.config import Config
from deplex_tpu.ops.eigh3x3 import eigh3x3_min


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


def compute_cell_stats(points: jax.Array, image_height: int, image_width: int,
                       config: Config) -> CellStats:
    """points: (H*W, 3) organized cloud -> per-cell statistics.

    All arithmetic in float32 on device; fully parallel over cells.
    """
    H, W = image_height, image_width
    P = min(config.patch_size, min(H, W))
    gh, gw = H // P, W // P

    pts = jnp.asarray(points).reshape(H, W, 3)[: gh * P, : gw * P, :].astype(jnp.float32)
    # (gh, gw, P*P, 3) with row-major in-cell ordering (cell_grid.cpp:69-83).
    cells = pts.reshape(gh, P, gw, P, 3).transpose(0, 2, 1, 3, 4).reshape(gh, gw, P * P, 3)
    z = cells[..., 2]                                   # (gh, gw, P*P)

    # --- validity gate ---
    valid_thr = (P * P * 3) // config.min_pts_per_cell
    nr_valid = jnp.sum(z > 0, axis=-1)
    has_valid = nr_valid >= valid_thr

    # --- depth continuity (carried-prev scans) ---
    thr = jnp.float32(config.depth_discontinuity_threshold)
    max_disc = config.max_number_depth_discontinuity

    def scan_discontinuities(idx):
        """Count depth jumps along the given linear in-cell indices."""
        zi = z[..., idx]                                # (gh, gw, P)

        def body(carry, i):
            prev, disc = carry
            curr = zi[..., i]
            pos = curr > 0
            cont = pos & (jnp.abs(curr - prev) < thr)
            prev = jnp.where(cont, curr, prev)
            disc = disc + (pos & ~cont)
            return (prev, disc), None

        init = (zi[..., 0], jnp.zeros((gh, gw), dtype=jnp.int32))
        (_, disc), _ = jax.lax.scan(body, init, jnp.arange(P))
        return disc

    mid = P * P // 2
    disc_h = scan_discontinuities(mid + jnp.arange(P))
    disc_v = scan_discontinuities(P // 2 + jnp.arange(P) * P)
    continuous = (disc_h < max_disc) & (disc_v < max_disc)

    # --- PCA plane fit over ALL P*P points (zeros included) ---
    n = jnp.float32(P * P)
    coord_sum = jnp.sum(cells, axis=2)                  # (gh, gw, 3)
    mean = coord_sum / n
    centered = cells - mean[:, :, None, :]
    scatter = jnp.einsum("ghpi,ghpj->ghij", centered, centered)

    w, v = eigh3x3_min(scatter)                         # (gh,gw,3), (gh,gw,3)
    d_raw = -jnp.sum(mean * v, axis=-1)
    flip = d_raw > 0
    normal = jnp.where(flip[..., None], v, -v)
    d = jnp.abs(d_raw)
    mse = w[..., 0] / n
    wsum = jnp.sum(w, axis=-1)
    score = jnp.where(wsum != 0, w[..., 2] / wsum, 0.0)
    del score  # per-cell score is unused by the pipeline (only region-level)

    # --- planarity: depth-adaptive MSE threshold (cell_segment.cpp:99-102) ---
    sigma = config.depth_sigma_coeff * mean[..., 2] ** 2 + config.depth_sigma_margin
    small_error = mse <= sigma * sigma
    planar = has_valid & continuous & small_error

    # --- merge tolerance ---
    import math
    sin_angle = math.sqrt(max(0.0, 1.0 - min(config.min_cos_angle_merge, 1.0) ** 2))
    diam = jnp.linalg.norm(cells[:, :, 0, :] - cells[:, :, -1, :], axis=-1)
    tol = jnp.clip(diam * sin_angle, 20.0, config.max_merge_dist) ** 2

    # Non-planar cells keep +inf MSE so they never win seed selection
    # (CellSegmentStat default, cell_segment_stat.cpp:27).
    mse = jnp.where(planar, mse, jnp.float32(jnp.finfo(jnp.float32).max))

    return CellStats(planar=planar, normal=normal, mean=mean, d=d, mse=mse,
                     tol=tol, nr_pts=n, coord_sum=coord_sum, scatter=scatter)
