"""Fused Pallas TPU kernel: raw uint16 depth -> per-cell moments.

Stage-1 speed-of-light path. The XLA pipeline materializes the back-projected
point cloud (H*W*3 f32, 6x the depth map) and re-reads it for every block
reduction; this kernel instead keeps one frame's depth in VMEM and emits only
the tiny (gh, gw) per-cell moment planes (CellMoments), fusing:

  * pinhole back-projection  x=(u-cx)z/fx, y=(v-cy)z/fy
    (reference depth_image.cpp:55-78) — x/y exist only in VMEM;
  * per-cell block sums (valid count, coord sums) — lowered to segment-matrix
    matmuls on the MXU ((gh,Hc) @ (Hc,W) @ (W,gw) one-hot contractions),
    which beat strided VPU reshape-reductions by an order of magnitude;
  * centered second moments (cell_segment_stat.cpp:29-56 semantics): cell
    means are broadcast back to pixels with the transposed segment matrices,
    so the scatter matrix is the well-conditioned centered form, matching
    ops/cellstats.py bit-for-all-but-reduction-order;
  * the mid-row / mid-column depth-continuity walks (cell_segment.cpp:62-97):
    the strided in-cell slices become one deinterleave matmul + a P-step
    carried-prev scan over (gh, gw) planes;
  * first/last-pixel cell diameter for the merge tolerance.

The eigensolve + threshold gates run afterwards in XLA on the (gh, gw)
planes (cellstats.finalize_cell_stats — shared with the XLA path).

Supported: even patch sizes, W divisible by 128, grid rows divisible by 8
(TUM 640x480@P10 -> 48x64, ICL @P4 -> 120x160, and the 1280x720 stress
config all qualify); anything else falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deplex_tpu.config import Config
from deplex_tpu.ops.cellstats import (CellMoments, CellStats,
                                      finalize_cell_stats, moments_band_plan)

_LANES = 128
_SUBLANES = 8


def pallas_cellstats_supported(image_height: int, image_width: int,
                               config: Config) -> bool:
    P = min(config.patch_size, min(image_height, image_width))
    if P < 2 or P % 2 != 0:
        return False
    gh, gw = image_height // P, image_width // P
    Wc = gw * P
    if Wc % _LANES != 0:
        return False
    # A (possibly row-padded) band plan with an in-VMEM f32 working set
    # must exist; gh_pad % 8 == 0 implies sublane alignment of Hc_pad too
    # (P is even). 720p@P8 (gh=90) pads to 96 — cellstats.moments_band_plan.
    if moments_band_plan(gh, P, Wc) is None:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_cellstats_auto(image_height: int, image_width: int,
                          config: Config) -> bool:
    """Auto-mode policy (use_pallas_cellstats=None): fused kernel whenever
    supported. Small patches (ICL's P=4) are included since the first-pixel
    anchoring of the centered moments (see _kernel): λ_min of a noiseless
    cell is pure f32 rounding noise, and anchoring shrinks it ~100x, which
    stabilized seed tie-breaks and recovered ICL F1 to the XLA path's 0.972
    (from 0.953 unanchored — BASELINE.md history). The XLA path computes
    the identical banded MXU reduction (cellstats._moments_matmul), so both
    backends agree bit-for-bit where the kernel is supported."""
    if config.use_pallas_cellstats is False:
        return False
    return pallas_cellstats_supported(image_height, image_width, config)


def _kernel(kparams_ref, depth_ref,
            cnt_ref, dh_ref, dv_ref, sx_ref, sy_ref, sz_ref,
            sxx_ref, sxy_ref, sxz_ref, syy_ref, syz_ref, szz_ref, diam_ref,
            *, P: int, gh: int, gw: int, thr: float):
    """One program = one row-band of one frame ((gh, ...) here are the
    BAND's cell rows; the frame is tiled by the second grid axis so the f32
    working set stays well under VMEM)."""
    f32 = jnp.float32
    Hc, W = depth_ref.shape[1], depth_ref.shape[2]
    fx, fy, cx, cy = (kparams_ref[0, 0], kparams_ref[0, 1],
                      kparams_ref[0, 2], kparams_ref[0, 3])
    n = f32(P * P)
    row0 = pl.program_id(1) * Hc      # first image row of this band

    zin = depth_ref[0]
    if zin.dtype in (jnp.uint16, jnp.int16):
        # Mosaic has no 16-bit int -> f32 cast; widen to i32 first.
        zin = zin.astype(jnp.int32)
    z = zin.astype(f32)                                   # (Hc, W)
    ucoef = (jax.lax.broadcasted_iota(jnp.int32, (1, W), 1).astype(f32)
             - cx) / fx
    vcoef = ((jax.lax.broadcasted_iota(jnp.int32, (Hc, 1), 0)
              + row0).astype(f32) - cy) / fy
    x = z * ucoef
    y = z * vcoef

    def seg(rows, cols, offset, stride):
        """One-hot selector M[i, j] = (j == i * stride + offset)."""
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return (j == i * stride + offset).astype(f32)

    def block(rows, cols, transpose=False):
        """Segment-sum matrix: M[i, j] = (j // P == i), or (i // P == j)
        when transposed (the pixel axis is then the row axis)."""
        i = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        j = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return ((i // P == j) if transpose else (j // P == i)).astype(f32)

    dot = functools.partial(jax.lax.dot, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=f32)

    Sv = block(gh, Hc)            # (gh, Hc): sum rows per cell-row
    Sh = block(W, gw, transpose=True)   # (W, gw): sum cols per cell-col

    def bsum(a):                  # (Hc, W) -> (gh, gw)
        return dot(dot(Sv, a), Sh)

    cnt_ref[0] = bsum((z > 0).astype(f32))
    sx = bsum(x)
    sy = bsum(y)
    sz = bsum(z)
    sx_ref[0], sy_ref[0], sz_ref[0] = sx, sy, sz

    # Mean broadcast back to pixels (exact centered scatter, matching the
    # XLA path's conditioning).
    SvT = block(Hc, gh, transpose=True)   # (Hc, gh)
    ShT = block(gw, W)                    # (gw, W)

    def bc(m):                    # (gh, gw) -> (Hc, W)
        return dot(dot(SvT, m), ShT)

    # First-pixel anchors (exact: zf is a one-hot extraction; zf*uf equals
    # x at the cell's first pixel bitwise). Anchoring before centering makes
    # every summand cell-local-small: the scatter is translation-invariant
    # in exact arithmetic, and λ_min's f32 rounding noise drops ~100x — the
    # seed-stability fix for small patches (cellstats._moments_matmul is the
    # bit-identical XLA mirror).
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (1, gw), 1).astype(f32)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (gh, 1), 0).astype(f32)
    uf = (iota_j * P - cx) / fx
    vf = (iota_i * P + row0.astype(f32) - cy) / fy
    zf = dot(dot(seg(gh, Hc, 0, P), z), _colsel(W, gw, 0, P))
    xs = x - bc(zf * uf)
    ys = y - bc(zf * vf)
    zs = z - bc(zf)
    sxs, sys_, szs = bsum(xs), bsum(ys), bsum(zs)
    # Mean-centering folded algebraically (round 5, mirrored bit-for-bit
    # in cellstats._moments_matmul): bsum((xs-mx)(ys-my)) =
    # bsum(xs*ys) - sxs*sys/n — drops the second centering pass and its
    # 3 per-cell mean broadcasts (each a 2-matmul MXU op here).
    sxx_ref[0] = bsum(xs * xs) - sxs * (sxs / n)
    sxy_ref[0] = bsum(xs * ys) - sxs * (sys_ / n)
    sxz_ref[0] = bsum(xs * zs) - sxs * (szs / n)
    syy_ref[0] = bsum(ys * ys) - sys_ * (sys_ / n)
    syz_ref[0] = bsum(ys * zs) - sys_ * (szs / n)
    szz_ref[0] = bsum(zs * zs) - szs * (szs / n)

    # --- depth continuity walks (carried-prev scans, cell_segment.cpp:62-97)
    def walk(steps):
        prev = steps[0]
        disc = jnp.zeros((gh, gw), f32)
        for curr in steps:
            pos = curr > 0
            cont = pos & (jnp.abs(curr - prev) < thr)
            prev = jnp.where(cont, curr, prev)
            disc = disc + (pos & ~cont).astype(f32)
        return disc

    # Mid-row walk: linear in-cell indices [P*P//2, P*P//2 + P) = row P//2,
    # cols 0..P-1 (P even). One row-extract dot, one deinterleave dot, then
    # P static lane-group slices.
    rm = (P * P // 2) // P
    zrow = dot(seg(gh, Hc, rm, P), z)               # (gh, W)
    jc = jax.lax.broadcasted_iota(jnp.int32, (W, P * gw), 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (W, P * gw), 1)
    C = ((kc // gw) + (kc % gw) * P == jc).astype(f32)   # col j*P+t -> slot t*gw+j
    zsteps = dot(zrow, C)                           # (gh, P*gw)
    dh_ref[0] = walk([zsteps[:, t * gw:(t + 1) * gw] for t in range(P)])

    # Mid-column walk: in-cell col P//2, rows 0..P-1. One col-extract dot,
    # one row-deinterleave dot, then P static sublane-group slices.
    cm = P // 2
    zcol = dot(z, _colsel(W, gw, cm, P))            # (Hc, gw)
    ir = jax.lax.broadcasted_iota(jnp.int32, (P * gh, Hc), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (P * gh, Hc), 1)
    R = (jr == (ir % gh) * P + ir // gh).astype(f32)     # slot t*gh+i <- row i*P+t
    zvsteps = dot(R, zcol)                          # (P*gh, gw)
    dv_ref[0] = walk([zvsteps[t * gh:(t + 1) * gh, :] for t in range(P)])

    # --- cell diameter: first (0,0) vs last (P-1,P-1) pixel of each cell ---
    # (zf/uf/vf already extracted above for the anchors.)
    zl = dot(dot(seg(gh, Hc, P - 1, P), z), _colsel(W, gw, P - 1, P))
    ul = (iota_j * P + (P - 1) - cx) / fx
    # Global first pixel row of cell row i in this band = i*P + row0.
    vl = (iota_i * P + row0.astype(f32) + (P - 1) - cy) / fy
    dxp = zf * uf - zl * ul
    dyp = zf * vf - zl * vl
    dzp = zf - zl
    diam_ref[0] = jnp.sqrt(dxp * dxp + dyp * dyp + dzp * dzp)


def _colsel(W, gw, offset, stride):
    """One-hot column selector M[c, j] = (c == j * stride + offset)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (W, gw), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (W, gw), 1)
    return (c == j * stride + offset).astype(jnp.float32)


def cell_moments_pallas(depth: jax.Array, intrinsics: jax.Array,
                        config: Config, *, interpret: bool = False
                        ) -> CellMoments:
    """(B, H, W) uint16/float depth + (3,3) K -> batched CellMoments.

    One Pallas program per frame; the depth map is the only HBM read.
    """
    B, H, W = depth.shape
    P = min(config.patch_size, min(H, W))
    gh, gw = H // P, W // P
    Hc, Wc = gh * P, gw * P
    d = depth[:, :Hc, :Wc]

    K = intrinsics.astype(jnp.float32)
    kparams = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]])[None, :]

    # Split each frame into S row-bands so the per-program f32 working set
    # (~6 planes of the band) stays well inside VMEM; S must divide the
    # (possibly padded) cell-row count so cells never straddle bands
    # (shared plan with the XLA mirror — bit-equality requirement). Grids
    # with no aligned split are padded with zero rows and cropped after.
    plan = moments_band_plan(gh, P, Wc)
    if plan is None:
        raise ValueError(f"no VMEM band plan for grid {gh}x{gw} (P={P})")
    gh_pad, S = plan
    if gh_pad != gh:
        d = jnp.pad(d, ((0, 0), (0, (gh_pad - gh) * P), (0, 0)))
    ghs, hcs = gh_pad // S, gh_pad * P // S

    kernel = functools.partial(
        _kernel, P=P, gh=ghs, gw=gw,
        thr=float(config.depth_discontinuity_threshold))

    plane = jax.ShapeDtypeStruct((B, gh_pad, gw), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(B, S),
        out_shape=(plane,) * 13,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hcs, Wc), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, ghs, gw), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM) for _ in range(13)),
        interpret=interpret,
    )(kparams, d)
    (cnt, dh, dv, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, diam) = (
        o[:, :gh] for o in outs)

    coord_sum = jnp.stack([sx, sy, sz], axis=-1)
    scatter = jnp.stack([
        jnp.stack([sxx, sxy, sxz], -1),
        jnp.stack([sxy, syy, syz], -1),
        jnp.stack([sxz, syz, szz], -1),
    ], -2)
    return CellMoments(nr_valid=cnt, disc_h=dh, disc_v=dv,
                       coord_sum=coord_sum, scatter=scatter, diam=diam)


def cell_stats_from_depth_pallas(depth: jax.Array, intrinsics: jax.Array,
                                 config: Config, *, interpret: bool = False
                                 ) -> CellStats:
    """Batched CellStats straight from raw depth (fused kernel + shared
    XLA finalization). Equivalent to
    vmap(compute_cell_stats(backproject_device(d, K))) up to f32
    reduction order."""
    B, H, W = depth.shape
    P = min(config.patch_size, min(H, W))
    m = cell_moments_pallas(depth, intrinsics, config, interpret=interpret)
    return jax.vmap(lambda mm: finalize_cell_stats(mm, P, config))(m)
