"""Pallas TPU kernel for the greedy plane-merge loop (stage 4).

The XLA merge loop (ops/merge.py:merge_planes_from_adjacency) is exact but
latency-bound: ~40 sequential rows x ~150 tiny HLO ops each (a 3x3
eigensolve refit per row), measured at ~118us/frame on a v5e at B=8. This
kernel runs the whole loop on-core with frames stacked along sublanes and
plane slots along lanes, so each row costs ~20 lane-reductions over one
(SB, 128) register tile for the ENTIRE batch: ~4us/frame.

Semantics mirror merge_planes_from_adjacency row for row (reference
behavior: plane_extractor.cpp:394-423 — row representative's stats refit
after each row, candidate columns always carry pre-merge stats). The only
arithmetic deviation is atan2 inside the Cardano eigensolve: Mosaic has no
atan primitive, so a 2-stage range-reduced odd polynomial is used
(max abs error 2.8e-7 vs f64 atan2 — below f32 roundoff of the surrounding
trig). Conformance is pinned by tests/test_pallas_merge.py: identical
labels on both golden frames and on random synthetic batches.

Layout:
  * state planes (SB, 128) f32/int32 — SB = B rounded up to 8 sublanes,
    plane slots 0..MAXP-1 along lanes (MAXP <= 128);
  * adjacency (MAXP*SB, 128) f32 — row r's slab is rows [r*SB, (r+1)*SB).
VMEM: 18 state planes * SB*128*4 B + MAXP*SB*512 B ~= 0.3 MB at B=8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deplex_tpu.config import Config
from deplex_tpu.ops.growing import PlaneSegments

_LANES = 128
_SUBLANES = 8

# atan(u) minimax-LSQ odd polynomial on |u| <= tan(pi/8) (fit in f64 on
# Chebyshev nodes; max abs error 2.8e-7 over the full atan2 domain).
_ATAN_C1 = -0.33332726795436973
_ATAN_C2 = 0.19971035468599072
_ATAN_C3 = -0.13817101338649124
_ATAN_C4 = 0.07882404517177104
_TAN_PI_8 = 0.41421356237309503


def _round_up(n, m):
    return (n + m - 1) // m * m


def _atan2_pos(y, x):
    """atan2(y, x) for y >= 0, elementwise, Mosaic-lowerable.

    Range-reduce twice (t>1 -> 1/t; z>tan(pi/8) -> (z-1)/(z+1)) then a
    degree-9 odd polynomial. Edge cases: (0, x>=0) -> 0, (y>0, 0) -> pi/2,
    (0, x<0) -> pi — matching numpy.
    """
    f32 = jnp.float32
    ax = jnp.abs(x)
    t = y / jnp.where(ax > 0, ax, f32(1))
    inv = t > 1.0
    z = jnp.where(inv, 1.0 / jnp.where(t > 0, t, f32(1)), t)
    hi = z > f32(_TAN_PI_8)
    u = jnp.where(hi, (z - 1.0) / (z + 1.0), z)
    u2 = u * u
    a = u * (1.0 + u2 * (f32(_ATAN_C1) + u2 * (f32(_ATAN_C2) + u2 * (
        f32(_ATAN_C3) + u2 * f32(_ATAN_C4)))))
    a = jnp.where(hi, f32(0.7853981633974483) + a, a)
    a = jnp.where(inv, f32(1.5707963267948966) - a, a)
    a = jnp.where(x < 0, f32(3.141592653589793) - a, a)
    a = jnp.where((x == 0) & (y > 0), f32(1.5707963267948966), a)
    return jnp.where((y == 0) & (x >= 0), f32(0.0), a)


def _fit_normal_d(xx, xy, xz, yy, yz, zz, sx, sy, sz, n):
    """Smallest-eigenvector plane fit on packed 3x3 scatter components.

    Elementwise mirror of eigh3x3.eigh3x3_min + growing._fit_plane (same
    Cardano formulation as dsyevc3.c:31-80, same best-conditioned
    cross-product eigenvector, same d>0 orientation), for (SB, L) tiles.
    Returns (nx, ny, nz, d).
    """
    f32 = jnp.float32
    scale = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(xx), jnp.abs(yy)), jnp.abs(zz)),
        jnp.maximum(jnp.maximum(jnp.abs(xy), jnp.abs(yz)), jnp.abs(xz)))
    scale = jnp.where(scale > 0, scale, f32(1))
    a = xx / scale
    b = yy / scale
    c = zz / scale
    d_ = xy / scale
    e = yz / scale
    f = xz / scale

    de = d_ * e
    dd = d_ * d_
    ee = e * e
    ff = f * f
    m = a + b + c
    c1 = (a * b + a * c + b * c) - (dd + ee + ff)
    c0 = c * dd + a * ee + b * ff - a * b * c - 2.0 * f * de
    p = m * m - 3.0 * c1
    q = m * (p - 1.5 * c1) - 13.5 * c0
    sqrt_p = jnp.sqrt(jnp.abs(p))
    phi = 27.0 * (0.25 * c1 * c1 * (p - c1) + c0 * (q + 6.75 * c0))
    phi = (1.0 / 3.0) * _atan2_pos(jnp.sqrt(jnp.abs(phi)), q)
    cphi = sqrt_p * jnp.cos(phi)
    sphi = f32(1.0 / 1.7320508075688772) * sqrt_p * jnp.sin(phi)
    wmid = (1.0 / 3.0) * (m - cphi)
    w0 = wmid + cphi
    w1 = wmid - sphi
    w2 = wmid + sphi
    lam = jnp.minimum(jnp.minimum(w0, w1), w2)

    # Columns of M = As - lam*I.
    c00, c01, c02 = a - lam, d_, f
    c10, c11, c12 = d_, b - lam, e
    c20, c21, c22 = f, e, c - lam
    # v01 = col0 x col1, v12 = col1 x col2, v20 = col2 x col0.
    v01x = c10 * c21 - c20 * c11
    v01y = c20 * c01 - c00 * c21
    v01z = c00 * c11 - c10 * c01
    v12x = c11 * c22 - c21 * c12
    v12y = c21 * c02 - c01 * c22
    v12z = c01 * c12 - c11 * c02
    v20x = c12 * c20 - c22 * c10
    v20y = c22 * c00 - c02 * c20
    v20z = c02 * c10 - c12 * c00
    n01 = v01x * v01x + v01y * v01y + v01z * v01z
    n12 = v12x * v12x + v12y * v12y + v12z * v12z
    n20 = v20x * v20x + v20y * v20y + v20z * v20z
    # First-max tie-break, matching jnp.argmax([n01, n12, n20]).
    pick0 = (n01 >= n12) & (n01 >= n20)
    pick1 = jnp.logical_not(pick0) & (n12 >= n20)
    vx = jnp.where(pick0, v01x, jnp.where(pick1, v12x, v20x))
    vy = jnp.where(pick0, v01y, jnp.where(pick1, v12y, v20y))
    vz = jnp.where(pick0, v01z, jnp.where(pick1, v12z, v20z))
    nrm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    safe = nrm > 0
    inv_n = 1.0 / jnp.where(safe, nrm, f32(1))
    vx = jnp.where(safe, vx * inv_n, f32(0))
    vy = jnp.where(safe, vy * inv_n, f32(0))
    vz = jnp.where(safe, vz * inv_n, f32(1))

    n_safe = jnp.maximum(n, f32(1))
    mx, my, mz = sx / n_safe, sy / n_safe, sz / n_safe
    d_raw = -(mx * vx + my * vy + mz * vz)
    flip = d_raw > 0
    nx = jnp.where(flip, vx, -vx)
    ny = jnp.where(flip, vy, -vy)
    nz = jnp.where(flip, vz, -vz)
    return nx, ny, nz, jnp.abs(d_raw)


def _merge_kernel(assoc_ref, nrp_ref,
                  ml0_ref, n0_ref, cx0_ref, cy0_ref, cz0_ref,
                  mx0_ref, my0_ref, mz0_ref, nx0_ref, ny0_ref, nz0_ref,
                  d0_ref, xx0_ref, xy0_ref, xz0_ref, yy0_ref, yz0_ref,
                  zz0_ref,
                  ml_ref, n_ref, cx_ref, cy_ref, cz_ref, mx_ref, my_ref,
                  mz_ref, nx_ref, ny_ref, nz_ref, d_ref, xx_ref, xy_ref,
                  xz_ref, yy_ref, yz_ref, zz_ref, *,
                  sb: int, maxp: int, min_cos: float, max_dist: float):
    SB = sb
    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (SB, _LANES), 1)
    in_slots = lane < maxp

    nrp = nrp_ref[:]                       # (SB, 128) int32 broadcast rows
    rmax = jnp.max(jnp.where(in_slots, jnp.minimum(nrp, maxp), 0))

    def rsum(x):
        return jnp.sum(x, axis=1, keepdims=True)

    def cond(state):
        return state[0] < rmax

    def body(state):
        (r, ml, n, cx, cy, cz, mx, my, mz, nx, ny, nz, d,
         xx, xy, xz, yy, yz, zz) = state

        active = r < nrp                          # (SB, 128), row-constant
        pid = rsum(jnp.where(lane == r, ml, 0))   # (SB, 1)
        sel = lane == pid

        def at_pid(x):
            return rsum(jnp.where(sel, x, f32(0)))

        npx, npy, npz = at_pid(nx), at_pid(ny), at_pid(nz)
        d_pid = at_pid(d)
        n_pid = at_pid(n)
        cx_pid, cy_pid, cz_pid = at_pid(cx), at_pid(cy), at_pid(cz)

        aslab = assoc_ref[pl.ds(r * SB, SB), :]
        cand = (aslab > 0) & (lane > r) & active
        cos = nx * npx + ny * npy + nz * npz
        dist = (mx * npx + my * npy + mz * npz + d_pid) ** 2
        passing = cand & (cos > f32(min_cos)) & (dist < f32(max_dist))
        expanded = rsum(passing.astype(f32)) > 0  # (SB, 1)

        w = passing.astype(f32)
        new_n = n_pid + rsum(w * n)
        new_sx = cx_pid + rsum(w * cx)
        new_sy = cy_pid + rsum(w * cy)
        new_sz = cz_pid + rsum(w * cz)
        n_div = jnp.maximum(new_n, f32(1))
        mu_x, mu_y, mu_z = new_sx / n_div, new_sy / n_div, new_sz / n_div

        w_all = w + sel.astype(f32)
        inv_n = 1.0 / jnp.maximum(n, f32(1))
        dmux = cx * inv_n - mu_x
        dmuy = cy * inv_n - mu_y
        dmuz = cz * inv_n - mu_z
        new_xx = rsum(w_all * (xx + n * dmux * dmux))
        new_xy = rsum(w_all * (xy + n * dmux * dmuy))
        new_xz = rsum(w_all * (xz + n * dmux * dmuz))
        new_yy = rsum(w_all * (yy + n * dmuy * dmuy))
        new_yz = rsum(w_all * (yz + n * dmuy * dmuz))
        new_zz = rsum(w_all * (zz + n * dmuz * dmuz))

        fnx, fny, fnz, fd = _fit_normal_d(
            new_xx, new_xy, new_xz, new_yy, new_yz, new_zz,
            new_sx, new_sy, new_sz, n_div)

        upd = sel & expanded
        n = jnp.where(upd, new_n, n)
        cx = jnp.where(upd, new_sx, cx)
        cy = jnp.where(upd, new_sy, cy)
        cz = jnp.where(upd, new_sz, cz)
        xx = jnp.where(upd, new_xx, xx)
        xy = jnp.where(upd, new_xy, xy)
        xz = jnp.where(upd, new_xz, xz)
        yy = jnp.where(upd, new_yy, yy)
        yz = jnp.where(upd, new_yz, yz)
        zz = jnp.where(upd, new_zz, zz)
        mx = jnp.where(upd, mu_x, mx)
        my = jnp.where(upd, mu_y, my)
        mz = jnp.where(upd, mu_z, mz)
        nx = jnp.where(upd, fnx, nx)
        ny = jnp.where(upd, fny, ny)
        nz = jnp.where(upd, fnz, nz)
        d = jnp.where(upd, fd, d)
        ml = jnp.where(passing, pid, ml)

        return (r + 1, ml, n, cx, cy, cz, mx, my, mz, nx, ny, nz, d,
                xx, xy, xz, yy, yz, zz)

    state0 = (jnp.int32(0), ml0_ref[:], n0_ref[:], cx0_ref[:], cy0_ref[:],
              cz0_ref[:], mx0_ref[:], my0_ref[:], mz0_ref[:], nx0_ref[:],
              ny0_ref[:], nz0_ref[:], d0_ref[:], xx0_ref[:], xy0_ref[:],
              xz0_ref[:], yy0_ref[:], yz0_ref[:], zz0_ref[:])
    (_, ml, n, cx, cy, cz, mx, my, mz, nx, ny, nz, d,
     xx, xy, xz, yy, yz, zz) = jax.lax.while_loop(cond, body, state0)

    ml_ref[:] = ml
    n_ref[:] = n
    cx_ref[:] = cx
    cy_ref[:] = cy
    cz_ref[:] = cz
    mx_ref[:] = mx
    my_ref[:] = my
    mz_ref[:] = mz
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    d_ref[:] = d
    xx_ref[:] = xx
    xy_ref[:] = xy
    xz_ref[:] = xz
    yy_ref[:] = yy
    yz_ref[:] = yz
    zz_ref[:] = zz


def pallas_merge_supported(config: Config) -> bool:
    if config.max_planes > _LANES:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def merge_planes_pallas_batched(labels_map: jax.Array,
                                segments: PlaneSegments, config: Config, *,
                                interpret: bool = False):
    """Batched greedy merge: (B, gh, gw) labels + batched PlaneSegments ->
    (merge_labels (B, MAXP) int32, merged PlaneSegments with leading B).

    Same contract as jax.vmap(merge_planes); the adjacency build stays in
    XLA (one-hot MXU contraction, ops/merge.py:pair_adjacency) and the
    sequential row loop runs on-core.
    """
    from deplex_tpu.ops.merge import plane_adjacency

    MAXP = config.max_planes
    B = labels_map.shape[0]
    SB = _round_up(max(B, 1), _SUBLANES)
    f32 = jnp.float32

    assoc = jax.vmap(lambda lm: plane_adjacency(lm, MAXP))(labels_map)

    def plane(x, fill=0.0):
        """(B, MAXP) -> (SB, 128)."""
        return jnp.pad(x.astype(f32), ((0, SB - B), (0, _LANES - MAXP)),
                       constant_values=fill)

    # (B, MAXP, MAXP) -> (MAXP, SB, MAXP) -> (MAXP*SB, 128).
    assoc_p = jnp.pad(assoc.astype(f32),
                      ((0, SB - B), (0, 0), (0, _LANES - MAXP)))
    assoc_p = jnp.swapaxes(assoc_p, 0, 1).reshape(MAXP * SB, _LANES)

    nrp = jnp.broadcast_to(
        jnp.pad(segments.nr_planes.astype(jnp.int32), (0, SB - B))[:, None],
        (SB, _LANES))
    ml0 = jnp.broadcast_to(jnp.arange(_LANES, dtype=jnp.int32)[None, :],
                           (SB, _LANES))

    inputs = [
        assoc_p, nrp, ml0,
        plane(segments.n),
        plane(segments.coord_sum[..., 0]),
        plane(segments.coord_sum[..., 1]),
        plane(segments.coord_sum[..., 2]),
        plane(segments.mean[..., 0]),
        plane(segments.mean[..., 1]),
        plane(segments.mean[..., 2]),
        plane(segments.normal[..., 0]),
        plane(segments.normal[..., 1]),
        plane(segments.normal[..., 2]),
        plane(segments.d),
        plane(segments.scatter[..., 0, 0]),
        plane(segments.scatter[..., 0, 1]),
        plane(segments.scatter[..., 0, 2]),
        plane(segments.scatter[..., 1, 1]),
        plane(segments.scatter[..., 1, 2]),
        plane(segments.scatter[..., 2, 2]),
    ]

    kernel = functools.partial(
        _merge_kernel, sb=SB, maxp=MAXP,
        min_cos=float(config.min_cos_angle_merge),
        max_dist=float(config.max_merge_dist))

    out_shapes = ([jax.ShapeDtypeStruct((SB, _LANES), jnp.int32)]
                  + [jax.ShapeDtypeStruct((SB, _LANES), f32)] * 17)
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 18),
        interpret=interpret,
    )(*inputs)

    (ml, n, cx, cy, cz, mx, my, mz, nx, ny, nz, d,
     xx, xy, xz, yy, yz, zz) = outs

    def unp(x):
        return x[:B, :MAXP]

    merge_labels = unp(ml)
    coord_sum = jnp.stack([unp(cx), unp(cy), unp(cz)], axis=-1)
    mean = jnp.stack([unp(mx), unp(my), unp(mz)], axis=-1)
    normal = jnp.stack([unp(nx), unp(ny), unp(nz)], axis=-1)
    scatter = jnp.stack([
        jnp.stack([unp(xx), unp(xy), unp(xz)], -1),
        jnp.stack([unp(xy), unp(yy), unp(yz)], -1),
        jnp.stack([unp(xz), unp(yz), unp(zz)], -1),
    ], -2)
    merged = PlaneSegments(
        nr_planes=segments.nr_planes, n=unp(n), coord_sum=coord_sum,
        scatter=scatter, normal=normal, mean=mean, d=unp(d),
        mse=segments.mse, score=segments.score)
    return merge_labels, merged
