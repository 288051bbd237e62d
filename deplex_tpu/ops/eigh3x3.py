"""Batched closed-form symmetric 3x3 eigendecomposition.

TPU-native replacement for the reference's scalar dsyevh3 C routine
(/root/reference/libs/dsyev/src/dsyevh3.c:31-130, dsyevc3.c:31-80): Cardano's
analytic eigenvalues plus cross-product eigenvectors, vectorized over an
arbitrary batch of 3x3 covariance matrices so every cell of the grid is
solved simultaneously on the VPU instead of one dsyevh3 call per cell.

Differences from the reference, by design:
  * Batched over N matrices (leading axes arbitrary).
  * Works in float32 on TPU; matrices are pre-scaled by their max |entry| for
    conditioning (scale-invariant for eigenvectors, eigenvalues rescaled).
  * The reference's iterative QL fallback (dsyevq3.c) for ill-conditioned
    cross products is replaced by choosing the best of the three available
    column cross-products of (A - lambda I) — branch-free and batched.

The plane-fit consumer only needs: the eigenvector of the smallest
eigenvalue (plane normal), lambda_min (-> MSE), and lambda_max / trace
(-> planarity score).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def eigvals3x3_sym(A: jax.Array) -> jax.Array:
    """Cardano eigenvalues of symmetric 3x3 matrices, ascending order.

    A: (..., 3, 3) symmetric. Returns (..., 3) eigenvalues sorted ascending.
    Mirrors dsyevc3.c:31-80 (same characteristic-polynomial formulation).
    """
    a = A[..., 0, 0]
    b = A[..., 1, 1]
    c = A[..., 2, 2]
    d = A[..., 0, 1]
    e = A[..., 1, 2]
    f = A[..., 0, 2]

    de = d * e
    dd = d * d
    ee = e * e
    ff = f * f
    m = a + b + c
    c1 = (a * b + a * c + b * c) - (dd + ee + ff)
    c0 = c * dd + a * ee + b * ff - a * b * c - 2.0 * f * de

    p = m * m - 3.0 * c1
    q = m * (p - 1.5 * c1) - 13.5 * c0
    sqrt_p = jnp.sqrt(jnp.abs(p))

    phi = 27.0 * (0.25 * c1 * c1 * (p - c1) + c0 * (q + 6.75 * c0))
    phi = (1.0 / 3.0) * jnp.arctan2(jnp.sqrt(jnp.abs(phi)), q)

    cphi = sqrt_p * jnp.cos(phi)
    sphi = (1.0 / jnp.sqrt(3.0)) * sqrt_p * jnp.sin(phi)

    w1 = (1.0 / 3.0) * (m - cphi)
    w2 = w1 + sphi
    w0 = w1 + cphi
    w1 = w1 - sphi
    w = jnp.stack([w0, w1, w2], axis=-1)
    return jnp.sort(w, axis=-1)


def _eigvec_for(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector of symmetric A for eigenvalue lam, batched, robust.

    Takes the largest-norm cross product among the three column pairs of
    M = A - lam*I (all three are parallel to the eigenvector in exact
    arithmetic; picking the largest is the numerically best-conditioned one —
    this subsumes the reference's QL fallback, dsyevh3.c:102-118).
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    c0 = M[..., :, 0]
    c1 = M[..., :, 1]
    c2 = M[..., :, 2]
    v01 = jnp.cross(c0, c1)
    v12 = jnp.cross(c1, c2)
    v20 = jnp.cross(c2, c0)
    n01 = jnp.sum(v01 * v01, axis=-1)
    n12 = jnp.sum(v12 * v12, axis=-1)
    n20 = jnp.sum(v20 * v20, axis=-1)
    # Align signs so the three candidates don't cancel if summed; pick argmax.
    norms = jnp.stack([n01, n12, n20], axis=-1)
    vecs = jnp.stack([v01, v12, v20], axis=-2)  # (..., 3cand, 3)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(vecs, best[..., None, None], axis=-2)[..., 0, :]
    nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    # Degenerate (isotropic) matrices: fall back to e_z.
    safe = nrm > 0
    v = jnp.where(safe, v / jnp.where(safe, nrm, 1.0), jnp.array([0.0, 0.0, 1.0], dtype=A.dtype))
    return v


def eigh3x3_min(A: jax.Array):
    """Smallest-eigenpair + spectrum summary for symmetric 3x3 batches.

    Returns (w, v_min): w = (..., 3) ascending eigenvalues, v_min = (..., 3)
    unit eigenvector of w[..., 0].
    Matrices are normalized by max|entry| for float32 conditioning.
    """
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale > 0, scale, 1.0)
    As = A / scale
    w = eigvals3x3_sym(As)
    v = _eigvec_for(As, w[..., 0])
    return w * scale[..., 0], v


def eigh3x3(A: jax.Array):
    """Full decomposition: ascending eigenvalues and all three eigenvectors.

    Returns (w, V) with V[..., :, k] the eigenvector for w[..., k] (matching
    numpy.linalg.eigh's column convention).
    """
    scale = jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True)
    scale = jnp.where(scale > 0, scale, 1.0)
    As = A / scale
    w = eigvals3x3_sym(As)
    v0 = _eigvec_for(As, w[..., 0])
    v2 = _eigvec_for(As, w[..., 2])
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w * scale[..., 0], V


# ---------------------------------------------------------------------------
# numpy twin (used by the serial oracle so oracle and TPU pipeline share the
# exact same eigensolver semantics; also handy for unit tests).
# ---------------------------------------------------------------------------

def eigh3x3_min_np(A: np.ndarray):
    A = np.asarray(A)
    scale = np.max(np.abs(A), axis=(-2, -1), keepdims=True)
    scale = np.where(scale > 0, scale, 1.0)
    As = A / scale

    a = As[..., 0, 0]; b = As[..., 1, 1]; c = As[..., 2, 2]
    d = As[..., 0, 1]; e = As[..., 1, 2]; f = As[..., 0, 2]
    de = d * e; dd = d * d; ee = e * e; ff = f * f
    m = a + b + c
    c1 = (a * b + a * c + b * c) - (dd + ee + ff)
    c0 = c * dd + a * ee + b * ff - a * b * c - 2.0 * f * de
    p = m * m - 3.0 * c1
    q = m * (p - 1.5 * c1) - 13.5 * c0
    sqrt_p = np.sqrt(np.abs(p))
    phi = 27.0 * (0.25 * c1 * c1 * (p - c1) + c0 * (q + 6.75 * c0))
    phi = (1.0 / 3.0) * np.arctan2(np.sqrt(np.abs(phi)), q)
    cphi = sqrt_p * np.cos(phi)
    sphi = (1.0 / np.sqrt(3.0)) * sqrt_p * np.sin(phi)
    w1 = (1.0 / 3.0) * (m - cphi)
    w = np.stack([w1 + cphi, w1 - sphi, w1 + sphi], axis=-1)
    w = np.sort(w, axis=-1)

    M = As - w[..., 0, None, None] * np.eye(3, dtype=As.dtype)
    c0v = M[..., :, 0]; c1v = M[..., :, 1]; c2v = M[..., :, 2]
    cands = np.stack([np.cross(c0v, c1v), np.cross(c1v, c2v), np.cross(c2v, c0v)], axis=-2)
    norms = np.sum(cands * cands, axis=-1)
    best = np.argmax(norms, axis=-1)
    v = np.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    nrm = np.sqrt(np.sum(v * v, axis=-1, keepdims=True))
    safe = nrm > 0
    v = np.where(safe, v / np.where(safe, nrm, 1.0), np.array([0.0, 0.0, 1.0], dtype=As.dtype))
    return w * scale[..., 0], v
