"""Batched 3x3 eigensolver vs numpy.linalg.eigh oracle (SURVEY.md §4)."""

import numpy as np
import pytest

from deplex_tpu.ops.eigh3x3 import eigh3x3, eigh3x3_min, eigh3x3_min_np


def random_spd_batch(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 8, 3)).astype(np.float64) * scale
    return np.einsum("npi,npj->nij", X, X)


@pytest.mark.parametrize("scale", [1.0, 1e4, 1e-4])
def test_eigenvalues_match_numpy(scale):
    A = random_spd_batch(256, scale=scale)
    w_ref = np.linalg.eigvalsh(A)
    w, _ = eigh3x3_min(A.astype(np.float32))
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=2e-3,
                               atol=2e-3 * scale**2)


def test_min_eigenvector_is_eigenvector():
    A = random_spd_batch(256, seed=1)
    w, v = eigh3x3_min(A.astype(np.float32))
    w, v = np.asarray(w, np.float64), np.asarray(v, np.float64)
    residual = np.einsum("nij,nj->ni", A, v) - w[:, :1] * v
    scale = np.abs(A).max(axis=(1, 2))
    assert np.linalg.norm(residual, axis=1).max() / scale.max() < 1e-2
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_full_decomposition_orthonormal():
    A = random_spd_batch(64, seed=2)
    w, V = eigh3x3(A.astype(np.float32))
    V = np.asarray(V, np.float64)
    eye = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=2e-3)


def test_near_degenerate_plane():
    """Points nearly on a plane: lambda_min << others, normal recovered."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3))
    pts[:, 2] *= 1e-4  # nearly the z=0 plane
    A = (pts - pts.mean(0)).T @ (pts - pts.mean(0))
    w, v = eigh3x3_min(A[None].astype(np.float32))
    v = np.asarray(v)[0]
    assert abs(v[2]) > 0.999


def test_zero_matrix_safe():
    w, v = eigh3x3_min(np.zeros((2, 3, 3), np.float32))
    assert np.isfinite(np.asarray(w)).all()
    assert np.isfinite(np.asarray(v)).all()


def test_numpy_twin_matches_jax():
    A = random_spd_batch(64, seed=4).astype(np.float32)
    w_j, v_j = eigh3x3_min(A)
    w_n, v_n = eigh3x3_min_np(A)
    np.testing.assert_allclose(np.asarray(w_j), w_n, rtol=1e-4, atol=1e-4)
    # eigenvectors may differ in sign
    dots = np.abs(np.sum(np.asarray(v_j) * v_n, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
