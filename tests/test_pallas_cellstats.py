"""Fused Pallas depth->moments kernel vs the XLA cellstats path.

Runs in interpret mode on CPU; the gates must agree exactly and the
moments to f32 reduction-order tolerance (the TPU conformance anchor is
the end-to-end golden-label F1, recorded in BASELINE.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.ops.cellstats import compute_cell_stats
from deplex_tpu.ops.pallas_cellstats import (cell_moments_pallas,
                                             cell_stats_from_depth_pallas,
                                             pallas_cellstats_auto,
                                             pallas_cellstats_supported)
from deplex_tpu.pipeline import backproject_device


@pytest.fixture(scope="module")
def tum_depth(tum_image):
    depth, K = tum_image
    return jnp.asarray(depth), jnp.asarray(np.asarray(K, np.float32))


def _compare(depth, K, cfg, H, W):
    ref = compute_cell_stats(backproject_device(depth, K), H, W, cfg)
    got = jax.tree.map(
        lambda a: a[0],
        cell_stats_from_depth_pallas(depth[None], K, cfg, interpret=True))

    np.testing.assert_array_equal(np.asarray(got.planar), np.asarray(ref.planar))
    np.testing.assert_allclose(np.asarray(got.coord_sum),
                               np.asarray(ref.coord_sum), rtol=1e-5, atol=1e-2)
    # Scatter to a tolerance scaled by its trace (centered f32 sums).
    tr = np.trace(np.asarray(ref.scatter), axis1=-2, axis2=-1)
    err = np.abs(np.asarray(got.scatter) - np.asarray(ref.scatter))
    assert (err <= 1e-4 * tr[..., None, None] + 1e-2).all()
    np.testing.assert_allclose(np.asarray(got.tol), np.asarray(ref.tol),
                               rtol=1e-4)


def test_moments_match_xla_tum(tum_depth):
    depth, K = tum_depth
    H, W = depth.shape
    _compare(depth, K, Config(), H, W)


@pytest.mark.parametrize("patch", [10, 4])
def test_stats_match_xla_path(tum_depth, patch):
    """Where the kernel is supported, the XLA path computes the IDENTICAL
    banded anchored MXU reduction (cellstats._moments_matmul). On TPU the
    two programs are bit-equal (asserted by scripts/tpu_conformance.py on
    hardware); on CPU, XLA's per-program FMA contraction introduces 1-ulp
    differences between separately compiled programs, so this asserts the
    exact-by-construction fields bitwise and the rest to ulp-scale
    tolerances. P=4 is the ICL geometry whose seed tie-breaks motivated
    the anchored moments."""
    from deplex_tpu.ops.cellstats import matmul_band_split

    depth, K = tum_depth
    H, W = depth.shape
    cfg = Config(patch_size=patch)
    gh, gw = H // patch, W // patch
    assert matmul_band_split(gh, gh * patch, gw * patch) is not None
    ref = jax.jit(lambda d, k: compute_cell_stats(
        backproject_device(d, k), H, W, cfg))(depth, K)
    got = jax.jit(lambda d, k: jax.tree.map(
        lambda a: a[0],
        cell_stats_from_depth_pallas(d[None], k, cfg, interpret=True)))(depth, K)

    bitwise = ("planar", "mean", "coord_sum", "nr_pts")
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU suite
        bitwise = ("planar", "normal", "mean", "d", "mse", "tol",
                   "coord_sum", "scatter")
    for field in bitwise:
        np.testing.assert_array_equal(
            np.asarray(getattr(got, field)), np.asarray(getattr(ref, field)),
            err_msg=field)
    # Anchored scatter entries are cell-local-small; ulp-scale agreement.
    tr = np.trace(np.asarray(ref.scatter), axis1=-2, axis2=-1)
    err = np.abs(np.asarray(got.scatter) - np.asarray(ref.scatter))
    assert (err <= 2e-5 * tr[..., None, None] + 1e-2).all()
    np.testing.assert_allclose(np.asarray(got.tol), np.asarray(ref.tol),
                               rtol=1e-5)
    # Normals agree to ulp scale except on eigengap-degenerate cells
    # (λ_min ~ λ_mid — e.g. a cell straddling a plane intersection), where
    # the min-eigenvector direction is genuinely unstable under 1-ulp input
    # changes. Those must be a vanishing fraction.
    pl_mask = np.asarray(ref.planar)
    ndiff = np.abs(np.asarray(got.normal) - np.asarray(ref.normal)).max(-1)
    frac_unstable = float((ndiff[pl_mask] > 1e-3).mean())
    assert frac_unstable < 0.01, frac_unstable
    assert float(np.quantile(ndiff[pl_mask], 0.99)) < 1e-4


def test_moments_match_xla_small_patch(tum_depth):
    depth, K = tum_depth
    crop = depth[:256, :256]
    _compare(crop, K, Config(patch_size=4), 256, 256)


def test_continuity_and_validity_gates_exact(tum_depth):
    """Gate counts (valid points, discontinuities) are integer-exact."""
    depth, K = tum_depth
    H, W = depth.shape
    cfg = Config()
    m = cell_moments_pallas(depth[None], K, cfg, interpret=True)
    ref = compute_cell_stats(backproject_device(depth, K), H, W, cfg)
    # Recompute the reference walks through the public XLA path pieces:
    # planar equality already pins them jointly; spot-check integer-ness.
    assert np.allclose(np.asarray(m.nr_valid) % 1.0, 0.0)
    assert np.allclose(np.asarray(m.disc_h) % 1.0, 0.0)
    assert np.allclose(np.asarray(m.disc_v) % 1.0, 0.0)
    del ref


def test_padded_band_plan_matches_xla():
    """Grids whose cell-row count has no aligned band split (the 720p@P8
    class: gh % 8 != 0) run through the zero-row-padded plan
    (cellstats.moments_band_plan) on BOTH backends; results crop back to
    the real grid and must agree like any supported shape."""
    from deplex_tpu.ops.cellstats import moments_band_plan

    H, W, P = 80, 128, 8                       # gh=10 -> padded to 16
    assert moments_band_plan(H // P, P, W) == (16, 1)
    cfg = Config(patch_size=P)
    rng = np.random.default_rng(7)
    z = rng.uniform(500, 3000, size=(H, W)).astype(np.float32)
    z[:40] = 1200.0                            # one clean plane
    depth = jnp.asarray(z)
    K = jnp.asarray(np.array([[200.0, 0, W / 2 - 0.5],
                              [0, 200.0, H / 2 - 0.5], [0, 0, 1]], np.float32))
    _compare(depth, K, cfg, H, W)
    got = jax.tree.map(
        lambda a: a[0],
        cell_stats_from_depth_pallas(depth[None], K, cfg, interpret=True))
    assert got.planar.shape == (H // P, W // P)
    # 720p@P8 itself is plan-covered (the round-4 gap: gh=90 fell off).
    assert moments_band_plan(90, 8, 1280) is not None


def test_moments_band_plan_properties():
    """For every plausible grid: the plan's band count divides the padded
    row count, bands are sublane-aligned, the working set fits the VMEM
    budget, and padding is minimal-ish (< 64 rows)."""
    from deplex_tpu.ops.cellstats import moments_band_plan

    for P in (2, 4, 6, 8, 10, 12, 16):
        for gh in (8, 10, 24, 48, 60, 90, 96, 120, 144):
            for Wc in (128, 640, 1280):
                plan = moments_band_plan(gh, P, Wc)
                if plan is None:
                    continue
                gh_pad, S = plan
                assert gh <= gh_pad < gh + 65
                assert gh_pad % S == 0
                assert (gh_pad // S) % 8 == 0
                band_bytes = 6 * (gh_pad * P // S) * Wc * 4
                assert band_bytes <= 6 * 1024 * 1024
    # The shipped shapes must all be plan-covered.
    assert moments_band_plan(48, 10, 640) == (48, 2)    # TUM VGA
    assert moments_band_plan(120, 4, 640) == (120, 3)   # ICL VGA
    assert moments_band_plan(90, 8, 1280) is not None   # 720p stress


def test_supported_and_auto_policy():
    cfg = Config()                       # P=10
    assert pallas_cellstats_supported(480, 640, cfg) in (True, False)
    # Auto mode follows support everywhere, small patches included (the
    # anchored moments fixed the P=4 conformance margin — BASELINE.md).
    small = Config(patch_size=4)
    assert pallas_cellstats_auto(480, 640, small) == \
        pallas_cellstats_supported(480, 640, small)
    forced = dataclasses.replace(small, use_pallas_cellstats=True)
    assert pallas_cellstats_auto(480, 640, forced) == \
        pallas_cellstats_supported(480, 640, forced)
    off = dataclasses.replace(cfg, use_pallas_cellstats=False)
    assert pallas_cellstats_auto(480, 640, off) is False
    # Odd patch sizes are unsupported (continuity walk assumes even P).
    assert pallas_cellstats_supported(480, 640, Config(patch_size=5)) is False
