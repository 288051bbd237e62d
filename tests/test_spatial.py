"""TP-analog spatial sharding (parallel/spatial.py): one frame's cell grid
row-sharded over a mesh axis, validated against the single-device pipeline.

Float region statistics cross the shard boundary as psums, so labels may
differ from the single-device path by reduction-order ulps when a gate sits
exactly on a threshold; assertions are agreement bounds, not bit equality
(see the module docstring of parallel/spatial.py).

Each sharded compile costs ~1.5 min on the CPU mesh, so coverage is folded
into three compiled cases: synthetic+row-padding, one-cell-row-per-shard
(halo-only propagation), and the real TUM frame under an outer jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from deplex_tpu import Config
from deplex_tpu.parallel.spatial import extract_planes_spatial
from deplex_tpu.pipeline import extract_planes


def _mesh(n: int) -> Mesh:
    return Mesh(np.array(jax.devices()[:n]), axis_names=("space",))


def _agreement(a, b) -> float:
    a, b = np.asarray(a), np.asarray(b)
    return float((a == b).mean())


def _synthetic_cloud(H, W, seed=0):
    """Floor + back wall + noise, like the stress fixture but parametric."""
    fx = fy = 500.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    u = (np.tile(np.arange(W, dtype=np.float32), (H, 1)) - cx) / fx
    v = (np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W)) - cy) / fy
    z_floor = np.where(v > 0.15, 1000.0 / np.maximum(v, 0.15), np.inf)
    z_wall = np.full((H, W), 3000.0, np.float32)
    z = np.minimum(z_floor, z_wall).astype(np.float32)
    rng = np.random.default_rng(seed)
    z += rng.normal(scale=2.0, size=z.shape).astype(np.float32)
    return np.stack([u * z, v * z, z], axis=-1).reshape(-1, 3)


@pytest.mark.heavy
@pytest.mark.slow
def test_spatial_synthetic_with_padding():
    """gh (10 cell rows) not divisible by ntp (4): pad rows must stay inert
    and the result must agree with the single-device pipeline."""
    H, W = 80, 160
    cfg = Config(patch_size=8, max_planes=16)
    pts = _synthetic_cloud(H, W)
    ref = np.asarray(extract_planes(pts, image_height=H, image_width=W,
                                    config=cfg))
    got = np.asarray(extract_planes_spatial(
        pts, image_height=H, image_width=W, config=cfg, mesh=_mesh(4)))
    assert got.shape == ref.shape
    assert _agreement(got, ref) >= 0.995, _agreement(got, ref)
    n_ref = np.unique(ref[ref > 0]).size
    n_got = np.unique(got[got > 0]).size
    assert abs(n_got - n_ref) <= 1, (n_got, n_ref)


@pytest.mark.heavy
@pytest.mark.slow
def test_spatial_one_cell_row_per_shard():
    """gh == ntp: cross-boundary propagation is halo-only (gh_l == 1)."""
    H, W = 64, 96  # patch 8 -> 8 cell rows over 8 shards
    cfg = Config(patch_size=8, max_planes=16)
    pts = _synthetic_cloud(H, W, seed=2)
    ref = np.asarray(extract_planes(pts, image_height=H, image_width=W,
                                    config=cfg))
    got = np.asarray(extract_planes_spatial(
        pts, image_height=H, image_width=W, config=cfg, mesh=_mesh(8)))
    assert _agreement(got, ref) >= 0.99, _agreement(got, ref)


def test_spatial_tum_golden_under_jit(tum_cloud):
    """Real TUM fr3 frame, default config, sharded 4 ways under an outer jit:
    the sharded and single-device pipelines must agree at conformance level
    (and therefore both sit at F1 >= 0.95 vs the reference golden)."""
    pts, H, W = tum_cloud
    cfg = Config()
    mesh = _mesh(4)
    ref = np.asarray(extract_planes(pts, image_height=H, image_width=W,
                                    config=cfg))
    f = jax.jit(lambda p: extract_planes_spatial(
        p, image_height=H, image_width=W, config=cfg, mesh=mesh))
    got = np.asarray(f(jnp.asarray(pts)))
    agree = _agreement(got, ref)
    assert agree >= 0.99, agree
    n_ref = np.unique(ref[ref > 0]).size
    n_got = np.unique(got[got > 0]).size
    assert abs(n_got - n_ref) <= 2, (n_got, n_ref)


def test_spatial_rejects_ransac_and_tiny_grids():
    cfg = Config(ransac_refinement=True)
    with pytest.raises(ValueError, match="ransac"):
        extract_planes_spatial(jnp.zeros((80 * 96, 3)), image_height=80,
                               image_width=96, config=cfg, mesh=_mesh(2))
    cfg = Config(patch_size=40)
    with pytest.raises(ValueError, match="cell rows"):
        extract_planes_spatial(jnp.zeros((80 * 96, 3)), image_height=80,
                               image_width=96, config=cfg, mesh=_mesh(4))
