"""High-resolution stress config (BASELINE.json config 4): 1280x720 depth
with a fine cell grid — exercises the eigensolve and label-propagation
kernels at ~14k cells (vs 3k for VGA)."""

import numpy as np
import pytest

from deplex_tpu import Config, PlaneExtractor


@pytest.fixture(scope="module")
def hires_cloud():
    """Synthetic 1280x720 scene: floor + two walls + noise region."""
    H, W = 720, 1280
    fx = fy = 1000.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    u = (np.tile(np.arange(W, dtype=np.float32), (H, 1)) - cx) / fx
    v = (np.tile(np.arange(H, dtype=np.float32)[:, None], (1, W)) - cy) / fy
    # Floor: y = 1000 (mm) -> z = 1000 / v for v > 0.1
    z_floor = np.where(v > 0.15, 1000.0 / np.maximum(v, 0.15), np.inf)
    # Back wall: z = 4000
    z_wall = np.full((H, W), 4000.0, np.float32)
    # Side wall: x = 1500 -> z = 1500 / u for u > 0.1
    z_side = np.where(u > 0.15, 1500.0 / np.maximum(u, 0.15), np.inf)
    z = np.minimum(np.minimum(z_floor, z_wall), z_side).astype(np.float32)
    rng = np.random.default_rng(0)
    z += rng.normal(scale=2.0, size=z.shape).astype(np.float32)  # sensor noise
    pts = np.stack([u * z, v * z, z], axis=-1).reshape(-1, 3)
    return pts, H, W


def test_hires_fine_grid(hires_cloud):
    pts, H, W = hires_cloud
    cfg = Config(patch_size=8, max_planes=32)  # 90x160 = 14400 cells
    labels = PlaneExtractor(H, W, cfg).process(pts)
    assert labels.shape == (H * W,)
    n_planes = np.unique(labels[labels > 0]).size
    assert 2 <= n_planes <= 12, n_planes
    # The three dominant planes should cover most of the frame.
    covered = (labels > 0).mean()
    assert covered > 0.5, covered
