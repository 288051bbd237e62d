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


def test_hires_cylinders(hires_cloud):
    """BASELINE.json config 4 as specified: 1280x720, fine cell grid, WITH
    cylinder extraction enabled. A horizontal cylinder is added in front
    of the planar scene; the primitive pipeline must label it as a
    cylinder at 720p while still recovering the dominant planes."""
    from deplex_tpu.pipeline import extract_primitives_jit

    pts, H, W = hires_cloud
    pts = np.asarray(pts).reshape(H, W, 3).copy()
    # Paint a cylinder (axis = x, radius 400mm, center z=2500) over the
    # middle rows: y^2 + (z - z0)^2 = r^2 along each column ray.
    fx = fy = 1000.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    u = (np.arange(W, dtype=np.float64) - cx) / fx
    v = ((np.arange(H, dtype=np.float64) - cy) / fy)[:, None]
    dv = np.broadcast_to(v, (H, W))
    a = dv * dv + 1.0
    z0, r = 2500.0, 400.0
    disc = (-2 * z0) ** 2 - 4 * a * (z0 * z0 - r * r)
    t = np.where(disc > 0, (2 * z0 - np.sqrt(np.maximum(disc, 0))) / (2 * a),
                 np.inf)
    hit = np.isfinite(t) & (t < pts[..., 2])
    z = np.where(hit, t, pts[..., 2]).astype(np.float32)
    pts = np.stack([np.broadcast_to(u, (H, W)) * z, dv * z, z],
                   -1).astype(np.float32)

    cfg = Config(patch_size=8, max_planes=32, cylinder_extraction=True,
                 min_region_growing_cells_activated=3,
                 min_region_growing_candidate_size=3,
                 max_region_growing_rounds=64)
    out = extract_primitives_jit(pts.reshape(-1, 3), image_height=H,
                                 image_width=W, config=cfg)
    cyl = out["cylinders"]
    n = int(cyl.nr_cylinders)
    assert n >= 1, "no cylinder found at 720p"
    i = int(np.argmax(np.asarray(cyl.size)[:n]))
    assert abs(float(cyl.radius[i]) - r) / r < 0.1, float(cyl.radius[i])
    assert (np.asarray(out["cylinder_labels"]) > 0).sum() > 2000
    # Planes still cover the non-cylinder scene.
    plane_labels = np.asarray(out["plane_labels"])
    assert np.unique(plane_labels[plane_labels > 0]).size >= 2
    assert (plane_labels > 0).mean() > 0.35
