"""Cylinder extraction on a synthetic ray-cast scene (beyond-reference
capability; no golden exists — correctness anchors are analytic)."""

import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.pipeline import extract_primitives_jit


def cylinder_scene(H=240, W=320, r=400.0, z0=2000.0, z_bg=4000.0):
    """Horizontal cylinder (axis = x) in front of a back wall."""
    f = 260.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    u = (np.arange(W, dtype=np.float64) - cx) / f
    v = (np.arange(H, dtype=np.float64)[:, None] - cy) / f
    dv = np.broadcast_to(v, (H, W))
    # Ray (u, v, 1) * t; cylinder: y^2 + (z - z0)^2 = r^2.
    a = dv * dv + 1.0
    b = -2.0 * z0
    c = z0 * z0 - r * r
    disc = b * b - 4 * a * c
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a), np.inf)
    z = np.where(np.isfinite(t), t, z_bg)   # depth = z-component (t * 1)
    z = np.minimum(z, z_bg)
    pts = np.stack([np.broadcast_to(u, (H, W)) * z, dv * z, z], -1)
    return pts.reshape(-1, 3).astype(np.float32), H, W


def test_finds_cylinder_and_wall():
    pts, H, W = cylinder_scene()
    cfg = Config(patch_size=8, cylinder_extraction=True, max_planes=16,
                 min_region_growing_cells_activated=3,
                 min_region_growing_candidate_size=3,
                 max_region_growing_rounds=64,
                 depth_discontinuity_threshold=600.0)
    out = extract_primitives_jit(pts, image_height=H, image_width=W, config=cfg)
    cyl = out["cylinders"]
    n = int(cyl.nr_cylinders)
    assert n >= 1, "no cylinder found"
    # The largest cylinder should match the synthetic radius and axis.
    i = int(np.argmax(np.asarray(cyl.size)[:n]))
    radius = float(cyl.radius[i])
    axis = np.asarray(cyl.axis[i])
    assert abs(radius - 400.0) / 400.0 < 0.08, radius
    assert abs(axis[0]) > 0.98, axis        # axis ~ +-x
    # Back wall still found as a plane.
    assert np.asarray(out["plane_labels"]).max() >= 1
    # Cylinder pixels are labeled.
    assert (np.asarray(out["cylinder_labels"]) > 0).sum() > 500


def test_plane_scene_has_no_cylinders(tum_cloud):
    pts, h, w = tum_cloud
    cfg = Config(cylinder_extraction=True)
    out = extract_primitives_jit(pts, image_height=h, image_width=w, config=cfg)
    # A mostly-planar indoor frame should produce few/no confident cylinders.
    assert int(out["cylinders"].nr_cylinders) <= 3
