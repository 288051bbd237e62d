"""Depth-frame warping: re-render a real depth frame from new camera poses.

The repo ships one real frame per dataset (reference parity — it ships the
same two PNGs, /root/reference/data/); multi-frame sequences with exact
ground truth are synthesized by splatting the real frame's point cloud into
new poses with z-buffering. Warping introduces realistic holes and
resampling noise, so downstream consumers (tracking, sequence loaders) see
sensor-like data rather than ideal planes. Used by scripts/make_sequence.py
and the SLAM sequence tests.
"""

from __future__ import annotations

import numpy as np


def warp_depth(depth: np.ndarray, K: np.ndarray, R: np.ndarray,
               t: np.ndarray) -> np.ndarray:
    """Render the depth seen from camera pose (R, t) (camera-from-world,
    world = the original camera frame) by point splatting with z-buffering.

    depth: (H, W) raw units (0 = invalid); K: 3x3 intrinsics.
    """
    H, W = depth.shape
    fx, cx = K[0, 0], K[0, 2]
    fy, cy = K[1, 1], K[1, 2]
    v, u = np.mgrid[0:H, 0:W].astype(np.float32)
    z = depth.astype(np.float32)
    valid = z > 0
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = np.stack([x[valid], y[valid], z[valid]], 1)
    pc = pts @ R.T + t
    zc = pc[:, 2]
    front = zc > 100
    pc = pc[front]
    zc = zc[front]
    uu = np.round(pc[:, 0] / zc * fx + cx).astype(np.int64)
    vv = np.round(pc[:, 1] / zc * fy + cy).astype(np.int64)
    inb = (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
    flat = vv[inb] * W + uu[inb]
    out = np.full(H * W, np.inf, np.float32)
    np.minimum.at(out, flat, zc[inb])
    out[~np.isfinite(out)] = 0.0
    return out.reshape(H, W)


def smooth_trajectory(n_frames: int, *, rot_step: float = 0.002,
                      trans_step=(8.0, 3.0, 12.0), seed: int = 0):
    """Ground-truth camera-from-world poses for a slow drifting camera.

    Returns [(R, t)] with pose 0 = identity (the original frame's view).
    """
    from deplex_tpu.slam.lie import so3_exp

    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    step = np.asarray(trans_step, np.float32)
    for _ in range(1, n_frames):
        dR = np.asarray(so3_exp(jnp.asarray(
            (rng.normal(size=3) * rot_step).astype(np.float32))))
        R = (dR @ poses[-1][0]).astype(np.float32)
        t = (poses[-1][1] + step).astype(np.float32)
        poses.append((R, t))
    return poses


def render_sequence(depth0: np.ndarray, K: np.ndarray, poses) -> list[np.ndarray]:
    """Warp depth0 into every pose; pose 0 (identity) returns depth0 as-is."""
    frames = []
    for i, (R, t) in enumerate(poses):
        if i == 0 and np.allclose(R, np.eye(3)) and np.allclose(t, 0):
            frames.append(depth0.astype(np.float32))
        else:
            frames.append(warp_depth(depth0, K, R, t))
    return frames
