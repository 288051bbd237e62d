"""SLAM on warped REAL data: the TUM frame re-rendered from moving poses.

The repo ships one TUM fr3 depth frame; a short sequence with exact ground
truth is synthesized by splatting its point cloud into new camera poses
(z-buffer). Warping introduces realistic holes and resampling noise, so
this exercises tracking on sensor-like data rather than ideal planes.
"""

import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.slam import PlaneSlam
from deplex_tpu.slam.lie import so3_exp
from deplex_tpu.utils.warp import warp_depth


@pytest.mark.slow
def test_tracks_warped_tum_sequence(tum_cloud):
    import jax.numpy as jnp

    from deplex_tpu.utils import DepthImage, read_intrinsics

    from .conftest import DATA

    img = DepthImage(str(DATA / "tum" / "1341848230.910894.png"))
    K = read_intrinsics(str(DATA / "configs" / "TUM_fr3_long_val.K"))
    depth0 = img.data
    H, W = depth0.shape

    rng = np.random.default_rng(0)
    poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    for i in range(1, 5):
        dR = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 0.002,
                                            jnp.float32)))
        R = (dR @ poses[-1][0]).astype(np.float32)
        t = poses[-1][1] + np.array([8.0, 3.0, 12.0], np.float32)
        poses.append((R, t))

    slam = PlaneSlam(H, W, Config(), max_landmarks=64, odom_iterations=10)
    errs = []
    from deplex_tpu.pipeline import backproject_device

    for i, (R, t) in enumerate(poses):
        d = depth0 if i == 0 else warp_depth(depth0, K, R, t)
        pts = backproject_device(jnp.asarray(d), jnp.asarray(K))
        res = slam.process_frame(pts)
        c_est = -np.asarray(res.R).T @ np.asarray(res.t)
        c_gt = -R.T @ t
        errs.append(np.linalg.norm(c_est - c_gt))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    # Total trajectory ~60mm; tracking should stay within sensor noise scale.
    assert ate < 40.0, (ate, errs)
