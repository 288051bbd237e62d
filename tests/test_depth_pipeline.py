"""Fused depth->labels path vs the points path (must agree exactly)."""

import numpy as np

from deplex_tpu import Config, PlaneExtractor
from deplex_tpu.utils import DepthImage, read_intrinsics

from .conftest import DATA


def test_process_depth_matches_process():
    img = DepthImage(str(DATA / "tum" / "1341848230.910894.png"))
    K = read_intrinsics(str(DATA / "configs" / "TUM_fr3_long_val.K"))
    ex = PlaneExtractor(img.height, img.width, Config())
    via_points = ex.process(img.transform_to_pcd(K))
    via_depth = ex.process_depth(img.data, K)
    np.testing.assert_array_equal(via_depth, via_points)


def test_process_depth_shape_check():
    import pytest

    ex = PlaneExtractor(480, 640)
    with pytest.raises(ValueError):
        ex.process_depth(np.zeros((10, 10), np.uint16), np.eye(3))
