"""DepthImage tests (mirrors cpp/tests/test_depth_image.cpp)."""

import pathlib

import numpy as np
import pytest

from deplex_tpu.utils import DepthImage, read_intrinsics

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"
TUM_PNG = str(DATA / "tum" / "1341848230.910894.png")


def test_dimensions():
    """test_depth_image.cpp:24-28."""
    img = DepthImage(TUM_PNG)
    assert img.width == 640
    assert img.height == 480


def test_invalid_path_raises():
    with pytest.raises(RuntimeError):
        DepthImage("/nonexistent/image.png")


def test_invalid_content_raises(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"this is not a png")
    with pytest.raises(RuntimeError):
        DepthImage(str(bad))


def test_golden_depth_range():
    """Raw sensor units, no TUM /5000 scaling (test_depth_image.cpp:45-51)."""
    img = DepthImage(TUM_PNG)
    K = read_intrinsics(str(DATA / "configs" / "TUM_fr3_long_val.K"))
    pcd = img.transform_to_pcd(K)
    assert pcd.shape == (640 * 480, 3)
    z = pcd[:, 2]
    assert int(z.max()) == 46655
    assert int(z.min()) == 0


def test_backprojection_pinhole():
    img = DepthImage(TUM_PNG)
    K = np.array([[525.0, 0, 319.5], [0, 525.0, 239.5], [0, 0, 1]], np.float32)
    pcd = img.transform_to_pcd(K).reshape(480, 640, 3)
    v, u = 100, 200
    z = float(img.data[v, u])
    assert pcd[v, u, 2] == pytest.approx(z)
    assert pcd[v, u, 0] == pytest.approx((u - 319.5) * z / 525.0, rel=1e-5)
    assert pcd[v, u, 1] == pytest.approx((v - 239.5) * z / 525.0, rel=1e-5)


def test_reset():
    img = DepthImage(TUM_PNG)
    img.reset(str(DATA / "icl_nuim" / "0.png"))
    assert img.height == 480 and img.width == 640
