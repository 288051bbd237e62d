"""Native (C++) runtime tests: PNG16 decoder + back-projection vs oracles."""

import pathlib

import numpy as np
import pytest

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"


@pytest.fixture(scope="module")
def native():
    mod = pytest.importorskip("deplex_tpu.native")
    try:
        mod._load()
    except Exception as e:  # toolchain unavailable
        pytest.skip(f"native build failed: {e}")
    return mod


@pytest.mark.parametrize("png", ["tum/1341848230.910894.png", "icl_nuim/0.png"])
def test_decode_matches_pil(native, png):
    from PIL import Image

    path = DATA / png
    ours = native.decode_png16(str(path))
    with Image.open(path) as im:
        ref = np.asarray(im).astype(np.uint16)
    np.testing.assert_array_equal(ours, ref)


def test_decode_roundtrip_all_filters(native, tmp_path):
    """PIL chooses per-row filters adaptively; a noisy + smooth mix exercises
    Sub/Up/Average/Paeth paths."""
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.zeros((64, 64), np.uint16)
    img[:16] = rng.integers(0, 2**16, size=(16, 64))
    img[16:32] = np.arange(64, dtype=np.uint16)[None, :] * 37
    img[32:48] = np.arange(16, dtype=np.uint16)[:, None] * 1000
    img[48:] = 7
    p = tmp_path / "t.png"
    Image.fromarray(img, mode="I;16").save(p)
    got = native.decode_png16(str(p))
    np.testing.assert_array_equal(got, img)


def test_decode_invalid_raises(native, tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(RuntimeError):
        native.decode_png16(str(bad))


def test_backproject_matches_numpy(native):
    rng = np.random.default_rng(1)
    depth = rng.integers(0, 46656, size=(48, 64)).astype(np.uint16)
    fx, fy, cx, cy = 525.0, 520.0, 31.5, 23.5
    out = native.backproject(depth, fx, fy, cx, cy)
    H, W = depth.shape
    z = depth.astype(np.float32).reshape(-1)
    cols = np.tile(np.arange(W, dtype=np.float32), H)
    rows = np.repeat(np.arange(H, dtype=np.float32), W)
    ref = np.stack([(cols - cx) * z / fx, (rows - cy) * z / fy, z], axis=1)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-3)


def test_sequence_loader_ordered(native, tmp_path):
    """Native threaded loader returns frames in order, matching direct decode."""
    from PIL import Image

    rng = np.random.default_rng(7)
    paths = []
    frames = []
    for i in range(9):
        img = rng.integers(0, 2**16, size=(32, 48)).astype(np.uint16)
        img[0, 0] = i  # order marker
        p = tmp_path / f"{i:03d}.png"
        Image.fromarray(img, mode="I;16").save(p)
        paths.append(str(p))
        frames.append(img)
    loader = native.SequenceLoader(paths, width=48, height=32,
                                   queue_depth=3, workers=3)
    got = list(loader)
    loader.close()
    assert len(got) == 9
    for i, (g, f) in enumerate(zip(got, frames)):
        np.testing.assert_array_equal(g, f)


def test_sequence_loader_cloud(native, tmp_path):
    from PIL import Image

    img = (np.arange(32 * 48).reshape(32, 48) % 5000).astype(np.uint16)
    p = tmp_path / "f.png"
    Image.fromarray(img, mode="I;16").save(p)
    K = np.array([[100.0, 0, 23.5], [0, 100.0, 15.5], [0, 0, 1]], np.float32)
    loader = native.SequenceLoader([str(p)], width=48, height=32)
    cloud = loader.next_cloud(K)
    assert loader.next_cloud(K) is None
    loader.close()
    ref = native.backproject(img, 100.0, 100.0, 23.5, 15.5)
    np.testing.assert_allclose(cloud, ref)
