"""Pallas growing kernel vs the XLA rounds loop (interpret mode on CPU).

The kernel must reproduce RoundData exactly (same rounds, same consumption
order, same sums up to f32 reduction order) — finalize_rounds is shared, so
round-level equality implies label-level equality.
"""

import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.ops.cellstats import compute_cell_stats
from deplex_tpu.ops.growing import finalize_rounds, grow_rounds
from deplex_tpu.ops.pallas_growing import grow_rounds_pallas


@pytest.fixture(scope="module")
def tum_stats(tum_cloud):
    pts, h, w = tum_cloud
    cfg = Config()
    return compute_cell_stats(pts, h, w, cfg), cfg


def test_rounds_match_xla(tum_stats):
    stats, cfg = tum_stats
    ref = grow_rounds(stats, cfg)
    got = grow_rounds_pallas(stats, cfg, interpret=True)
    assert int(got.nr_rounds) == int(ref.nr_rounds)
    np.testing.assert_array_equal(np.asarray(got.round_map),
                                  np.asarray(ref.round_map))
    np.testing.assert_allclose(np.asarray(got.sums), np.asarray(ref.sums),
                               rtol=1e-5, atol=1e-2)


def test_labels_match_xla(tum_stats):
    stats, cfg = tum_stats
    lm_ref, seg_ref = finalize_rounds(grow_rounds(stats, cfg), cfg)
    lm_got, seg_got = finalize_rounds(
        grow_rounds_pallas(stats, cfg, interpret=True), cfg)
    np.testing.assert_array_equal(np.asarray(lm_got), np.asarray(lm_ref))
    assert int(seg_got.nr_planes) == int(seg_ref.nr_planes)
    np.testing.assert_allclose(np.asarray(seg_got.normal),
                               np.asarray(seg_ref.normal), atol=1e-4)


def test_empty_frame():
    cfg = Config()
    pts = np.zeros((480 * 640, 3), np.float32)
    stats = compute_cell_stats(pts, 480, 640, cfg)
    got = grow_rounds_pallas(stats, cfg, interpret=True)
    assert int(got.nr_rounds) == 0
    assert (np.asarray(got.round_map) == -1).all()


def test_odd_grid_padding(tum_cloud):
    """Non-aligned grid (gh, gw not multiples of 8/128): padded cells must
    never join regions or histograms."""
    pts, h, w = tum_cloud
    crop = pts.reshape(h, w, 3)[:231, :315].reshape(-1, 3)  # 33x45 cells @ P=7
    cfg = Config(patch_size=7, max_region_growing_rounds=128)
    stats = compute_cell_stats(crop, 231, 315, cfg)
    ref = grow_rounds(stats, cfg)
    got = grow_rounds_pallas(stats, cfg, interpret=True)
    assert int(got.nr_rounds) == int(ref.nr_rounds)
    np.testing.assert_array_equal(np.asarray(got.round_map),
                                  np.asarray(ref.round_map))
