"""Batched Pallas growing kernel vs vmapped XLA loop (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.ops.cellstats import compute_cell_stats
from deplex_tpu.ops.growing import finalize_rounds, grow_rounds
from deplex_tpu.ops.pallas_growing import grow_rounds_pallas_batched


@pytest.fixture(scope="module")
def batch_stats(tum_cloud):
    pts, h, w = tum_cloud
    cfg = Config(max_region_growing_rounds=128)
    img = pts.reshape(h, w, 3)
    # 4 distinct frames: crops shifted so rounds/planes differ per frame.
    crops = [img[:240, :320], img[240:, :320], img[:240, 320:], img[240:, 320:]]
    batch = jnp.stack([c.reshape(-1, 3) for c in crops])
    stats = jax.vmap(lambda p: compute_cell_stats(p, 240, 320, cfg))(batch)
    return stats, cfg


def test_batched_matches_vmapped_xla(batch_stats):
    stats, cfg = batch_stats
    ref = jax.vmap(lambda s: grow_rounds(s, cfg))(stats)
    got = grow_rounds_pallas_batched(stats, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.nr_rounds),
                                  np.asarray(ref.nr_rounds))
    np.testing.assert_array_equal(np.asarray(got.round_map),
                                  np.asarray(ref.round_map))
    np.testing.assert_allclose(np.asarray(got.sums), np.asarray(ref.sums),
                               rtol=1e-4, atol=1.0)


def test_batched_labels_match(batch_stats):
    stats, cfg = batch_stats
    fin = jax.vmap(lambda r: finalize_rounds(r, cfg))
    lm_ref, seg_ref = fin(jax.vmap(lambda s: grow_rounds(s, cfg))(stats))
    lm_got, seg_got = fin(grow_rounds_pallas_batched(stats, cfg, interpret=True))
    np.testing.assert_array_equal(np.asarray(lm_got), np.asarray(lm_ref))
    np.testing.assert_array_equal(np.asarray(seg_got.nr_planes),
                                  np.asarray(seg_ref.nr_planes))
