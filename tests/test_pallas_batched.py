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


def test_chunked_matches_one_shot(batch_stats):
    """The serving path's batch-size negotiation (pallas_batched_chunk)
    runs the stacked kernel over sub-batches; frames are independent, so
    chunked and one-shot results must be identical."""
    stats, cfg = batch_stats
    B = stats.planar.shape[0]
    one = grow_rounds_pallas_batched(stats, cfg, interpret=True)
    chunk = B // 2
    got = jax.lax.map(
        lambda s: grow_rounds_pallas_batched(s, cfg, interpret=True),
        jax.tree.map(lambda a: a.reshape(B // chunk, chunk, *a.shape[1:]),
                     stats))
    got = jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), got)
    np.testing.assert_array_equal(np.asarray(got.round_map),
                                  np.asarray(one.round_map))
    np.testing.assert_array_equal(np.asarray(got.nr_rounds),
                                  np.asarray(one.nr_rounds))
    # sums rows past a frame's own nr_rounds are scratch from batch-mates
    # still growing (a smaller chunk runs fewer total rounds); only the
    # realized rows feed finalize_rounds. Realized rows agree to f32
    # reduction-order tolerance (the off-core region_sums matmul reduces
    # over the packed canvas, whose width depends on the batch size).
    nr = np.asarray(one.nr_rounds)
    rows = np.arange(one.sums.shape[1])[None, :]
    live = (rows < nr[:, None])[..., None]
    np.testing.assert_allclose(np.asarray(got.sums) * live,
                               np.asarray(one.sums) * live,
                               rtol=1e-5, atol=1.0)
    fin = jax.vmap(lambda r: finalize_rounds(r, cfg))
    lm_one, seg_one = fin(one)
    lm_got, seg_got = fin(got)
    np.testing.assert_array_equal(np.asarray(lm_got), np.asarray(lm_one))
    np.testing.assert_array_equal(np.asarray(seg_got.nr_planes),
                                  np.asarray(seg_one.nr_planes))


def test_batch_negotiation_picks_fitting_chunk(monkeypatch):
    """Batch-size negotiation (VERDICT r4 item 2): when the full serving
    batch misses the 10MB VMEM plan but a sub-batch fits, the negotiation
    returns the largest fitting divisor instead of falling off the kernel."""
    from deplex_tpu.ops import pallas_growing as pg

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # 720p@P8 with generous round budget: B=8 overflows via the per-frame
    # row-plane tables, B=4 fits.
    cfg = Config(patch_size=8, max_region_growing_rounds=512)
    if pg.pallas_batched_supported(8, (90, 160), cfg):
        # Plan arithmetic shifted — negotiation must then keep B=8.
        assert pg.pallas_batched_chunk(8, (90, 160), cfg) == 8
    else:
        assert pg.pallas_batched_chunk(8, (90, 160), cfg) in (1, 2, 4)
    # A grid too large for even one frame yields None (XLA fallback).
    huge = Config(patch_size=4)
    if not pg.pallas_batched_supported(1, (360, 640), huge):
        assert pg.pallas_batched_chunk(8, (360, 640), huge) is None
    # VGA@P10 at the serving batch keeps the one-shot kernel.
    assert pg.pallas_batched_chunk(64, (48, 64), Config(patch_size=10)) == 64


def test_batched_labels_match(batch_stats):
    stats, cfg = batch_stats
    fin = jax.vmap(lambda r: finalize_rounds(r, cfg))
    lm_ref, seg_ref = fin(jax.vmap(lambda s: grow_rounds(s, cfg))(stats))
    lm_got, seg_got = fin(grow_rounds_pallas_batched(stats, cfg, interpret=True))
    np.testing.assert_array_equal(np.asarray(lm_got), np.asarray(lm_ref))
    np.testing.assert_array_equal(np.asarray(seg_got.nr_planes),
                                  np.asarray(seg_ref.nr_planes))
