"""Pallas merge kernel vs the XLA greedy loop (interpret mode on CPU).

The kernel mirrors merge_planes_from_adjacency row for row; the only
arithmetic difference is the polynomial atan2 inside the on-core Cardano
refit (ops/pallas_merge.py docstring). These tests pin label-level equality
on the golden frames and on synthetic batches, and closeness of the refit
stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deplex_tpu import Config
from deplex_tpu.ops.cellstats import compute_cell_stats
from deplex_tpu.ops.growing import grow_planes
from deplex_tpu.ops.merge import merge_planes
from deplex_tpu.ops.pallas_merge import _atan2_pos, merge_planes_pallas_batched
from deplex_tpu.pipeline import backproject_device


def _grown(pts_batch, h, w, cfg):
    stats = jax.vmap(lambda p: compute_cell_stats(p, h, w, cfg))(pts_batch)
    return jax.vmap(lambda s: grow_planes(s, cfg))(stats)


def _assert_matches_xla(lm, seg, cfg):
    ml_ref, merged_ref = jax.vmap(lambda l, s: merge_planes(l, s, cfg))(lm, seg)
    ml_got, merged_got = merge_planes_pallas_batched(lm, seg, cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ml_got), np.asarray(ml_ref))
    np.testing.assert_array_equal(np.asarray(merged_got.n),
                                  np.asarray(merged_ref.n))
    np.testing.assert_allclose(np.asarray(merged_got.normal),
                               np.asarray(merged_ref.normal), atol=1e-5)
    np.testing.assert_allclose(np.asarray(merged_got.d),
                               np.asarray(merged_ref.d), rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(merged_got.scatter),
                               np.asarray(merged_ref.scatter),
                               rtol=1e-4, atol=1.0)


@pytest.mark.heavy
@pytest.mark.slow
def test_tum_golden_batch(tum_cloud):
    """Rolled variants of the golden TUM frame; B=3 exercises sublane pad."""
    pts, h, w = tum_cloud
    cfg = Config()
    depth = np.asarray(pts, np.float32).reshape(h, w, 3)[..., 2]
    rng = np.random.default_rng(0)
    rolls = [np.roll(depth, (int(rng.integers(0, 8)), int(rng.integers(0, 8))),
                     (0, 1)) for _ in range(3)]
    K = jnp.asarray([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1]],
                    jnp.float32)
    pts_b = jax.vmap(lambda d: backproject_device(jnp.asarray(d), K))(
        jnp.asarray(np.stack(rolls)))
    lm, seg = _grown(pts_b, h, w, cfg)
    _assert_matches_xla(lm, seg, cfg)


@pytest.mark.heavy
@pytest.mark.slow
def test_synthetic_multi_plane_batch():
    """Random staircase scenes: many touching coplanar segments to merge."""
    rng = np.random.default_rng(7)
    h, w = 120, 160
    cfg = Config(patch_size=10)
    frames = []
    for _ in range(4):
        z = np.full((h, w), 4000.0, np.float32)
        for _ in range(6):
            r0, c0 = rng.integers(0, h - 40), rng.integers(0, w - 40)
            z[r0:r0 + 40, c0:c0 + 40] = rng.uniform(2000, 6000)
        frames.append(z)
    K = jnp.asarray([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]],
                    jnp.float32)
    pts_b = jax.vmap(lambda d: backproject_device(jnp.asarray(d), K))(
        jnp.asarray(np.stack(frames)))
    lm, seg = _grown(pts_b, h, w, cfg)
    _assert_matches_xla(lm, seg, cfg)


def test_empty_frame_identity():
    cfg = Config()
    pts = jnp.zeros((1, 480 * 640, 3), jnp.float32)
    lm, seg = _grown(pts, 480, 640, cfg)
    ml, merged = merge_planes_pallas_batched(lm, seg, cfg, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ml), np.arange(cfg.max_planes, dtype=np.int32)[None])
    assert int(merged.nr_planes[0]) == 0


@pytest.mark.parametrize("quadrant", ["pp", "pn", "np", "nn", "axes"])
def test_atan2_poly(quadrant):
    """Polynomial atan2 (y >= 0 domain) vs numpy across quadrants/edges."""
    rng = np.random.default_rng(3)
    if quadrant == "axes":
        y = np.array([0.0, 0.0, 1.0, 5.0, 0.0], np.float32)
        x = np.array([1.0, -1.0, 0.0, 0.0, 0.0], np.float32)
    else:
        y = np.abs(rng.standard_normal(4096)).astype(np.float32)
        y *= 10.0 ** rng.uniform(-5, 5, y.shape).astype(np.float32)
        x = rng.standard_normal(4096).astype(np.float32)
        x *= 10.0 ** rng.uniform(-5, 5, x.shape).astype(np.float32)
        if quadrant[1] == "n":
            x = -np.abs(x)
        else:
            x = np.abs(x)
    got = np.asarray(_atan2_pos(jnp.asarray(y), jnp.asarray(x)))
    ref = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    np.testing.assert_allclose(got, ref, atol=5e-7)


def test_pipeline_points_api_dispatches_merge_kernel(tum_cloud, monkeypatch):
    """The reference-shaped points API (pipeline.extract_planes, what
    PlaneExtractor.process calls) must route stage 4 through the Pallas
    merge kernel under the same auto gates as the depth path, with
    identical labels. On CPU the gate is forced open and the kernel runs
    in interpret mode."""
    import functools

    from deplex_tpu.ops import pallas_merge
    from deplex_tpu.pipeline import extract_planes

    pts, h, w = tum_cloud
    cfg = Config()
    ref = np.asarray(extract_planes(jnp.asarray(pts), image_height=h,
                                    image_width=w, config=cfg))

    calls = []
    wrapped = functools.partial(merge_planes_pallas_batched, interpret=True)

    def spy(*args, **kwargs):
        calls.append(1)
        return wrapped(*args, **kwargs)

    monkeypatch.setattr(pallas_merge, "pallas_merge_supported", lambda c: True)
    monkeypatch.setattr(pallas_merge, "merge_planes_pallas_batched", spy)
    got = np.asarray(extract_planes(jnp.asarray(pts), image_height=h,
                                    image_width=w, config=cfg))
    assert calls, "points API did not dispatch to the Pallas merge kernel"
    np.testing.assert_array_equal(got, ref)
