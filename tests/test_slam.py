"""SLAM stack tests on synthetic plane worlds (CPU mesh).

No reference analog exists (the reference has no SLAM); correctness anchors
are analytic: known ground-truth poses/planes must be recovered.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deplex_tpu.slam import (AssociationParams, BAProblem, PlaneObs, associate,
                             ba_step, estimate_pose, run_ba, to_cp,
                             transform_plane, untransform_plane)
from deplex_tpu.slam.lie import se3_exp, so3_exp, so3_log
from deplex_tpu.slam.pose_graph import PoseGraph, graph_cost, optimize_pose_graph


def rand_rotation(rng, scale=0.5):
    return np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * scale, jnp.float32)))


def make_world(rng, m=12):
    """Random well-spread unit normals + offsets."""
    n = rng.normal(size=(m, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = rng.uniform(500, 3000, size=m).astype(np.float32)
    return jnp.asarray(n, jnp.float32), jnp.asarray(d, jnp.float32)


class TestLie:
    def test_so3_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        phi = jnp.asarray(rng.normal(size=(32, 3)) * 0.8, jnp.float32)
        R = so3_exp(phi)
        np.testing.assert_allclose(np.asarray(so3_log(R)), phi, atol=1e-4)

    def test_so3_orthonormal(self):
        rng = np.random.default_rng(1)
        R = so3_exp(jnp.asarray(rng.normal(size=(8, 3)), jnp.float32))
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(np.asarray(eye),
                                   np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    def test_se3_exp_zero(self):
        R, t = se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(t), 0, atol=1e-7)


class TestPlanes:
    def test_transform_roundtrip(self):
        rng = np.random.default_rng(2)
        n_w, d_w = make_world(rng)
        R = jnp.asarray(rand_rotation(rng))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32) * 100)
        n_c, d_c = transform_plane(R, t, n_w, d_w)
        n_b, d_b = untransform_plane(R, t, n_c, d_c)
        np.testing.assert_allclose(np.asarray(n_b), np.asarray(n_w), atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_w), rtol=1e-5)

    def test_plane_point_invariance(self):
        """A point on the world plane stays on the transformed plane."""
        rng = np.random.default_rng(3)
        n_w, d_w = make_world(rng, m=4)
        R = jnp.asarray(rand_rotation(rng))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32) * 50)
        # point on plane 0: x = -d * n
        x_w = -d_w[0] * n_w[0]
        x_c = R @ x_w + t
        n_c, d_c = transform_plane(R, t, n_w, d_w)
        assert abs(float(jnp.dot(n_c[0], x_c) + d_c[0])) < 1e-2


class TestAssociation:
    def test_perfect_association(self):
        rng = np.random.default_rng(4)
        n_w, d_w = make_world(rng, m=8)
        R = jnp.asarray(rand_rotation(rng, 0.3))
        t = jnp.asarray(rng.normal(size=3).astype(np.float32) * 50)
        n_c, d_c = transform_plane(R, t, n_w, d_w)
        P = 16
        obs = PlaneObs(
            normal=jnp.concatenate([n_c, jnp.zeros((P - 8, 3))]),
            d=jnp.concatenate([d_c, jnp.zeros(P - 8)]),
            weight=jnp.concatenate([jnp.ones(8) * 100, jnp.zeros(P - 8)]),
            mean=jnp.concatenate([-d_c[:, None] * n_c, jnp.zeros((P - 8, 3))]))
        m = associate(obs, n_w, d_w, jnp.ones(8, bool), R, t)
        got = np.asarray(m.landmark[:8])
        np.testing.assert_array_equal(got, np.arange(8))
        assert not np.asarray(m.valid[8:]).any()

    def test_association_rejects_bad_normals(self):
        n_w = jnp.asarray([[0.0, 0.0, 1.0]])
        d_w = jnp.asarray([1000.0])
        obs = PlaneObs(normal=jnp.asarray([[1.0, 0.0, 0.0]]),
                       d=jnp.asarray([1000.0]), weight=jnp.asarray([10.0]),
                       mean=jnp.asarray([[0.0, 0.0, -1000.0]]))
        m = associate(obs, n_w, d_w, jnp.ones(1, bool), jnp.eye(3), jnp.zeros(3))
        assert not bool(m.valid[0])


class TestOdometry:
    def test_recovers_pose(self):
        rng = np.random.default_rng(5)
        n_w, d_w = make_world(rng, m=10)
        R_true = jnp.asarray(rand_rotation(rng, 0.2))
        t_true = jnp.asarray(rng.normal(size=3).astype(np.float32) * 80)
        n_c, d_c = transform_plane(R_true, t_true, n_w, d_w)
        obs = PlaneObs(normal=n_c, d=d_c, weight=jnp.ones(10) * 50,
                       mean=-d_c[:, None] * n_c)
        # Start from a perturbed prior.
        dR, dt = se3_exp(jnp.asarray([0.05, -0.04, 0.03, 20.0, -15.0, 10.0]))
        R0, t0 = dR @ R_true, dR @ t_true + dt
        res = estimate_pose(obs, n_w, d_w, jnp.arange(10), jnp.ones(10, bool),
                            R0, t0, iterations=10)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_true), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_true), atol=1.0)


class TestBA:
    def _make_problem(self, rng, K=5, M=10, noise=0.0):
        n_w, d_w = make_world(rng, m=M)
        eta_true = np.asarray(to_cp(n_w, d_w))
        Rs, ts = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
        for _ in range(K - 1):
            Rs.append(rand_rotation(rng, 0.15).astype(np.float32))
            ts.append((rng.normal(size=3) * 60).astype(np.float32))
        R = jnp.asarray(np.stack(Rs))
        t = jnp.asarray(np.stack(ts))
        n_c, d_c = jax.vmap(transform_plane, in_axes=(0, 0, None, None))(R, t, n_w, d_w)
        n_c = n_c + noise * rng.normal(size=n_c.shape).astype(np.float32)
        n_c = n_c / jnp.linalg.norm(n_c, axis=-1, keepdims=True)
        d_c = d_c + noise * 100 * rng.normal(size=d_c.shape).astype(np.float32)
        obs_lm = jnp.broadcast_to(jnp.arange(M), (K, M)).astype(jnp.int32)
        obs_w = jnp.ones((K, M), jnp.float32)
        return BAProblem(R=R, t=t, eta=jnp.asarray(eta_true),
                         obs_normal=n_c, obs_d=d_c, obs_lm=obs_lm,
                         obs_w=obs_w), (R, t, eta_true)

    def test_ba_zero_residual_at_truth(self):
        rng = np.random.default_rng(6)
        prob, _ = self._make_problem(rng)
        state = ba_step(prob)
        assert float(state.cost) < 1e-2

    def test_ba_recovers_perturbed_poses(self):
        rng = np.random.default_rng(7)
        prob, (R_true, t_true, eta_true) = self._make_problem(rng)
        # Perturb all but pose 0 and the landmarks.
        K = prob.R.shape[0]
        xi = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32)) * \
            jnp.asarray([0.02, 0.02, 0.02, 10.0, 10.0, 10.0])
        xi = xi.at[0].set(0.0)
        dR, dt = se3_exp(xi)
        prob_pert = prob._replace(
            R=dR @ prob.R,
            t=jnp.einsum("kij,kj->ki", dR, prob.t) + dt,
            eta=prob.eta + jnp.asarray(rng.normal(size=prob.eta.shape).astype(np.float32)) * 5.0)
        out = run_ba(prob_pert, iterations=15, damping=1e-6)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(R_true), atol=5e-3)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_true), atol=2.0)
        assert float(out.cost) < 1e-2

    def test_ba_sharded_matches_dense(self):
        """Keyframe-sharded BA step over the 8-device CPU mesh == dense step."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        rng = np.random.default_rng(8)
        prob, _ = self._make_problem(rng, K=8, M=10)
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32)) * 0.02
        xi = xi.at[0].set(0.0)
        dR, dt = se3_exp(xi)
        prob = prob._replace(R=dR @ prob.R,
                             t=jnp.einsum("kij,kj->ki", dR, prob.t) + dt)

        dense = ba_step(prob, damping=1e-4)

        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("kf",))
        sharded_fn = shard_map(
            lambda p: ba_step(p, damping=1e-4, axis_name="kf"),
            mesh=mesh,
            in_specs=(BAProblem(R=P("kf"), t=P("kf"), eta=P(),
                                obs_normal=P("kf"), obs_d=P("kf"),
                                obs_lm=P("kf"), obs_w=P("kf")),),
            out_specs=(type(dense))(R=P("kf"), t=P("kf"), eta=P(), cost=P()),
            check_vma=False)
        sharded = jax.jit(sharded_fn)(prob)
        # f32 reduction order differs between the psum/all_gather path and
        # the dense path; agreement is to GN-step accuracy, not bitwise.
        np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(dense.R),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(dense.t),
                                   rtol=5e-3, atol=0.2)
        np.testing.assert_allclose(np.asarray(sharded.eta), np.asarray(dense.eta),
                                   rtol=5e-3, atol=0.2)


class TestPoseGraph:
    def test_closes_loop(self):
        """Chain with drift + loop closure: optimization reduces cost."""
        rng = np.random.default_rng(9)
        K = 6
        # Ground truth: poses around a circle.
        Rs = [np.eye(3, dtype=np.float32)]
        ts = [np.zeros(3, np.float32)]
        for k in range(1, K):
            Rs.append(rand_rotation(rng, 0.1).astype(np.float32))
            ts.append((rng.normal(size=3) * 40).astype(np.float32))
        R = jnp.asarray(np.stack(Rs)); t = jnp.asarray(np.stack(ts))

        def rel(a, b):
            return (np.asarray(R[a]).T @ np.asarray(R[b]),
                    np.asarray(R[a]).T @ (np.asarray(t[b]) - np.asarray(t[a])))

        edges = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
        mR = jnp.asarray(np.stack([rel(a, b)[0] for a, b in edges]))
        mt = jnp.asarray(np.stack([rel(a, b)[1] for a, b in edges]))
        ea = jnp.asarray([a for a, _ in edges], jnp.int32)
        eb = jnp.asarray([b for _, b in edges], jnp.int32)

        # Perturb all but node 0.
        xi = jnp.asarray(rng.normal(size=(K, 6)).astype(np.float32)) * \
            jnp.asarray([0.03, 0.03, 0.03, 8.0, 8.0, 8.0])
        xi = xi.at[0].set(0.0)
        dR, dt2 = se3_exp(xi)
        g = PoseGraph(R=dR @ R, t=jnp.einsum("kij,kj->ki", dR, t) + dt2,
                      edge_a=ea, edge_b=eb, meas_R=mR, meas_t=mt,
                      weight=jnp.ones(len(edges)))
        before = float(graph_cost(g))
        out = optimize_pose_graph(g, iterations=40)
        after = float(graph_cost(out))
        assert after < before * 1e-3, (before, after)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(R), atol=1e-2)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t), atol=2.0)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from deplex_tpu.slam import init_map
        from deplex_tpu.slam.checkpoint import load_checkpoint, save_checkpoint

        m = init_map(16)
        m = m._replace(d=m.d + 5.0, count=jnp.int32(3))
        state = {"map": m, "R": jnp.eye(3)}
        save_checkpoint(str(tmp_path / "ck"), state)
        restored = load_checkpoint(str(tmp_path / "ck"), state)
        np.testing.assert_allclose(np.asarray(restored["map"].d), np.asarray(m.d))
        assert int(np.asarray(restored["map"].count)) == 3


@pytest.mark.heavy
class TestMotionPriors:
    """Odometry + constant-velocity priors (ba.BAProblem odo_*/cv_w): the
    fix for plane-null pose directions. Two axis-aligned wall planes leave
    z-translation completely unobservable; priors must pin it.

    Marked heavy (compile-bound: 4 BA jit signatures); runs once per CI
    matrix via the dedicated heavy job."""

    def _underconstrained_problem(self, jitter_z):
        """K poses on a constant-velocity line, observing ONLY x/y walls.

        Initial z positions carry the given jitter; plane observations are
        exact, so any BA result is cost-optimal in x/y while z is free.
        """
        K = 8
        n_w = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]], jnp.float32)
        d_w = jnp.asarray([2000.0, 1500.0], jnp.float32)
        R_true = jnp.broadcast_to(jnp.eye(3), (K, 3, 3)).astype(jnp.float32)
        t_true = jnp.asarray(
            np.stack([np.array([10.0 * k, 5.0 * k, 20.0 * k], np.float32)
                      for k in range(K)]))
        n_c, d_c = jax.vmap(transform_plane, in_axes=(0, 0, None, None))(
            R_true, t_true, n_w, d_w)
        t0 = t_true.at[:, 2].add(jnp.asarray(jitter_z, jnp.float32))
        prob = BAProblem(
            R=R_true, t=t0, eta=jnp.asarray(to_cp(n_w, d_w)),
            obs_normal=n_c, obs_d=d_c,
            obs_lm=jnp.broadcast_to(jnp.arange(2), (K, 2)).astype(jnp.int32),
            obs_w=jnp.ones((K, 2), jnp.float32))
        return prob, t_true

    def test_plane_null_direction_unconstrained_without_priors(self):
        rng = np.random.default_rng(11)
        jit_z = (rng.normal(size=8) * 30).astype(np.float32)
        jit_z[0] = 0.0
        prob, t_true = self._underconstrained_problem(jit_z)
        out = run_ba(prob, iterations=8)
        # z-jitter survives: nothing in the cost touches it.
        z_err = np.abs(np.asarray(out.t[:, 2] - t_true[:, 2]))
        assert z_err.max() > 20.0, z_err

    def test_cv_prior_pins_null_direction(self):
        rng = np.random.default_rng(11)
        jit_z = (rng.normal(size=8) * 30).astype(np.float32)
        jit_z[0] = 0.0
        prob, t_true = self._underconstrained_problem(jit_z)
        prob = prob._replace(cv_w=jnp.full(6, 1000.0, jnp.float32))
        out = run_ba(prob, iterations=8)
        z_err = np.abs(np.asarray(out.t[:, 2] - t_true[:, 2]))
        # The constant-velocity prior straightens z up to the gauge left by
        # the free endpoints (pose 0 fixed, overall z-slope unobservable):
        # compare against the best line, not the exact truth.
        z = np.asarray(out.t[:, 2])
        k = np.arange(8)
        slope = np.polyfit(k, z, 1)
        line_resid = z - np.polyval(slope, k)
        assert np.abs(line_resid).max() < 2.0, line_resid
        assert np.abs(line_resid).max() < 0.2 * z_err.max() + 2.0

    def test_odo_prior_recovers_relative_chain(self):
        rng = np.random.default_rng(12)
        jit_z = (rng.normal(size=8) * 30).astype(np.float32)
        jit_z[0] = 0.0
        prob, t_true = self._underconstrained_problem(jit_z)
        # Odometry measurements from the TRUE chain (identity rotations):
        # t_rel = t_i - t_{i+1}.
        odo_R = jnp.broadcast_to(jnp.eye(3), (7, 3, 3)).astype(jnp.float32)
        odo_t = t_true[:-1] - t_true[1:]
        prob = prob._replace(odo_R=odo_R, odo_t=odo_t,
                             odo_w=jnp.full(7, 100.0, jnp.float32))
        out = run_ba(prob, iterations=8)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(t_true),
                                   atol=1.0)

    def test_ba_sharded_matches_dense_with_priors(self):
        """Sharded step with replicated prior arrays == dense step."""
        from jax import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        rng = np.random.default_rng(13)
        jit_z = (rng.normal(size=8) * 30).astype(np.float32)
        jit_z[0] = 0.0
        prob, t_true = self._underconstrained_problem(jit_z)
        odo_R = jnp.broadcast_to(jnp.eye(3), (7, 3, 3)).astype(jnp.float32)
        odo_t = t_true[:-1] - t_true[1:]
        prob = prob._replace(odo_R=odo_R, odo_t=odo_t,
                             odo_w=jnp.full(7, 10.0, jnp.float32),
                             cv_w=jnp.full(6, 100.0, jnp.float32))

        dense = ba_step(prob, damping=1e-4)
        mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("kf",))
        sharded_fn = shard_map(
            lambda p: ba_step(p, damping=1e-4, axis_name="kf"),
            mesh=mesh,
            in_specs=(BAProblem(R=P("kf"), t=P("kf"), eta=P(),
                                obs_normal=P("kf"), obs_d=P("kf"),
                                obs_lm=P("kf"), obs_w=P("kf"),
                                odo_R=P(), odo_t=P(), odo_w=P(),
                                cv_w=P()),),
            out_specs=(type(dense))(R=P("kf"), t=P("kf"), eta=P(), cost=P()),
            check_vma=False)
        sharded = jax.jit(sharded_fn)(prob)
        np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(dense.R),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(dense.t),
                                   rtol=5e-3, atol=0.2)

    def test_pose_graph_cv_smooths_jitter(self):
        """A jittered chain with exact consecutive edges + cv priors ends
        closer to the true line than the jittered start."""
        K = 10
        t_true = np.stack([[12.0 * k, -4.0 * k, 8.0 * k] for k in range(K)]
                          ).astype(np.float32)
        rng = np.random.default_rng(14)
        jit = (rng.normal(size=(K, 3)) * 20).astype(np.float32)
        jit[0] = 0.0
        R = jnp.broadcast_to(jnp.eye(3), (K, 3, 3)).astype(jnp.float32)
        g = PoseGraph(
            R=R, t=jnp.asarray(t_true + jit),
            edge_a=jnp.arange(K - 1, dtype=jnp.int32),
            edge_b=jnp.arange(1, K, dtype=jnp.int32),
            meas_R=jnp.broadcast_to(jnp.eye(3), (K - 1, 3, 3)).astype(jnp.float32),
            meas_t=jnp.asarray(t_true[1:] - t_true[:-1]),
            weight=jnp.ones(K - 1, jnp.float32),
            cv_w=jnp.full(K - 2, 100.0, jnp.float32))
        out = optimize_pose_graph(g, iterations=25)
        err0 = np.abs(jit).max()
        err1 = np.abs(np.asarray(out.t) - t_true).max()
        assert err1 < 0.3 * err0, (err1, err0)
