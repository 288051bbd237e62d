"""Plane-SLAM frontend: extraction -> association -> odometry -> mapping.

Drives the full new-capability stack (BASELINE.json north star): per frame,
extract planes with the TPU pipeline, associate them against the plane-
landmark map, refine the pose with Gauss-Newton odometry, then fuse matched
observations into the map and spawn landmarks for unmatched ones. The
per-frame device step (associate + odometry + map update) is one jitted
function of fixed shapes; keyframe snapshots accumulate the BA problem that
deplex_tpu.slam.ba refines (optionally sharded over a mesh).

Host/device split mirrors the framework's design rules: PNG decode and
back-projection on host (native C++ path), everything else on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from deplex_tpu.config import Config
from deplex_tpu.ops.cellstats import compute_cell_stats
from deplex_tpu.ops.growing import grow_planes
from deplex_tpu.ops.merge import merge_planes
from deplex_tpu.slam.association import AssociationParams, associate
from deplex_tpu.slam.odometry import estimate_pose
from deplex_tpu.slam.planes import (PlaneObs, from_segments, to_cp,
                                    untransform_plane)


class MapState(NamedTuple):
    """Fixed-capacity plane-landmark map (world frame)."""

    normal: jax.Array    # (M, 3)
    d: jax.Array         # (M,)
    weight: jax.Array    # (M,) accumulated observation weight; 0 = free slot
    count: jax.Array     # () int32 occupied slots


class FrameResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    num_matched: jax.Array
    num_new: jax.Array
    obs: PlaneObs
    matches_lm: jax.Array


def init_map(max_landmarks: int) -> MapState:
    return MapState(normal=jnp.zeros((max_landmarks, 3), jnp.float32),
                    d=jnp.zeros(max_landmarks, jnp.float32),
                    weight=jnp.zeros(max_landmarks, jnp.float32),
                    count=jnp.int32(0))


def extract_plane_obs(points: jax.Array, image_height: int, image_width: int,
                      config: Config) -> PlaneObs:
    """Run extraction stages 1-4 and return the merged plane parameters.

    Unlike pipeline.extract_planes this stops before rasterization: SLAM
    needs plane parameters, not per-pixel labels. Merged (absorbed) slots
    get weight 0 so each physical plane appears once.
    """
    stats = compute_cell_stats(points, image_height, image_width, config)
    labels_map, segments = grow_planes(stats, config)
    merge_labels, merged = merge_planes(labels_map, segments, config)
    obs = from_segments(merged)
    # Drop slots absorbed by the merge (representative != self).
    keep = merge_labels == jnp.arange(merge_labels.shape[0])
    return obs._replace(weight=jnp.where(keep, obs.weight, 0.0))


def slam_step(obs: PlaneObs, map_state: MapState, R_prior: jax.Array,
              t_prior: jax.Array, *, assoc: AssociationParams,
              odom_iterations: int, min_obs_weight: float):
    """Pure device step: associate -> pose GN -> map fuse/spawn."""
    usable = obs._replace(weight=jnp.where(obs.weight >= min_obs_weight,
                                           obs.weight, 0.0))
    matches = associate(usable, map_state.normal, map_state.d,
                        map_state.weight > 0, R_prior, t_prior, assoc)
    odo = estimate_pose(usable, map_state.normal, map_state.d,
                        matches.landmark, matches.valid, R_prior, t_prior,
                        iterations=odom_iterations)
    R, t = odo.R, odo.t

    # ---- fuse matched observations (weighted average in world frame) ----
    n_w_obs, d_w_obs = untransform_plane(R, t, usable.normal, usable.d)
    M = map_state.d.shape[0]
    onehot = ((matches.landmark[:, None] == jnp.arange(M)[None, :])
              & matches.valid[:, None]).astype(jnp.float32)
    w_obs = onehot * usable.weight[:, None]                  # (P, M)
    add_w = jnp.sum(w_obs, axis=0)                           # (M,)
    # Average the CP vectors (linear, handles normal+offset jointly).
    cp_obs = to_cp(n_w_obs, d_w_obs)                         # (P, 3)
    cp_map = to_cp(map_state.normal, map_state.d)            # (M, 3)
    tot_w = map_state.weight + add_w
    cp_new = (cp_map * map_state.weight[:, None]
              + jnp.einsum("pm,pi->mi", w_obs, cp_obs)) / jnp.maximum(tot_w, 1.0)[:, None]
    cp_new = jnp.where((add_w > 0)[:, None], cp_new, cp_map)
    from deplex_tpu.slam.planes import from_cp
    n_new, d_new = from_cp(cp_new)
    fused = MapState(normal=n_new, d=d_new,
                     weight=jnp.where(add_w > 0, tot_w, map_state.weight),
                     count=map_state.count)

    # ---- spawn landmarks for unmatched observations ----
    # Suppress near-duplicates: an unmatched observation whose world-frame
    # plane is close to ANY existing landmark (even one another observation
    # matched) must not fork the map — duplicated landmarks bias later
    # association and odometry.
    dup_cos = jnp.einsum("pi,mi->pm", n_w_obs, fused.normal)
    dup_d = jnp.abs(d_w_obs[:, None] - fused.d[None, :])
    near_dup = jnp.any((dup_cos >= assoc.min_cos_angle)
                       & (dup_d <= assoc.max_offset_dist)
                       & (fused.weight > 0)[None, :], axis=1)
    unmatched = (usable.weight > 0) & ~matches.valid & ~near_dup
    order = jnp.cumsum(unmatched.astype(jnp.int32)) - 1       # rank per obs
    slot = fused.count + order                                # target slots
    can = unmatched & (slot < M)
    slot_c = jnp.clip(slot, 0, M - 1)
    spawn_onehot = ((slot_c[:, None] == jnp.arange(M)[None, :]) & can[:, None])
    sel = spawn_onehot.astype(jnp.float32)
    normal2 = jnp.where(jnp.any(spawn_onehot, 0)[:, None],
                        jnp.einsum("pm,pi->mi", sel, n_w_obs), fused.normal)
    d2 = jnp.where(jnp.any(spawn_onehot, 0),
                   jnp.einsum("pm,p->m", sel, d_w_obs), fused.d)
    w2 = jnp.where(jnp.any(spawn_onehot, 0),
                   jnp.einsum("pm,p->m", sel, usable.weight), fused.weight)
    new_count = fused.count + jnp.sum(can).astype(jnp.int32)

    out_map = MapState(normal=normal2, d=d2, weight=w2, count=new_count)
    result = FrameResult(R=R, t=t,
                         num_matched=jnp.sum(matches.valid).astype(jnp.int32),
                         num_new=jnp.sum(can).astype(jnp.int32),
                         obs=usable, matches_lm=jnp.where(matches.valid,
                                                          matches.landmark, -1))
    return result, out_map


class PlaneSlam:
    """Streaming plane-SLAM driver (host loop; one jitted device step/frame)."""

    def __init__(self, image_height: int, image_width: int,
                 config: Config | None = None, *, max_landmarks: int = 256,
                 assoc: AssociationParams | None = None,
                 odom_iterations: int = 8, min_obs_weight: float = 0.0):
        self.height = int(image_height)
        self.width = int(image_width)
        self.config = config or Config()
        self.assoc = assoc or AssociationParams()
        self.map = init_map(max_landmarks)
        self.R = jnp.eye(3)
        self.t = jnp.zeros(3)
        self.trajectory: list[tuple[np.ndarray, np.ndarray]] = []
        self._keyframes: list = []

        extract = functools.partial(extract_plane_obs, image_height=self.height,
                                    image_width=self.width, config=self.config)
        step = functools.partial(slam_step, assoc=self.assoc,
                                 odom_iterations=odom_iterations,
                                 min_obs_weight=min_obs_weight)

        @jax.jit
        def frame_fn(points, map_state, R_prior, t_prior):
            obs = extract(points)
            return step(obs, map_state, R_prior, t_prior)

        self._frame_fn = frame_fn

    def process_frame(self, points) -> FrameResult:
        pts = jnp.asarray(points, jnp.float32)
        result, self.map = self._frame_fn(pts, self.map, self.R, self.t)
        self.R, self.t = result.R, result.t
        self.trajectory.append((np.asarray(self.R), np.asarray(self.t)))
        self._keyframes.append((np.asarray(result.obs.normal),
                                np.asarray(result.obs.d),
                                np.asarray(result.obs.weight),
                                np.asarray(result.matches_lm)))
        return result

    def build_ba_problem(self):
        """Assemble the accumulated keyframes into a BAProblem.

        Observations are the per-frame plane measurements matched to map
        landmarks during tracking; landmark initial values come from the
        current map. Refine with deplex_tpu.slam.ba.run_ba (or the sharded
        step over a mesh) and read refined poses/landmarks back.
        """
        from deplex_tpu.slam.ba import BAProblem
        from deplex_tpu.slam.planes import to_cp

        K = len(self._keyframes)
        P = self._keyframes[0][0].shape[0]
        obs_normal = np.stack([k[0] for k in self._keyframes])
        obs_d = np.stack([k[1] for k in self._keyframes])
        w = np.stack([k[2] for k in self._keyframes])
        lm = np.stack([k[3] for k in self._keyframes])
        obs_w = np.where((lm >= 0) & (w > 0), 1.0, 0.0).astype(np.float32)
        R = np.stack([p[0] for p in self.trajectory])
        t = np.stack([p[1] for p in self.trajectory])
        eta = np.asarray(to_cp(self.map.normal, self.map.d))
        return BAProblem(
            R=jnp.asarray(R), t=jnp.asarray(t), eta=jnp.asarray(eta),
            obs_normal=jnp.asarray(obs_normal), obs_d=jnp.asarray(obs_d),
            obs_lm=jnp.asarray(np.maximum(lm, 0), jnp.int32),
            obs_w=jnp.asarray(obs_w))

    def build_pose_graph(self, min_shared: int = 3):
        """Pose graph over keyframes: odometry edges between consecutive
        frames plus loop-closure edges between any pair co-observing >=
        min_shared map landmarks. Edge measurements are estimated DIRECTLY
        from the shared plane observations (frame-to-frame Gauss-Newton,
        independent of the tracked trajectory), so graph optimization can
        correct accumulated drift.
        """
        import jax.numpy as jnp

        from deplex_tpu.slam.odometry import estimate_pose
        from deplex_tpu.slam.planes import PlaneObs
        from deplex_tpu.slam.pose_graph import PoseGraph

        K = len(self._keyframes)
        lm_sets = [set(int(x) for x in kf[3] if x >= 0) for kf in self._keyframes]

        def rel_measure(a, b):
            """T_ab = T_cw(a) o T_cw(b)^-1 from shared planes; None if
            under-constrained."""
            na, da, wa, la = self._keyframes[a]
            nb, db, wb, lb = self._keyframes[b]
            shared = [(i, j) for i, li in enumerate(la) if li >= 0
                      for j, lj in enumerate(lb) if lj == li]
            if len(shared) < min_shared:
                return None
            P = la.shape[0]
            obs = PlaneObs(normal=jnp.asarray(na), d=jnp.asarray(da),
                           weight=jnp.asarray(wa), mean=jnp.zeros((P, 3)))
            match_lm = np.full(P, -1, np.int32)
            for i, j in shared:
                match_lm[i] = j
            # Treat frame b's observations as the "world" landmarks.
            Ra, ta = self.trajectory[a]
            Rb, tb = self.trajectory[b]
            R0 = jnp.asarray(Ra @ Rb.T)
            t0 = jnp.asarray(ta - Ra @ Rb.T @ tb)
            res = estimate_pose(obs, jnp.asarray(nb), jnp.asarray(db),
                                jnp.asarray(match_lm), jnp.asarray(match_lm >= 0),
                                R0, t0, iterations=6)
            return np.asarray(res.R), np.asarray(res.t)

        edges = []
        for a in range(K - 1):
            m = rel_measure(a, a + 1)
            if m is not None:
                edges.append((a, a + 1, *m, 1.0))
        for a in range(K):
            for b in range(a + 2, K):
                if len(lm_sets[a] & lm_sets[b]) >= min_shared:
                    m = rel_measure(a, b)
                    if m is not None:
                        edges.append((a, b, *m, 1.0))
        if not edges:
            raise ValueError("no pose-graph edges (no co-observed planes)")

        # Nodes in world-from-camera convention so edge measurements compose
        # as T_ab = T_cw(a) o T_cw(b)^-1 (see slam/pose_graph.py residual).
        R_wc = np.stack([R.T for R, _ in self.trajectory])
        t_wc = np.stack([-R.T @ t for R, t in self.trajectory])
        return PoseGraph(
            R=jnp.asarray(R_wc), t=jnp.asarray(t_wc),
            edge_a=jnp.asarray([e[0] for e in edges], jnp.int32),
            edge_b=jnp.asarray([e[1] for e in edges], jnp.int32),
            meas_R=jnp.asarray(np.stack([e[2] for e in edges])),
            meas_t=jnp.asarray(np.stack([e[3] for e in edges])),
            weight=jnp.asarray([e[4] for e in edges], jnp.float32))

    def optimize_trajectory(self, iterations: int = 15, min_shared: int = 3):
        """Pose-graph optimization over the keyframe trajectory (in place)."""
        from deplex_tpu.slam.pose_graph import optimize_pose_graph

        g = self.build_pose_graph(min_shared=min_shared)
        out = optimize_pose_graph(g, iterations=iterations)
        R_wc = np.asarray(out.R)
        t_wc = np.asarray(out.t)
        self.trajectory = [(R_wc[i].T, -R_wc[i].T @ t_wc[i])
                           for i in range(R_wc.shape[0])]
        self.R = jnp.asarray(self.trajectory[-1][0])
        self.t = jnp.asarray(self.trajectory[-1][1])
        return out

    def refine(self, iterations: int = 10, damping: float = 1e-4):
        """Run windowed BA over all keyframes; updates trajectory + map."""
        from deplex_tpu.slam.ba import run_ba
        from deplex_tpu.slam.planes import from_cp

        out = run_ba(self.build_ba_problem(), iterations=iterations,
                     damping=damping)
        self.trajectory = [(np.asarray(out.R[i]), np.asarray(out.t[i]))
                           for i in range(out.R.shape[0])]
        n, d = from_cp(out.eta)
        self.map = self.map._replace(normal=n, d=d)
        self.R = jnp.asarray(self.trajectory[-1][0])
        self.t = jnp.asarray(self.trajectory[-1][1])
        return out
