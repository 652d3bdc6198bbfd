"""Tracking front-end: frame preprocessing + pose estimation.

Mirrors the reference ``SLAM/multiprocess/tracker.py`` Tracker:
``map_preprocess`` builds the filtered depth / vertex / normal / confidence
maps (one fused jitted pipeline instead of a chain of torch calls), and
``tracking`` dispatches gt-pose / ICP / ICP+backend pose estimation, then
lifts the maps to world space.  The optional ORB-SLAM2-style backend is an
injected host-side pose service implementing the reference binding API
(``tracker.py:225-260``); a fake in-process implementation ships for tests.
"""

from __future__ import annotations

import os
import time as time_mod
from collections import defaultdict
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.camera import Camera
from ..ops import preprocess
from ..ops.icp import (IcpTracker, build_icp_pyramids, fuse_model_depth,
                       icp_solve_all_levels)
from ..utils import traj as traj_utils
from ..utils.geometry import world_to_view
from ..utils.perf import span


@partial(jax.jit, static_argnames=("use_filter",))
def preprocess_frame(depth: jnp.ndarray, color: jnp.ndarray, K: jnp.ndarray,
                     min_depth: float, max_depth: float,
                     confidence_thresh: float, use_filter: bool):
    """Fused per-frame preprocessing (reference ``map_preprocess``,
    tracker.py:97-159): optional bilateral filter, depth-range gate,
    vertex/normal/confidence maps, low-confidence invalidation."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    if use_filter:
        d = preprocess.bilateral_filter(d, 5, 2.0, 2.0)
    d = jnp.where((d > min_depth) & (d < max_depth), d, 0.0)
    vertex_c = preprocess.compute_vertex_map(d, K)
    normal_c = preprocess.compute_normal_map(vertex_c)
    confidence = preprocess.compute_confidence_map(normal_c, K)

    invalid = jnp.all(normal_c == 0, axis=-1) | (confidence[..., 0] < confidence_thresh)
    d = jnp.where(invalid, 0.0, d)
    normal_c = jnp.where(invalid[..., None], 0.0, normal_c)
    vertex_c = jnp.where(invalid[..., None], 0.0, vertex_c)
    confidence = jnp.where(invalid[..., None], 0.0, confidence)
    return {
        "depth_map": d[..., None],
        "color_map": color,
        "normal_map_c": normal_c,
        "vertex_map_c": vertex_c,
        "confidence_map": confidence,
        "invalid_confidence_mask": invalid,
    }


@jax.jit
def lift_to_world(vertex_c: jnp.ndarray, normal_c: jnp.ndarray, c2w: jnp.ndarray):
    rot_only = jnp.eye(4).at[:3, :3].set(c2w[:3, :3])
    return (preprocess.transform_map(vertex_c, c2w),
            preprocess.transform_map(normal_c, rot_only))


def _lift(fm: dict, c2w: jnp.ndarray) -> dict:
    rot_only = jnp.eye(4).at[:3, :3].set(c2w[:3, :3])
    fm["vertex_map_w"] = preprocess.transform_map(fm["vertex_map_c"], c2w)
    fm["normal_map_w"] = preprocess.transform_map(fm["normal_map_c"], rot_only)
    return fm


@partial(jax.jit, static_argnames=(
    "min_depth", "max_depth", "confidence_thresh", "use_filter"))
def preprocess_and_lift(depth, color, K, c2w, min_depth, max_depth,
                        confidence_thresh, use_filter):
    """Preprocess + world lift in one executable, for poses known up front
    (gt mode and the first frame)."""
    fm = preprocess_frame.__wrapped__(
        depth, color, K, min_depth, max_depth, confidence_thresh, use_filter)
    return _lift(fm, c2w)


# ICP-failure gate thresholds (see IcpTracker.predict_pose rationale)
_GATE_DELTA_M = 0.01
_GATE_COS = float(np.cos(np.deg2rad(1.0)))


@partial(jax.jit, static_argnames=(
    "min_depth", "max_depth", "confidence_thresh", "use_filter",
    "use_model", "use_motion_model", "downscales", "iters", "association",
    "levels", "damping", "distance_threshold", "normal_threshold",
    "sample_distance_threshold", "sample_normal_threshold", "fail_threshold"))
def fused_icp_track_step(
        depth, color, K,
        t0_depth, render_depth, render_normal, frame_normal_w,
        prev_c2w, last_rel, prior_valid,
        *, min_depth, max_depth, confidence_thresh, use_filter,
        use_model, use_motion_model, downscales, iters, association, levels,
        damping, distance_threshold, normal_threshold,
        sample_distance_threshold, sample_normal_threshold, fail_threshold):
    """One ICP-tracked frame as a SINGLE executable.

    Fuses the whole reference tracking chain (tracker.py:97-293 +
    icp.py:385-452): preprocess -> current-frame pyramids -> model-depth
    fusion -> target pyramids -> coarse-to-fine GN solve -> failure gate ->
    pose composition -> world-space map lift.  The reference runs these as
    ~6 separate device round trips plus 2 blocking host syncs per frame; on
    a TPU every dispatch pays launch (and, here, tunnel) latency, so the
    host sees exactly one dispatch and fetches one (pose, p2p, success)
    tuple per frame.

    The failure gate (accept / coast-on-prediction) runs on-device so the
    lifted maps never wait on a host decision.
    """
    fm = preprocess_frame.__wrapped__(
        depth, color, K, min_depth, max_depth, confidence_thresh, use_filter)
    v1, n1 = build_icp_pyramids.__wrapped__(fm["depth_map"], K, levels)
    if use_model:
        t0 = fuse_model_depth.__wrapped__(
            render_depth, t0_depth, render_normal, frame_normal_w,
            sample_distance_threshold, sample_normal_threshold)
    else:
        t0 = t0_depth
    v0, n0 = build_icp_pyramids.__wrapped__(t0, K, levels)

    pose_init = last_rel if use_motion_model else jnp.eye(4, dtype=jnp.float32)
    pose10, p2p = icp_solve_all_levels.__wrapped__(
        pose_init, tuple(v1), tuple(v0), tuple(n1), tuple(n0), K,
        downscales, iters, damping, distance_threshold, normal_threshold,
        association)
    success = p2p <= fail_threshold

    with jax.default_matmul_precision("highest"):
        if use_motion_model:
            delta = jnp.linalg.norm(pose10[:3, 3] - last_rel[:3, 3])
            cos_ang = jnp.clip(
                (jnp.trace(pose10[:3, :3].T @ last_rel[:3, :3]) - 1.0) / 2.0,
                -1.0, 1.0)
            # bootstrap: with no trusted prior yet (first ICP frame) the
            # gate would compare against a stale identity and could coast
            # forever on fast sequences — accept the solve instead
            coast = (~success) & prior_valid \
                & ((delta > _GATE_DELTA_M) | (cos_ang < _GATE_COS))
            pose_used = jnp.where(coast, last_rel, pose10)
            new_last_rel = pose_used
            # report "pose accepted": p2p-MSE trips on depth-edge outliers
            # while the solved pose is fine (consistent with the motion
            # model); a hard failure is only the coast case
            success = ~coast
        else:
            pose_used = pose10
            new_last_rel = jnp.where(success, pose10, jnp.eye(4, pose10.dtype))
        c2w = prev_c2w @ pose_used
    fm = _lift(fm, c2w)
    return fm, c2w, pose_used, new_last_rel, p2p, success


class Tracker:
    def __init__(self, args, orb_backend=None):
        self.use_gt_pose = bool(args.use_gt_pose)
        self.min_depth = float(args.min_depth)
        self.max_depth = float(args.max_depth)
        self.depth_filter = bool(args.depth_filter)
        self.invalid_confidence_thresh = float(args.invalid_confidence_thresh)
        self.verbose = bool(args.verbose)

        self.icp = IcpTracker(args)
        self.status = defaultdict(bool)
        self.pose_gt = []
        self.pose_es = []
        self.timestamps = []
        self.K = None

        self.use_orb_backend = bool(args.use_orb_backend)
        self.orb_useicp = bool(getattr(args, "orb_useicp", True))
        self.orb_backend = orb_backend
        if self.use_orb_backend and self.orb_backend is None:
            from .pose_backend import create_backend
            self.orb_backend = create_backend(args)

        # fused single-dispatch tracking (gt / pure-ICP modes); the ORB
        # backend path keeps the staged pipeline because the pose decision
        # crosses to the host mid-frame
        self.fused = not (self.use_orb_backend and not self.use_gt_pose)

        # loop detection + ICP verification.  Backend mode feeds the
        # backend's pose graph (reference gets this from ORB-SLAM2's DBoW2
        # place recognition).  The fused pure-ICP path can opt in with
        # ``loop_closure_pure_icp`` — an extension beyond the reference,
        # whose pure-ICP configs have no closure (base.yaml:105); the pose
        # graph is then relaxed host-side (pose_backend.relax_pose_graph)
        # and re-applied through get_new_poses -> mapper.update_poses.
        self.loop_closer = None
        lc_flag = bool(getattr(args, "use_loop_closure", True))
        if self.fused:
            enable_lc = lc_flag and bool(
                getattr(args, "loop_closure_pure_icp", False)) \
                and not self.use_gt_pose
        else:
            enable_lc = lc_flag
        if enable_lc:
            from .loop_closure import LoopCloser
            self.loop_closer = LoopCloser(args)
        self._loops = []                 # fused-path pose-graph constraints
        self._corrected_poses = None     # pending relaxed history for mapper
        self._backend_camera_set = False
        self._prev_depth = None          # previous frame's filtered depth
        self._model_feedback = None      # (render_d, frame_d, render_n, frame_n)
        self._last_rel_dev = None
        self._prev_c2w = np.eye(4, dtype=np.float32)
        self._frame_count = 0
        self._zero3 = None

    # ------------------------------------------------------------------
    def map_preprocess(self, frame: Camera, frame_id: int) -> Dict[str, jnp.ndarray]:
        K = jnp.asarray(frame.intrinsic)
        if self.K is None:
            self.K = K
        if self.use_orb_backend and not self._backend_camera_set:
            # intrinsics + raw-depth scale enable the backend's real
            # feature tracking (native/pose_backend.cc feature_track)
            set_cam = getattr(self.orb_backend, "set_camera", None)
            if set_cam is not None:
                set_cam(np.asarray(frame.intrinsic), frame.image_width,
                        frame.image_height, frame.depth_scale)
            self._backend_camera_set = True
        self.curr_frame = {
            "frame_id": frame_id,
            "timestamp": frame.timestamp,
            "pose_gt": frame.pose_gt,
            "color_u8": None,
            "depth_u16": None,
        }
        if self.use_orb_backend:
            # backend consumes raw sensor units (metres * depth_scale)
            self.curr_frame["color_u8"] = (np.asarray(frame.image) * 255).astype(np.uint8)
            self.curr_frame["depth_u16"] = (
                np.asarray(frame.depth[..., 0]) * frame.depth_scale
            ).astype(np.uint16)
        if self.fused:
            # all device work is deferred into tracking()'s single fused
            # dispatch; the frame_map dict is filled there
            return {"time": frame_id}
        depth = jnp.asarray(frame.depth, jnp.float32)
        color = jnp.asarray(frame.image, jnp.float32)
        frame_map = preprocess_frame(
            depth, color, K, self.min_depth, self.max_depth,
            self.invalid_confidence_thresh, self.depth_filter)
        frame_map["time"] = frame_id
        self.icp.update_curr_status(frame_map["depth_map"], K)
        return frame_map

    # ------------------------------------------------------------------
    def _refine_with_backend(self, pose_t1_t0: np.ndarray, icp_ok: bool) -> np.ndarray:
        """Seed the backend with the ICP relative pose, or fall back to pure
        feature tracking on ICP failure (reference tracker.py:225-244)."""
        if icp_ok and self.orb_useicp:
            self.orb_backend.track_with_icp_pose(
                self.curr_frame["color_u8"], self.curr_frame["depth_u16"],
                pose_t1_t0.astype(np.float32), self.curr_frame["timestamp"])
        else:
            self.orb_backend.track_with_orb_feature(
                self.curr_frame["color_u8"], self.curr_frame["depth_u16"],
                self.curr_frame["timestamp"])
        rows = self.orb_backend.get_trajectory_points()
        # the backend's windowed refinement (native pose_backend.cc
        # window_refine) may have moved RECENT poses, not just appended one —
        # adopt the refreshed tail so ATE/trajectory exports see the refined
        # history (the mapper gets it via get_new_poses either way)
        tail_n = min(len(self.pose_es), 8)
        if tail_n:
            tail, _ = convert_poses(rows[-(tail_n + 1):-1])
            for k, p in enumerate(tail):
                self.pose_es[len(self.pose_es) - len(tail) + k] = p
        poses, _ = convert_poses(rows[-1:])
        return poses[-1]

    def tracking(self, frame: Camera, frame_map: Dict[str, jnp.ndarray]) -> bool:
        self.pose_gt.append(np.asarray(self.curr_frame["pose_gt"]))
        self.timestamps.append(self.curr_frame["timestamp"])
        if self.fused:
            return self._tracking_fused(frame, frame_map)
        success = True
        if self.use_gt_pose:
            pose_t1_w = self.pose_gt[-1]
        elif not self.status["initialized"]:
            if self.use_orb_backend:
                self.orb_backend.process_image_rgbd(
                    self.curr_frame["color_u8"], self.curr_frame["depth_u16"],
                    self.curr_frame["timestamp"])
            self.status["initialized"] = True
            pose_t1_w = np.eye(4)
        else:
            # predict_pose returns success=False only on HARD failures (the
            # solve jumped away from the motion model AND the residual
            # metric fired) — soft metric noise is absorbed inside
            pose_t1_t0, success = self.icp.predict_pose()
            if not success and self.loop_closer is not None:
                # relocalize against stored keyframes (reference recovers
                # through ORB-SLAM2 feature relocalization, tracker.py:236-244)
                guess = self.pose_es[-1] @ np.asarray(pose_t1_t0)
                reloc = self.loop_closer.relocalize(
                    self.curr_frame["frame_id"], guess,
                    frame_map["depth_map"], self.K,
                    color_map=frame_map.get("color_map"))
                if reloc is not None:
                    pose_t1_t0 = np.linalg.inv(self.pose_es[-1]) @ reloc
                    self.icp.reset_prior(pose_t1_t0)
                    success = True
                    self.status["relocalized"] = \
                        int(self.status.get("relocalized", 0)) + 1
            if self.use_orb_backend:
                pose_t1_w = self._refine_with_backend(pose_t1_t0, success)
            else:
                pose_t1_w = self.pose_es[-1] @ pose_t1_t0

        self.icp.move_last_status()
        self.pose_es.append(np.asarray(pose_t1_w))

        if self.loop_closer is not None and not self.use_gt_pose:
            loop = self.loop_closer.observe(
                self.curr_frame["frame_id"], pose_t1_w,
                frame_map["depth_map"], self.K,
                color_map=frame_map.get("color_map"))
            if loop is not None:
                i, j, T_ij = loop
                self.orb_backend.add_loop_constraint(i, j, T_ij)
                # adopt the relaxed history (including this frame's pose)
                corrected, _ = convert_poses(
                    self.orb_backend.get_trajectory_points())
                if len(corrected) == len(self.pose_es):
                    self.pose_es = corrected
                    pose_t1_w = corrected[-1]
                    # re-anchor the loop store too, or a later relocalize
                    # would resurrect the drift this closure just removed
                    self.loop_closer.update_poses(corrected)
                self.status["loops_closed"] = \
                    int(self.status.get("loops_closed", 0)) + 1

        frame.update_pose(pose_t1_w)

        vertex_w, normal_w = lift_to_world(
            frame_map["vertex_map_c"], frame_map["normal_map_c"],
            jnp.asarray(frame.c2w, jnp.float32))
        frame_map["vertex_map_w"] = vertex_w
        frame_map["normal_map_w"] = normal_w
        return success

    def _tracking_fused(self, frame: Camera, frame_map: Dict) -> bool:
        """gt / pure-ICP tracking with ONE device dispatch per frame."""
        with span("track.upload"):
            depth = jnp.asarray(frame.depth, jnp.float32)
            color = jnp.asarray(frame.image, jnp.float32)
        icp = self.icp
        success = True
        if self.use_gt_pose or not self.status["initialized"]:
            pose_t1_w = (self.pose_gt[-1] if self.use_gt_pose
                         else np.eye(4, dtype=np.float32))
            fm = preprocess_and_lift(
                depth, color, self.K, jnp.asarray(pose_t1_w, jnp.float32),
                self.min_depth, self.max_depth,
                self.invalid_confidence_thresh, self.depth_filter)
            self.status["initialized"] = True
        else:
            self._frame_count += 1
            feedback = self._model_feedback
            use_model = (icp.use_model_depth and feedback is not None
                         and self._frame_count >= icp.warmup_frames)
            if use_model:
                render_d, t0_depth, render_n, frame_n = feedback
            else:
                t0_depth = self._prev_depth
                if self._zero3 is None:
                    self._zero3 = jnp.zeros(t0_depth.shape[:2] + (3,))
                render_d, render_n, frame_n = t0_depth, self._zero3, self._zero3
            if self._last_rel_dev is None:
                self._last_rel_dev = jnp.eye(4, dtype=jnp.float32)
            with span("track.dispatch"):
                fm, c2w, _, new_last_rel, p2p, ok = fused_icp_track_step(
                    depth, color, self.K,
                    t0_depth, render_d, render_n, frame_n,
                    jnp.asarray(self._prev_c2w, jnp.float32), self._last_rel_dev,
                    jnp.asarray(self._frame_count >= 2),
                    min_depth=self.min_depth, max_depth=self.max_depth,
                    confidence_thresh=self.invalid_confidence_thresh,
                    use_filter=self.depth_filter, use_model=use_model,
                    use_motion_model=icp.use_motion_model,
                    downscales=tuple(icp.downscales), iters=tuple(icp.iters),
                    association=icp.association, levels=icp.levels,
                    damping=icp.damping,
                    distance_threshold=icp.distance_threshold,
                    normal_threshold=icp.normal_threshold,
                    sample_distance_threshold=icp.sample_distance_threshold,
                    sample_normal_threshold=icp.sample_normal_threshold,
                    fail_threshold=icp.fail_threshold)
            self._last_rel_dev = new_last_rel
            # the ONLY per-frame device->host fetch: pose + success scalar
            with span("track.pose_fetch"):
                pose_t1_w, success = jax.device_get((c2w, ok))
            success = bool(success)
            if not success and self.loop_closer is not None:
                # relocalize against stored keyframes (staged-path twin at
                # tracking(); reference recovers via ORB-SLAM2 features)
                reloc = self.loop_closer.relocalize(
                    self.curr_frame["frame_id"],
                    np.asarray(pose_t1_w, np.float64),
                    fm["depth_map"], self.K,
                    color_map=fm.get("color_map"))
                if reloc is not None:
                    pose_t1_w = np.asarray(reloc, np.float32)
                    rel = np.linalg.inv(self._prev_c2w) @ pose_t1_w
                    self._last_rel_dev = jnp.asarray(rel, jnp.float32)
                    fm = _lift(fm, jnp.asarray(pose_t1_w, jnp.float32))
                    success = True
                    self.status["relocalized"] = \
                        int(self.status.get("relocalized", 0)) + 1

        self._prev_depth = fm["depth_map"]
        self._model_feedback = None
        fm["time"] = frame_map.get("time", self.curr_frame["frame_id"])
        frame_map.update(fm)
        self.pose_es.append(np.asarray(pose_t1_w))

        if self.loop_closer is not None and not self.use_gt_pose:
            loop = self.loop_closer.observe(
                self.curr_frame["frame_id"], np.asarray(pose_t1_w, np.float64),
                fm["depth_map"], self.K,
                color_map=fm.get("color_map"))
            if loop is not None:
                from .pose_backend import relax_pose_graph

                i, j, T_ij = loop
                self._loops.append((i, j, np.asarray(T_ij, np.float64), 1.0))
                corrected = relax_pose_graph(self.pose_es, self._loops)
                self.pose_es = [np.asarray(p) for p in corrected]
                pose_t1_w = np.asarray(self.pose_es[-1], np.float32)
                # re-anchor the loop store or a later relocalize would
                # resurrect the drift this closure just removed
                self.loop_closer.update_poses(self.pose_es)
                # hand the relaxed history to the mapper (update_poses)
                self._corrected_poses = list(self.pose_es)
                fm = _lift(fm, jnp.asarray(pose_t1_w, jnp.float32))
                frame_map.update(fm)
                self.status["loops_closed"] = \
                    int(self.status.get("loops_closed", 0)) + 1

        self._prev_c2w = np.asarray(pose_t1_w, np.float32)
        frame.update_pose(np.asarray(pose_t1_w, np.float64))
        return success

    # ------------------------------------------------------------------
    def update_last_status(self, frame, render_depth, frame_depth,
                           render_normal, frame_normal):
        """Feed the mapper's rendered model depth back into the ICP target
        (frame-to-model tracking, reference slam.py:83-89).  On the fused
        path the fuse itself happens inside the next frame's single
        dispatch; here we only stash the device arrays."""
        if self.fused:
            self._model_feedback = (render_depth, frame_depth,
                                    render_normal, frame_normal)
            return
        self.icp.update_last_status(render_depth, frame_depth,
                                    render_normal, frame_normal)

    def get_new_poses(self):
        if self.use_orb_backend and not self.use_gt_pose:
            poses, _ = convert_poses(self.orb_backend.get_trajectory_points())
            return poses
        if self._corrected_poses is not None:
            # fused-path pose-graph relaxation pending: hand it over once
            poses, self._corrected_poses = self._corrected_poses, None
            return poses
        return None

    # ------------------------------------------------------------------
    def save_invalid_tracking(self, path: str, threshold: float = 0.15) -> bool:
        """Dump the ICP pyramids when the estimated pose drifted badly from
        ground truth, for postmortem (reference tracker.py:76-95)."""
        if not self.pose_es or not self.pose_gt:
            return False
        err = np.linalg.norm(self.pose_es[-1][:3, 3] - self.pose_gt[-1][:3, 3])
        if err <= threshold:
            return False
        os.makedirs(path, exist_ok=True)
        frame_id = len(self.pose_es)
        payload = {}
        for name, pyr in (("vertex_t0", self.icp.vertex_t0),
                          ("vertex_t1", self.icp.vertex_t1),
                          ("normal_t0", self.icp.normal_t0),
                          ("normal_t1", self.icp.normal_t1)):
            if pyr is not None:
                for lvl, arr in enumerate(pyr):
                    payload[f"{name}_l{lvl}"] = np.asarray(arr)
        np.savez_compressed(
            os.path.join(path, f"invalid_tracking_{frame_id}.npz"), **payload)
        return True

    def eval_ate(self, frame_id: int = -1) -> float:
        n = len(self.pose_es) if frame_id == -1 else frame_id
        return traj_utils.ate_rmse(
            np.stack(self.pose_gt[:n])[:, :3, 3],
            np.stack(self.pose_es[:n])[:, :3, 3])

    def save_traj(self, save_path: str) -> float:
        save_dir = os.path.join(save_path, "save_traj")
        if not self.use_gt_pose and self.use_orb_backend:
            self.pose_es, _ = convert_poses(self.orb_backend.get_trajectory_points())
        traj_utils.save_traj_npy(save_dir, self.pose_es, self.pose_gt)
        ate = traj_utils.save_ate_plots(save_dir, self.pose_es, self.pose_gt)
        traj_utils.save_traj_tum(
            os.path.join(save_dir, "traj_tum.txt"), self.pose_es, self.timestamps)
        if self.use_orb_backend:
            self.orb_backend.shutdown()
        return ate


def convert_poses(rows):
    """Backend trajectory rows (stamp, r00..r22 | t interleaved) -> 4x4 poses
    (reference tracker.py:16-26)."""
    poses, stamps = [], []
    for row in rows:
        stamp, r00, r01, r02, t0, r10, r11, r12, t1, r20, r21, r22, t2 = row
        pose = np.eye(4)
        pose[:3, :3] = [[r00, r01, r02], [r10, r11, r12], [r20, r21, r22]]
        pose[:3, 3] = [t0, t1, t2]
        poses.append(pose)
        stamps.append(stamp)
    return poses, stamps
