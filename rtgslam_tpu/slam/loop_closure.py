"""Loop detection + geometric verification for the pose backend.

The reference gets loop closure for free from its ORB-SLAM2 backend (DBoW2
place recognition + pose-graph optimization inside the C++ system,
``thirdParty/ORB-SLAM2-PYBIND``; the corrected trajectory is re-applied by
``mapper.update_poses``, mapper.py:134-141).  This framework's backend is an
odometry/pose-graph store (``native/pose_backend.cc``), so detection is done
here on the host:

  1. candidate gating: an earlier keyframe whose estimated camera center is
     within ``radius`` metres, whose viewing direction agrees within
     ``angle_deg``, and which is at least ``min_gap`` frames old;
  2. geometric verification: the *jitted ICP pyramid solve* (the same
     executable the tracker uses) aligns the candidate's stored depth map
     with the current one, seeded by the estimated relative pose;  the
     point-to-plane residual of the converged solve accepts or rejects;
  3. on acceptance, the caller feeds ``(i, j, T_ij)`` to
     ``backend.add_loop_constraint`` and the relaxed trajectory flows back
     through ``tracker.get_new_poses() -> mapper.update_poses``.

Depth maps are stored on host RAM (keyframe-rate, like the reference's
keyframe CPU offload) and pushed to the device only for verification.

Step 1 has TWO detectors, mirroring the split inside ORB-SLAM2:

  1a. pose gate — an earlier keyframe whose *estimated* camera center is
      within ``radius`` metres (cheap, exact while drift is small);
  1b. appearance gate (the DBoW2 place-recognition role) — a global
      per-keyframe descriptor (illumination-normalized grayscale thumbnail
      ⊕ scale-normalized depth thumbnail) matched by cosine similarity
      against the whole store.  Unlike 1a it never consults the estimated
      pose, so a loop whose accumulated drift exceeds the pose gate is
      still found — the exact regime loop closure exists for.  Appearance
      candidates are ICP-verified from an ADDITIONAL identity seed: a
      thumbnail match implies a near-identical viewpoint, so the true
      relative pose is near identity regardless of how far the estimates
      have drifted.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.icp import build_icp_pyramids, icp_solve_all_levels

# global-descriptor thumbnail grid (rows, cols); 12x16 ~= the 4:3 / 16:9
# frame aspect, 384-dim descriptor = 1.5 KB/keyframe
_DESC_SHAPE = (12, 16)


def _thumbnail(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Block-mean downsample [H, W] -> [th, tw] (crop to multiples)."""
    H, W = img.shape[:2]
    hs, ws = max(H // th, 1), max(W // tw, 1)
    th, tw = min(th, H), min(tw, W)
    crop = img[: hs * th, : ws * tw]
    return crop.reshape(th, hs, tw, ws).mean(axis=(1, 3))


def _descriptor(color: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """Unit-norm global appearance descriptor: zero-mean/unit-norm grayscale
    thumbnail (illumination invariant) ⊕ zero-mean/unit-norm depth thumbnail
    (geometry signature).  Plays the role of the reference's DBoW2 bag-of-
    words image signature (ORB-SLAM2 place recognition; fallback contract
    reference SLAM/multiprocess/tracker.py:236-244) — cosine similarity in
    this space recognizes a revisited viewpoint independent of the pose
    estimate."""
    th, tw = _DESC_SHAPE
    gray = color.mean(axis=-1) if color.ndim == 3 else color
    parts = []
    for img in (gray.astype(np.float32), depth.astype(np.float32)):
        t = _thumbnail(img, th, tw).ravel()
        t -= t.mean()
        t /= np.linalg.norm(t) + 1e-8
        parts.append(t)
    return np.concatenate(parts) / np.sqrt(2.0)


class LoopCloser:
    def __init__(self, args):
        self.every = int(getattr(args, "loop_check_every", 5))
        self.min_gap = int(getattr(args, "loop_min_gap", 30))
        self.radius = float(getattr(args, "loop_candidate_radius", 0.4))
        self.angle_deg = float(getattr(args, "loop_candidate_angle", 30.0))
        # appearance (place-recognition) gate: min cosine similarity of the
        # global descriptors; <= 0 disables the appearance detector
        self.appearance_sim = float(
            getattr(args, "loop_appearance_sim", 0.92))
        self.p2p_accept = float(getattr(args, "loop_p2p_accept",
                                        getattr(args, "icp_fail_threshold", 5e-5)))
        self.min_valid_depth = 0.05   # reject views with no geometry
        self.cooldown = int(getattr(args, "loop_cooldown", 20))
        # relocalization accepts a looser residual than loop closure: the
        # seed pose is already known-bad, convergence basin matters more
        self.reloc_accept = float(getattr(args, "reloc_p2p_accept",
                                          4.0 * self.p2p_accept))

        self.downscales = list(args.icp_downscales)
        self.iters = list(args.icp_downscale_iters)
        self.levels = len(self.downscales)
        self.damping = float(args.icp_damping)
        self.distance_threshold = float(args.icp_distance_threshold)
        self.normal_threshold = float(
            np.cos(np.deg2rad(args.icp_normal_threshold)))
        self.association = str(getattr(args, "icp_association", "bilinear"))

        # bound host RAM: records hold a full-res f32 depth map each
        # (~3.3 MB at 680x1200).  When the cap is hit the store is thinned
        # to every other record and the sampling stride doubles — coverage
        # of the whole trajectory is preserved at half the density, the way
        # the reference bounds keyframes via its CPU-offload window.
        self.max_records = int(getattr(args, "loop_max_records", 256))
        self.records: List[Dict] = []
        self._last_closure = -(10 ** 9)

    # ------------------------------------------------------------------
    def observe(self, frame_id: int, c2w_est: np.ndarray,
                depth_map, K,
                color_map=None) -> Optional[Tuple[int, int, np.ndarray]]:
        """Record the frame (every ``every`` frames) and return a verified
        loop ``(i, j, T_ij)`` with ``T_ij = c2w_i^-1 c2w_j`` or None.

        ``color_map`` (optional [H, W, 3]) enables the appearance detector;
        without it only the pose gate runs (depth-only callers/tests)."""
        if frame_id % self.every != 0:
            return None
        depth_np = np.asarray(depth_map, np.float32)
        if depth_np.ndim == 3:
            depth_np = depth_np[..., 0]
        rec = {"id": frame_id, "c2w": np.asarray(c2w_est, np.float64),
               "depth": depth_np,
               "valid": float((depth_np > 0).mean()),
               "desc": None if color_map is None else _descriptor(
                   np.asarray(color_map, np.float32), depth_np)}
        result = None
        if rec["valid"] >= self.min_valid_depth \
                and frame_id - self._last_closure >= self.cooldown:
            cand, seeds = self._best_candidate(rec), ("est",)
            if cand is None:
                # pose gate found nothing (drift may exceed the radius):
                # fall back to place recognition + drift-independent seed
                cand = self._best_appearance(rec)
                seeds = ("est", "identity")
            if cand is not None:
                T_ij, p2p = self._verify(cand, rec, K, seeds)
                if p2p <= self.p2p_accept:
                    self._last_closure = frame_id
                    result = (cand["id"], frame_id, T_ij)
        self.records.append(rec)
        if len(self.records) > self.max_records:
            self.records = self.records[::2]
            self.every *= 2
        return result

    # ------------------------------------------------------------------
    def update_poses(self, corrected: List[np.ndarray]) -> None:
        """Re-anchor stored records after a pose-graph relaxation.

        The tracker adopts the relaxed trajectory (``pose_es = corrected``);
        records frozen at observation time would otherwise keep the drifted
        estimates, and a later ``relocalize`` would re-inject exactly the
        drift the closure removed."""
        n = len(corrected)
        for rec in self.records:
            if rec["id"] < n:
                rec["c2w"] = np.asarray(corrected[rec["id"]], np.float64)

    # ------------------------------------------------------------------
    def _best_candidate(self, rec) -> Optional[Dict]:
        best, best_d = None, np.inf
        c = rec["c2w"][:3, 3]
        view = rec["c2w"][:3, 2]
        cos_thresh = np.cos(np.deg2rad(self.angle_deg))
        for old in self.records:
            if rec["id"] - old["id"] < self.min_gap:
                continue
            if old["valid"] < self.min_valid_depth:
                continue
            d = np.linalg.norm(old["c2w"][:3, 3] - c)
            if d > self.radius or d >= best_d:
                continue
            if float(old["c2w"][:3, 2] @ view) < cos_thresh:
                continue
            best, best_d = old, d
        return best

    def _best_appearance(self, rec) -> Optional[Dict]:
        """Place recognition: best cosine-similarity record above the gate
        (the DBoW2 role — never consults the estimated pose)."""
        if rec["desc"] is None or self.appearance_sim <= 0:
            return None
        best, best_s = None, self.appearance_sim
        for old in self.records:
            if rec["id"] - old["id"] < self.min_gap:
                continue
            if old["valid"] < self.min_valid_depth or old["desc"] is None:
                continue
            s = float(old["desc"] @ rec["desc"])
            if s > best_s:
                best, best_s = old, s
        return best

    def relocalize(self, frame_id: int, c2w_guess: np.ndarray,
                   depth_map, K, max_candidates: int = 3,
                   color_map=None) -> Optional[np.ndarray]:
        """Recover the camera pose after a tracking failure by ICP-aligning
        the current depth against the nearest stored keyframes.

        The reference recovers through ORB-SLAM2's DBoW2 relocalization
        (``track_with_orb_feature`` falling back to feature matching,
        reference tracker.py:236-244 + ORB-SLAM2 Tracking::Relocalization);
        here candidates come from estimated-center proximity to the last
        good pose — plus, when ``color_map`` is given, the best appearance
        match (place recognition; works even when the guess is garbage) —
        and verification is geometric.  Returns the corrected c2w or None
        if no candidate aligns within ``reloc_accept``."""
        depth_np = np.asarray(depth_map, np.float32)
        if depth_np.ndim == 3:
            depth_np = depth_np[..., 0]
        if (depth_np > 0).mean() < self.min_valid_depth:
            return None
        c = np.asarray(c2w_guess, np.float64)[:3, 3]
        cands = sorted(
            (r for r in self.records if r["valid"] >= self.min_valid_depth),
            key=lambda r: np.linalg.norm(r["c2w"][:3, 3] - c))
        rec = {"id": frame_id, "c2w": np.asarray(c2w_guess, np.float64),
               "depth": depth_np,
               "desc": None if color_map is None else _descriptor(
                   np.asarray(color_map, np.float32), depth_np)}
        trials = [(cand, ("est",)) for cand in cands[:max_candidates]]
        app = self._best_appearance(dict(rec, id=10 ** 9)) \
            if rec["desc"] is not None else None
        if app is not None and all(c is not app for c, _ in trials):
            trials.append((app, ("est", "identity")))
        best_pose, best_p2p = None, np.inf
        for cand, seeds in trials:
            T_ij, p2p = self._verify(cand, rec, K, seeds)
            if p2p <= self.reloc_accept and p2p < best_p2p:
                best_pose, best_p2p = cand["c2w"] @ T_ij, p2p
        return best_pose

    def _verify(self, cand, rec, K,
                seeds: Tuple[str, ...] = ("est",)) -> Tuple[np.ndarray, float]:
        """ICP-align current depth (t1) against the candidate's (t0); returns
        the lowest-residual (refined T_ij, residual) over the requested
        seeds.  ``"est"`` seeds from the drifted estimates; ``"identity"``
        from T_ij = I — the right basin for appearance candidates (a
        thumbnail match implies a near-identical viewpoint) no matter how
        large the accumulated drift is."""
        K = jnp.asarray(K, jnp.float32)
        v0, n0 = build_icp_pyramids(jnp.asarray(cand["depth"]), K, self.levels)
        v1, n1 = build_icp_pyramids(jnp.asarray(rec["depth"]), K, self.levels)
        best = (np.eye(4), np.inf)
        for kind in seeds:
            seed = jnp.asarray(
                np.linalg.inv(cand["c2w"]) @ rec["c2w"], jnp.float32) \
                if kind == "est" else jnp.eye(4, dtype=jnp.float32)
            pose10, p2p = icp_solve_all_levels(
                seed, tuple(v1), tuple(v0), tuple(n1), tuple(n0), K,
                jnp.asarray(self.downscales, jnp.float32), tuple(self.iters),
                self.damping, self.distance_threshold, self.normal_threshold,
                self.association)
            p2p = float(p2p)
            if p2p < best[1]:
                best = (np.asarray(pose10, np.float64), p2p)
        return best
