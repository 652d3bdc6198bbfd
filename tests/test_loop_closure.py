"""Loop closure: pose-graph relaxation, detection/verification, and the
drift-correction contract (reference: ORB-SLAM2 backend loop closing whose
corrected trajectory the mapper re-applies, tracker.py:225-260 +
mapper.py:134-141)."""

import copy
import os

import numpy as np
import pytest

from rtgslam_tpu.slam.pose_backend import (FakePoseBackend, relax_pose_graph)


def _chain_with_drift(n, step=0.02, bias=0.002):
    """Ground-truth straight-line poses + drifted estimates."""
    gt, est = [], []
    for i in range(n):
        g = np.eye(4)
        g[0, 3] = step * i
        gt.append(g)
        e = g.copy()
        e[2, 3] = bias * i     # linear drift in z
        est.append(e)
    return gt, est


def _ate(a, b):
    a = np.stack([p[:3, 3] for p in a])
    b = np.stack([p[:3, 3] for p in b])
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=-1))))


def test_relax_pose_graph_reduces_drift():
    gt, est = _chain_with_drift(30)
    T_ij = np.linalg.inv(gt[0]) @ gt[29]         # perfect loop measurement
    before = _ate(gt, est)
    relaxed = relax_pose_graph(est, [(0, 29, T_ij, 5.0)], iterations=200)
    after = _ate(gt, relaxed)
    assert after < 0.5 * before
    # gauge: first pose untouched
    assert np.allclose(relaxed[0], est[0])


def test_fake_backend_loop_constraint_end_to_end():
    """Feed drifted odometry through the backend API, close the loop, and
    check the returned trajectory improves."""
    gt, est = _chain_with_drift(25)
    be = FakePoseBackend()
    be.initialize(True)
    be.process_image_rgbd(None, None, 0.0)
    for i in range(1, 25):
        rel = np.linalg.inv(est[i - 1]) @ est[i]
        be.track_with_icp_pose(None, None, rel, float(i))
    from rtgslam_tpu.slam.tracker import convert_poses

    before, _ = convert_poses(be.get_trajectory_points())
    ate_before = _ate(gt, before)
    be.add_loop_constraint(0, 24, np.linalg.inv(gt[0]) @ gt[24],
                           weight=5.0, iterations=200)
    after, _ = convert_poses(be.get_trajectory_points())
    assert _ate(gt, after) < 0.5 * ate_before


@pytest.mark.skipif(
    not os.path.exists(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "build", "libpose_backend.so")),
    reason="native backend not built")
def test_native_matches_fake_relaxation():
    from rtgslam_tpu.slam.native_backend import NativePoseBackend
    from rtgslam_tpu.slam.tracker import convert_poses

    lib = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "native", "build", "libpose_backend.so")
    gt, est = _chain_with_drift(20)
    fake, native = FakePoseBackend(), NativePoseBackend(lib)
    for be in (fake, native):
        be.initialize(True)
        be.process_image_rgbd(None, None, 0.0)
        for i in range(1, 20):
            rel = np.linalg.inv(est[i - 1]) @ est[i]
            be.track_with_icp_pose(None, None, rel.astype(np.float32), float(i))
        be.add_loop_constraint(0, 19, np.linalg.inv(gt[0]) @ gt[19],
                               weight=5.0, iterations=100)
    pf, _ = convert_poses(fake.get_trajectory_points())
    pn, _ = convert_poses(native.get_trajectory_points())
    for a, b in zip(pf, pn):
        assert np.allclose(a, b, atol=1e-6)


class DriftingBackend(FakePoseBackend):
    """Fake backend that corrupts every odometry increment — simulates the
    accumulating front-end drift a loop closure must undo."""

    def __init__(self, bias):
        super().__init__()
        self.bias = np.asarray(bias, np.float64)

    def track_with_icp_pose(self, color, depth, pose_rel, timestamp):
        p = np.asarray(pose_rel, np.float64).copy()
        p[:3, 3] += self.bias
        super().track_with_icp_pose(color, depth, p, timestamp)


def _loop_sequence(base_cams):
    """Out-and-back revisit: the tail returns through earlier viewpoints."""
    seq = list(base_cams) + list(base_cams[-2::-1])
    out = []
    for i, cam in enumerate(seq):
        c = copy.copy(cam)
        c.uid = i
        c.timestamp = i / 30.0
        out.append(c)
    return out


def test_tracker_loop_closure_drops_ate(base_args):
    """e2e: injected odometry drift on a revisiting trajectory; the
    detector finds the revisit, the ICP verification measures T_ij, the
    pose graph relaxes, and the final ATE beats the no-closure run."""
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Tracker

    cams = _loop_sequence(make_cameras(n_frames=10, H=96, W=128))
    n = len(cams)  # 19 frames; frame 18 revisits frame 0's viewpoint

    def run(use_closure):
        args = copy.deepcopy(base_args)
        args.use_gt_pose = False
        args.use_orb_backend = True
        args.icp_use_model_depth = False
        args.use_loop_closure = use_closure
        args.loop_check_every = 1
        args.loop_min_gap = 14
        args.loop_cooldown = 50
        args.loop_candidate_radius = 0.4
        tracker = Tracker(args, orb_backend=DriftingBackend([0.0015, 0, 0.001]))
        tracker.orb_backend.initialize(True)
        for i, cam in enumerate(cams):
            fm = tracker.map_preprocess(cam, i)
            tracker.tracking(cam, fm)
        return tracker

    t_open = run(use_closure=False)
    t_closed = run(use_closure=True)
    assert t_closed.status.get("loops_closed", 0) >= 1
    ate_open = t_open.eval_ate()
    ate_closed = t_closed.eval_ate()
    assert ate_closed < ate_open, (ate_open, ate_closed)
    assert ate_closed < 0.7 * ate_open, (ate_open, ate_closed)


def test_relocalization_recovers_from_icp_failure(base_args):
    """When predict_pose reports failure, the tracker relocalizes against
    stored keyframe depths (reference: ORB-SLAM2 feature relocalization,
    tracker.py:236-244) instead of propagating the bad estimate."""
    import copy as copy_mod

    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Tracker

    # stride the orbit so one frame of held pose costs ~1.4 cm — large
    # enough that relocalization visibly beats the coast-on-previous-pose
    # fallback (at stride 1 the orbit moves ~3 mm/frame and holding the
    # previous pose is already near-optimal)
    cams = make_cameras(n_frames=24, H=96, W=128)[::3]
    fail_at = 5

    def run(use_reloc):
        args = copy_mod.deepcopy(base_args)
        args.use_gt_pose = False
        args.use_orb_backend = True
        args.icp_use_model_depth = False
        args.use_loop_closure = use_reloc
        args.loop_check_every = 1
        args.loop_min_gap = 10 ** 6      # disable loop *closure*; keep records
        tracker = Tracker(args, orb_backend=FakePoseBackend())
        tracker.orb_backend.initialize(True)
        real_predict = tracker.icp.predict_pose
        for i, cam in enumerate(cams):
            if i == fail_at:
                # simulate an ICP breakdown: garbage pose, success=False
                tracker.icp.predict_pose = \
                    lambda: (np.eye(4, dtype=np.float32), False)
            else:
                tracker.icp.predict_pose = real_predict
            fm = tracker.map_preprocess(cam, i)
            tracker.tracking(cam, fm)
        return tracker

    t_off = run(use_reloc=False)
    t_on = run(use_reloc=True)
    assert t_on.status.get("relocalized", 0) == 1
    err_off = np.linalg.norm(
        t_off.pose_es[fail_at][:3, 3] - t_off.pose_gt[fail_at][:3, 3])
    err_on = np.linalg.norm(
        t_on.pose_es[fail_at][:3, 3] - t_on.pose_gt[fail_at][:3, 3])
    assert err_on < 0.5 * err_off, (err_on, err_off)
    assert err_on < 0.01, err_on  # recovered to within 1 cm


def _drifting_fused_step(bias, fail_frames=()):
    """Wrap the fused single-dispatch track step with a post-hoc odometry
    bias (the fused-path twin of DriftingBackend) and optional forced hard
    failures.  Returns (wrapper, original)."""
    import jax.numpy as jnp
    import rtgslam_tpu.slam.tracker as trmod

    orig = trmod.fused_icp_track_step
    bias_T = jnp.eye(4).at[:3, 3].set(jnp.asarray(bias, jnp.float32))
    calls = {"n": 0}

    garbage_T = jnp.eye(4).at[:3, 3].set(jnp.asarray([0.12, 0, 0.08]))

    def wrapper(*a, **k):
        fm, c2w, pose_used, new_last_rel, p2p, ok = orig(*a, **k)
        calls["n"] += 1
        if calls["n"] in fail_frames:
            # hard failure: a garbage pose the host must NOT keep
            return (fm, c2w @ garbage_T, pose_used, new_last_rel, p2p,
                    jnp.asarray(False))
        return fm, c2w @ bias_T, pose_used, new_last_rel, p2p, ok

    return wrapper, orig


@pytest.mark.slow
def test_fused_pure_icp_loop_closure_drops_ate(base_args):
    """The fused pure-ICP path (no ORB backend — bench/Replica configs) with
    ``loop_closure_pure_icp`` on: injected odometry drift on a revisiting
    trajectory is detected, ICP-verified, relaxed host-side
    (relax_pose_graph), and the final ATE beats the no-closure run.
    Extension beyond the reference (its pure-ICP configs have no closure,
    base.yaml:105)."""
    import rtgslam_tpu.slam.tracker as trmod
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Tracker

    cams = _loop_sequence(make_cameras(n_frames=10, H=96, W=128))

    def run(use_closure):
        args = copy.deepcopy(base_args)
        args.use_gt_pose = False
        args.use_orb_backend = False            # fused single-dispatch path
        args.icp_use_model_depth = False
        args.loop_closure_pure_icp = use_closure
        args.loop_check_every = 1
        args.loop_min_gap = 14
        args.loop_cooldown = 50
        args.loop_candidate_radius = 0.4
        tracker = Tracker(args)
        assert tracker.fused
        wrapper, orig = _drifting_fused_step([0.0015, 0, 0.001])
        trmod.fused_icp_track_step = wrapper
        try:
            for i, cam in enumerate(cams):
                fm = tracker.map_preprocess(cam, i)
                tracker.tracking(cam, fm)
        finally:
            trmod.fused_icp_track_step = orig
        return tracker

    t_open = run(use_closure=False)
    t_closed = run(use_closure=True)
    assert t_open.loop_closer is None           # default stays reference-like
    assert t_closed.status.get("loops_closed", 0) >= 1
    # the relaxed history is handed to the mapper exactly once
    assert t_closed.get_new_poses() is not None
    assert t_closed.get_new_poses() is None
    ate_open = t_open.eval_ate()
    ate_closed = t_closed.eval_ate()
    assert ate_closed < 0.7 * ate_open, (ate_open, ate_closed)


def test_appearance_closure_beats_pose_gate(base_args):
    """Place recognition (VERDICT r3 #3): inject drift LARGER than the
    0.4 m pose-gate radius on a revisiting trajectory.  The proximity
    detector can then never fire (the regime loop closure exists for);
    the appearance detector (global thumbnail descriptor, the DBoW2 role)
    must still find the revisit, verify it from the drift-independent
    identity seed, and drop the ATE.  Reference: DBoW2 place recognition
    inside ORB-SLAM2 (SLAM/multiprocess/tracker.py:236-244)."""
    import rtgslam_tpu.slam.tracker as trmod
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Tracker

    cams = _loop_sequence(make_cameras(n_frames=10, H=96, W=128))
    # |bias| ~= 0.036 m/frame -> ~0.5 m accumulated at the first eligible
    # revisit (frame 16 vs record 2), beyond the 0.4 m candidate radius
    bias = [0.03, 0, 0.02]

    def run(appearance_sim):
        args = copy.deepcopy(base_args)
        args.use_gt_pose = False
        args.use_orb_backend = False
        args.icp_use_model_depth = False
        args.loop_closure_pure_icp = True
        args.loop_check_every = 1
        args.loop_min_gap = 14
        args.loop_cooldown = 50
        args.loop_candidate_radius = 0.4
        args.loop_appearance_sim = appearance_sim
        tracker = Tracker(args)
        wrapper, orig = _drifting_fused_step(bias)
        trmod.fused_icp_track_step = wrapper
        try:
            for i, cam in enumerate(cams):
                fm = tracker.map_preprocess(cam, i)
                tracker.tracking(cam, fm)
        finally:
            trmod.fused_icp_track_step = orig
        return tracker

    t_pose_only = run(appearance_sim=0.0)   # appearance detector disabled
    t_appear = run(appearance_sim=0.92)
    # the drift exceeds the proximity radius: pose gating alone finds nothing
    assert t_pose_only.status.get("loops_closed", 0) == 0
    assert t_appear.status.get("loops_closed", 0) >= 1
    ate_open = t_pose_only.eval_ate()
    ate_closed = t_appear.eval_ate()
    assert ate_closed < 0.7 * ate_open, (ate_open, ate_closed)


def test_fused_pure_icp_relocalization(base_args):
    """A hard ICP failure on the fused path relocalizes against stored
    keyframe depths instead of coasting (staged-path twin:
    test_relocalization_recovers_from_icp_failure)."""
    import rtgslam_tpu.slam.tracker as trmod
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Tracker

    cams = make_cameras(n_frames=24, H=96, W=128)[::3]
    fail_at = 5   # frame index; fused step call n == frame index (first
                  # frame initializes without the fused step)

    def run(use_reloc):
        args = copy.deepcopy(base_args)
        args.use_gt_pose = False
        args.use_orb_backend = False
        args.icp_use_model_depth = False
        args.loop_closure_pure_icp = use_reloc
        args.loop_check_every = 1
        args.loop_min_gap = 10 ** 6          # keep records, never close
        tracker = Tracker(args)
        wrapper, orig = _drifting_fused_step([0, 0, 0],
                                             fail_frames={fail_at})
        trmod.fused_icp_track_step = wrapper
        try:
            for i, cam in enumerate(cams):
                fm = tracker.map_preprocess(cam, i)
                tracker.tracking(cam, fm)
        finally:
            trmod.fused_icp_track_step = orig
        return tracker

    t_on = run(use_reloc=True)
    assert t_on.status.get("relocalized", 0) >= 1
    err_on = np.linalg.norm(
        t_on.pose_es[fail_at][:3, 3] - t_on.pose_gt[fail_at][:3, 3])
    assert err_on < 0.01, err_on  # recovered to within 1 cm


@pytest.mark.slow
def test_update_poses_propagates_correction(base_args, synthetic_cams):
    """After a closure, mapper.update_poses must re-pose its frame memory and
    keyframes to the corrected trajectory and keep rendering consistent."""
    from rtgslam_tpu.config import OptimizationParams
    from rtgslam_tpu.slam import Mapper, Tracker

    args = copy.deepcopy(base_args)
    args.use_gt_pose = False
    args.use_orb_backend = True
    args.icp_use_model_depth = False
    args.use_loop_closure = False      # constraint injected manually below
    opt = OptimizationParams().extract(args)
    tracker = Tracker(args, orb_backend=DriftingBackend([0.002, 0, 0]))
    tracker.orb_backend.initialize(True)
    mapper = Mapper(args)
    cams = synthetic_cams
    for i, cam in enumerate(cams):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        mapper.update_poses(tracker.get_new_poses())
        mapper.mapping(cam, fm, i, opt)
        mapper.time += 1

    drifted = [e["camera"].c2w.copy() for e in mapper.processed_frames]
    # inject a ground-truth loop constraint between frame 0 and the last
    n = len(cams)
    T_ij = np.linalg.inv(cams[0].pose_gt) @ cams[n - 1].pose_gt
    tracker.orb_backend.add_loop_constraint(0, n - 1, T_ij,
                                            weight=5.0, iterations=200)
    mapper.update_poses(tracker.get_new_poses())
    corrected = [e["camera"].c2w.copy() for e in mapper.processed_frames]
    moved = [not np.allclose(a, b, atol=1e-9)
             for a, b in zip(drifted, corrected)]
    assert any(moved), "update_poses did not re-apply the relaxed trajectory"
    # the re-posed frame memory must still render (map consistency)
    out = mapper._render(mapper.processed_frames[-1]["cam_dev"], "global")
    assert np.isfinite(np.asarray(out["render"])).all()


def test_loop_store_reanchored_after_correction(base_args):
    """After a pose-graph relaxation the stored records must adopt the
    corrected poses — otherwise a later relocalization would re-inject the
    drift the closure removed."""
    import copy
    from rtgslam_tpu.slam.loop_closure import LoopCloser

    args = copy.deepcopy(base_args)
    lc = LoopCloser(args)
    lc.every = 1
    depth = np.ones((16, 16), np.float32)
    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]], np.float32)
    drifted = []
    for i in range(4):
        c2w = np.eye(4)
        c2w[0, 3] = i * 1.0 + 0.1 * i   # linear drift
        drifted.append(c2w)
        lc.min_gap = 10 ** 9            # never verify (pure store test)
        lc.observe(i, c2w, depth, K)
    corrected = [np.eye(4) for _ in range(4)]
    for i, c in enumerate(corrected):
        c[0, 3] = i * 1.0               # drift removed
    lc.update_poses(corrected)
    for rec in lc.records:
        assert np.allclose(rec["c2w"], corrected[rec["id"]])


def test_loop_store_bounded(base_args):
    """The record store thins itself (and halves its sampling rate) at the
    cap instead of growing without bound."""
    import copy
    from rtgslam_tpu.slam.loop_closure import LoopCloser

    args = copy.deepcopy(base_args)
    lc = LoopCloser(args)
    lc.every = 1
    lc.max_records = 16
    lc.min_gap = 10 ** 9
    depth = np.ones((8, 8), np.float32)
    K = np.array([[10.0, 0, 4], [0, 10.0, 4], [0, 0, 1]], np.float32)
    for i in range(200):
        if i % lc.every == 0:
            lc.observe(i, np.eye(4), depth, K)
    assert len(lc.records) <= 16
    ids = [r["id"] for r in lc.records]
    assert ids[-1] > 150   # recent frames still represented
    assert ids[0] < 50     # early trajectory still represented
