"""End-to-end SLAM smoke tests on the synthetic scene (CPU)."""

import numpy as np
import pytest

from rtgslam_tpu.config import OptimizationParams
from rtgslam_tpu.slam import Mapper, Tracker
from rtgslam_tpu.slam.eval import eval_frame


@pytest.fixture(scope="module")
def slam_run(request):
    base_args = request.getfixturevalue("base_args")
    synthetic_cams = request.getfixturevalue("synthetic_cams")
    import copy

    args = copy.deepcopy(base_args)
    args.use_gt_pose = False
    args.icp_use_model_depth = True
    opt = OptimizationParams().extract(args)
    tracker = Tracker(args)
    mapper = Mapper(args)
    for i, cam in enumerate(synthetic_cams):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        mapper.mapping(cam, fm, i, opt)
        mapper.get_render_output(cam)
        tracker.update_last_status(
            cam, mapper.model_map["render_depth"], mapper.frame_map["depth_map"],
            mapper.model_map["render_normal"], mapper.frame_map["normal_map_w"])
        mapper.time += 1
    return tracker, mapper, synthetic_cams


def test_tracking_accuracy(slam_run):
    tracker, _, cams = slam_run
    ate = tracker.eval_ate()
    assert ate < 1.0, f"ATE {ate} cm too high"   # sub-centimetre on synthetic


def test_map_grows_and_renders(slam_run):
    _, mapper, cams = slam_run
    assert mapper.get_unstable_num + mapper.get_stable_num > 500
    m = eval_frame(mapper, cams[-1])
    # smoke threshold for a 6-frame / 10-iter run; the wall-relief scene has
    # more depth discontinuities than a converged run would resolve
    assert m["depth_l1_cm"] < 3.0
    assert np.isfinite(m["psnr"]) and m["psnr"] > 8.0
    # quality where the map has coverage
    out = mapper._render(cams[-1].device_dict(), "global")
    img = np.asarray(out["render"])
    T = np.asarray(out["T_map"])[..., 0]
    covered = T < 0.3
    assert covered.mean() > 0.3
    err = np.abs(img - np.asarray(cams[-1].image))[covered]
    psnr_cov = -20 * np.log10(np.sqrt((err ** 2).mean()) + 1e-9)
    assert psnr_cov > 14.0, f"covered-region PSNR {psnr_cov}"


def test_checkpoint_roundtrip(slam_run, tmp_path):
    _, mapper, cams = slam_run
    path = str(tmp_path / "ckpt")
    mapper.save_model(path=path)
    import os
    assert os.path.exists(path + ".ply") or os.path.exists(path + "_stable.ply")
    # reload into a fresh mapper (metric.py flow)
    import copy
    fresh = Mapper(copy.deepcopy(mapper.args))
    src = path + "_merge.ply" if os.path.exists(path + "_merge.ply") else (
        path + "_stable.ply" if os.path.exists(path + "_stable.ply") else path + ".ply")
    fresh.load_model(src)
    fresh._ensure_settings(cams[-1])
    out = fresh._render(cams[-1].device_dict(), "global")
    assert np.asarray(out["T_map"]).min() < 0.9  # something renders


def test_trajectory_export(slam_run, tmp_path):
    tracker, _, _ = slam_run
    ate = tracker.save_traj(str(tmp_path))
    import os
    assert os.path.exists(tmp_path / "save_traj" / "pose_es.npy")
    assert os.path.exists(tmp_path / "save_traj" / "traj_tum.txt")
    assert np.isfinite(ate)


def test_frame_chain_matches_separate_dispatches(base_args, synthetic_cams):
    """The single-dispatch non-optimize frame (map_ops.frame_chain) must
    produce the same map state as spawn + lifecycle as separate calls."""
    import copy

    args = copy.deepcopy(base_args)
    args.use_gt_pose = True
    args.gaussian_update_frame = 100   # every frame after 0 is non-optimize
    opt = OptimizationParams().extract(args)

    def run(fused):
        tracker = Tracker(args)
        mapper = Mapper(args)
        for i, cam in enumerate(synthetic_cams[:4]):
            fm = tracker.map_preprocess(cam, i)
            tracker.tracking(cam, fm)
            if fused or i == 0:
                mapper.mapping(cam, fm, i, opt)
            else:
                # the pre-fusion two-dispatch path, same host order
                mapper._ensure_settings(cam)
                mapper.frame_map = fm
                mapper.gaussians_add(cam)
                mapper.processed_frames.append({
                    "camera": cam.drop_images(),
                    "cam_dev": cam.device_dict(),
                    "frame_map": fm,
                })
                mapper.lifecycle()
            mapper.time += 1
        return mapper

    a, b = run(True), run(False)
    assert np.array_equal(np.asarray(a.state.status), np.asarray(b.state.status))
    for field in ("xyz", "scaling", "rotation", "opacity", "confidence"):
        va = np.asarray(getattr(a.state, field))
        vb = np.asarray(getattr(b.state, field))
        assert np.allclose(va, vb, atol=1e-5), field


def test_fake_pose_backend_roundtrip():
    from rtgslam_tpu.slam.pose_backend import FakePoseBackend
    from rtgslam_tpu.slam.tracker import convert_poses

    b = FakePoseBackend()
    b.initialize(True)
    b.process_image_rgbd(None, None, 0.0)
    rel = np.eye(4); rel[:3, 3] = [0.01, 0, 0]
    b.track_with_icp_pose(None, None, rel.astype(np.float32), 1.0)
    b.track_with_icp_pose(None, None, rel.astype(np.float32), 2.0)
    poses, stamps = convert_poses(b.get_trajectory_points())
    assert len(poses) == 3
    assert np.allclose(poses[-1][:3, 3], [0.02, 0, 0], atol=1e-6)


@pytest.mark.slow
def test_ref_limit_bucket_prewarm(base_args, synthetic_cams):
    """When map occupancy passes 3/4 of the current KNN ref_limit bucket,
    the mapper must prewarm the next bucket's executable in the background
    (so the crossing frame never stalls on an XLA compile) and keep
    producing valid frames through the crossing."""
    import copy
    import threading as _threading

    args = copy.deepcopy(base_args)
    args.use_gt_pose = True
    opt = OptimizationParams().extract(args)

    tracker = Tracker(args)
    mapper = Mapper(args)
    mapper.REF_LIMIT_FLOOR = 64   # tiny floor so a short run crosses buckets
    for i, cam in enumerate(synthetic_cams[:4]):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        mapper.mapping(cam, fm, i, opt)
        mapper.time += 1
    # frame 0 spawns ~uniform_sample_num points >> 64, so every later frame
    # sees hwm past the 3/4 threshold of some bucket and prewarms the next
    assert mapper._warmed_buckets, "no bucket was prewarmed"
    for t in _threading.enumerate():
        if t.name.startswith("prewarm-"):
            t.join(timeout=120)
    assert mapper.get_unstable_num + mapper.get_stable_num > 0


@pytest.mark.slow
def test_overflow_tracked_across_run(base_args, synthetic_cams):
    """Mapper.max_overflow folds the per-frame render overflow counter
    (async, no extra dispatch) and stays 0 at healthy capacities."""
    import copy

    args = copy.deepcopy(base_args)
    args.use_gt_pose = True
    # the conftest fixture's cost-optimized capacities themselves overflow
    # on this scene (that's what this counter makes visible) — give the
    # healthy branch adequate headroom
    args.tile_capacity = 1024
    args.block_capacity = 4096
    opt = OptimizationParams().extract(args)
    tracker, mapper = Tracker(args), Mapper(args)
    for i, cam in enumerate(synthetic_cams[:4]):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        mapper.mapping(cam, fm, i, opt)
        mapper.time += 1
    mapper._cached_hwm()   # fold the last frame's counter
    assert mapper.max_overflow == 0
    # undersized tile capacity must be detected through the same channel
    args2 = copy.deepcopy(base_args)
    args2.use_gt_pose = True
    args2.tile_capacity = 64    # far below this scene's occupancy
    args2.block_capacity = 128
    opt2 = OptimizationParams().extract(args2)
    tracker2, mapper2 = Tracker(args2), Mapper(args2)
    for i, cam in enumerate(synthetic_cams[:3]):
        fm = tracker2.map_preprocess(cam, i)
        tracker2.tracking(cam, fm)
        mapper2.mapping(cam, fm, i, opt2)
        mapper2.time += 1
    mapper2._cached_hwm()
    assert mapper2.max_overflow > 0
