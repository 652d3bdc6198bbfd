"""Pipelined (tracker ∥ mapper) system test on CPU + loader tests."""

import copy
import os

import numpy as np
import pytest

from rtgslam_tpu.config import OptimizationParams, DatasetParams
from rtgslam_tpu.data.loader import FrameLoader
from rtgslam_tpu.data.synthetic import write_scene


def test_frame_loader_order_and_content(tmp_path, base_args):
    scene = str(tmp_path / "scene")
    write_scene(scene, n_frames=6, H=48, W=64)
    args = copy.deepcopy(base_args)
    args.type = "Ours"
    args.source_path = scene
    from rtgslam_tpu.data import Dataset

    dp = DatasetParams().extract(args)
    ds = Dataset(dp)
    loader = FrameLoader(dp, ds.scene_info.train_cameras, prefetch=3)
    frames = list(loader)
    loader.close()
    assert [f.uid for f in frames] == list(range(6))
    assert all(f.image.shape == (48, 64, 3) for f in frames)


@pytest.mark.parametrize("sync", ["strict", "loose", "free"])
def test_pipelined_system(tmp_path, base_args, sync):
    scene = str(tmp_path / f"scene_{sync}")
    write_scene(scene, n_frames=5, H=96, W=128)
    args = copy.deepcopy(base_args)
    args.type = "Ours"
    args.source_path = scene
    args.save_path = str(tmp_path / f"out_{sync}")
    args.use_gt_pose = False
    args.icp_use_model_depth = True
    args.sync_tracker2mapper_method = sync
    args.sync_tracker2mapper_frames = 2
    args.tracker_max_fps = 1000
    args.final_global_iter = 2
    args.save_step = 2            # exercise the mid-run save/eval drain
    opt = OptimizationParams().extract(args)

    from rtgslam_tpu.data import Dataset
    from rtgslam_tpu.slam.system import SLAM
    from rtgslam_tpu.utils.general import create_workspace

    dataset = Dataset(DatasetParams().extract(args))
    create_workspace(args.save_path)
    slam = SLAM(args, dataset, opt)
    ate, fps = slam.run()
    assert np.isfinite(ate) and ate < 2.0
    assert os.path.exists(os.path.join(args.save_path, "save_traj", "pose_es.npy"))
    assert slam.mapper.get_stable_num + slam.mapper.get_unstable_num > 100
    # mid-run checkpoint trail (reference system process drains save-model
    # requests during the run, multiprocess/system.py:57-87,108-146): with
    # save_step=2 over 5 frames the saver thread must leave PLYs for the
    # mid-run frames, not just the final save
    model_root = os.path.join(args.save_path, "save_model")
    frame_dirs = sorted(d for d in os.listdir(model_root)
                        if d.startswith("frame_"))
    assert len(frame_dirs) >= 3, frame_dirs
    for d in frame_dirs:
        plys = [f for f in os.listdir(os.path.join(model_root, d))
                if f.startswith("iter_") and f.endswith(".ply")]
        assert plys, d
    # per-save-step eval JSONs (beyond the reference, VERDICT r3 #4)
    evals = [f for f in os.listdir(os.path.join(args.save_path, "eval_render"))
             if f.endswith(".json")]
    assert len(evals) >= 2, evals


@pytest.mark.slow
def test_pipelined_system_two_devices(tmp_path, base_args):
    """device_list with two entries places the mapper on devices[0] and the
    tracker on devices[1]; frame maps and map snapshots cross chips via
    device_put (ICI on a real slice).  Runs on the 8-device CPU mesh."""
    import jax

    assert len(jax.devices()) >= 2
    scene = str(tmp_path / "scene_2dev")
    write_scene(scene, n_frames=5, H=96, W=128)
    args = copy.deepcopy(base_args)
    args.type = "Ours"
    args.source_path = scene
    args.save_path = str(tmp_path / "out_2dev")
    args.use_gt_pose = False
    args.icp_use_model_depth = True
    args.sync_tracker2mapper_method = "strict"
    args.sync_tracker2mapper_frames = 2
    args.tracker_max_fps = 1000
    args.final_global_iter = 2
    args.device_list = [0, 1]
    opt = OptimizationParams().extract(args)

    from rtgslam_tpu.data import Dataset
    from rtgslam_tpu.slam.system import SLAM
    from rtgslam_tpu.utils.general import create_workspace

    dataset = Dataset(DatasetParams().extract(args))
    create_workspace(args.save_path)
    slam = SLAM(args, dataset, opt)
    assert slam.two_device
    ate, fps = slam.run()
    assert np.isfinite(ate) and ate < 2.0
    # the map must live on the mapper's device
    state_dev = next(iter(slam.mapper.state.xyz.devices()))
    assert state_dev == slam.mapper_device
    assert slam.mapper_device != slam.tracker_device
