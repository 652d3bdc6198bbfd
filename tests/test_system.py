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
