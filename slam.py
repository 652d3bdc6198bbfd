#!/usr/bin/env python
"""Single-process SLAM entry point.

CLI-compatible with the reference ``slam.py``:

    python slam.py --config configs/replica/room0.yaml

Per frame: preprocess -> track -> update poses -> map -> model render ->
feed model depth back to the tracker; ends with a final global optimization,
trajectory/ATE export, and an FPS report (fps = 1 / mean mapping time).
"""

import os
import time
from argparse import ArgumentParser

parser = ArgumentParser(description="TPU RTG-SLAM")
parser.add_argument("--config", type=str, default="configs/replica/room0.yaml")
parser.add_argument("--frames", type=int, default=-1,
                    help="override frame_num (quick runs)")
parser.add_argument("--platform", type=str, default=None,
                    help="force a jax backend (e.g. 'cpu'); the in-process "
                         "config update is the only override the axon TPU "
                         "plugin honors (JAX_PLATFORMS / JAX_PLATFORM_NAME "
                         "env vars are both hijacked)")
cli = parser.parse_args()

if cli.platform:
    import jax

    jax.config.update("jax_platforms", cli.platform)

from rtgslam_tpu.config import read_config, DatasetParams, OptimizationParams, MapParams, save_config
from rtgslam_tpu.data import Dataset, load_camera
from rtgslam_tpu.slam import Tracker, Mapper
from rtgslam_tpu.slam.eval import eval_frame
from rtgslam_tpu.utils.general import safe_state, create_workspace
from rtgslam_tpu.utils.monitor import Recorder


def main():
    args = read_config(cli.config)
    if cli.frames != -1:
        args.frame_num = cli.frames
    safe_state(getattr(args, "quiet", False))

    recorder = Recorder(0, record_mem=getattr(args, "record_mem", False))
    optimization_params = OptimizationParams().extract(args)
    dataset_params = DatasetParams().extract(args)

    dataset = Dataset(dataset_params)
    create_workspace(args.save_path)
    save_config(args, args.save_path)

    mapper = Mapper(args, recorder)
    tracker = Tracker(args)

    frame_infos = dataset.scene_info.train_cameras
    from rtgslam_tpu.data.loader import FrameLoader

    loader = FrameLoader(dataset_params, frame_infos, prefetch=4)
    for frame_id, frame in enumerate(loader):
        print(f"========== curr frame is: {frame_id} ==========")

        start = time.time()
        frame_map = tracker.map_preprocess(frame, frame_id)
        tracker.tracking(frame, frame_map)
        tracker_time = time.time() - start
        recorder.update_mean("tracking", tracker_time, 1)

        map_start = time.time()
        mapper.update_poses(tracker.get_new_poses())
        mapper.mapping(frame, frame_map, frame_id, optimization_params)
        mapper.get_render_output(frame)
        tracker.update_last_status(
            frame,
            mapper.model_map["render_depth"],
            mapper.frame_map["depth_map"],
            mapper.model_map["render_normal"],
            mapper.frame_map["normal_map_w"],
        )
        mapper_time = time.time() - map_start
        recorder.update_mean("mapping", mapper_time, 1)
        if recorder.record_mem:
            recorder.watch_memory()
        print(f"[LOG] tracker {tracker_time*1e3:.1f} ms  mapper {mapper_time*1e3:.1f} ms")

        if (mapper.time + 1) % mapper.save_step == 0 or mapper.time == 0:
            metrics = eval_frame(
                mapper, frame, os.path.join(args.save_path, "eval_render"),
                min_depth=args.min_depth, max_depth=args.max_depth,
                save_picture=True)
            print(f"[EVAL] frame {frame_id}: psnr {metrics['psnr']:.2f} "
                  f"depthL1 {metrics['depth_l1_cm']:.2f}cm")
            mapper.save_model(save_data=True)
        mapper.time += 1

    print("========== main loop finish ==========")
    print(f"[LOG] stable num: {mapper.get_stable_num}, "
          f"unstable num: {mapper.get_unstable_num}")

    mapper.update_poses(tracker.get_new_poses())
    mapper.global_optimization(optimization_params, is_end=True)
    if mapper.keyframe_list:
        kf = mapper.keyframe_list[-1]["frame"]
        kf_full = load_camera(dataset_params, kf.uid, frame_infos[kf.uid])
        kf_full.update(kf.R, kf.T)
        eval_frame(mapper, kf_full, os.path.join(args.save_path, "eval_render"),
                   min_depth=args.min_depth, max_depth=args.max_depth,
                   save_picture=True)
    mapper.save_model(save_data=True)
    ate = tracker.save_traj(args.save_path)
    fps = recorder.cal_fps()
    recorder.save(args.save_path)
    print(f"[LOG] ATE RMSE: {ate:.3f} cm  mapping FPS: {fps:.2f}  "
          f"max bin_overflow: {mapper.max_overflow}")

    if getattr(args, "pcd_densify", False):
        from rtgslam_tpu.models.densify import save_densified_ply
        from rtgslam_tpu.models.gaussian_map import STABLE, to_numpy_dict

        data = to_numpy_dict(mapper.state, STABLE)
        if data["xyz"].shape[0]:
            n = save_densified_ply(
                os.path.join(args.save_path, "save_model", "pcd_densify.ply"),
                data["xyz"], data["scaling"], data["rotation"],
                sigma=1, circle_num=30, levels=5)
            print(f"[LOG] densified pcd: {n} points")


if __name__ == "__main__":
    from rtgslam_tpu.utils import perf

    with perf.device_trace():   # RTG_TRACE=<dir> -> jax.profiler trace
        main()
