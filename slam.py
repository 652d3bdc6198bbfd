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
parser.add_argument("--bands", type=int, default=0,
                    help="override frame_bands (sub-frame row-band dispatch; "
                         "N>1 splits each frame into N row bands so no single "
                         "device dispatch exceeds the flaky-worker size limit)")
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
    if cli.bands:
        args.frame_bands = cli.bands
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

    # sub-frame (row-band) dispatch: full-res frames on a worker that
    # crashes on large single dispatches (data/bands.py).  Tracking runs
    # once per frame on a stride-downsampled copy; every band maps with
    # the tracked pose against the shared map.
    n_bands = int(getattr(args, "frame_bands", 1))
    band_track_stride = int(getattr(args, "band_track_stride", n_bands))
    track_settings = None

    loader = FrameLoader(dataset_params, frame_infos, prefetch=4)
    for frame_id, frame in enumerate(loader):
        print(f"========== curr frame is: {frame_id} ==========")

        if n_bands > 1:
            from rtgslam_tpu.data.bands import downsample_camera, split_bands
            from rtgslam_tpu.ops.rasterize.api import RasterSettings
            from rtgslam_tpu.slam.tracker import preprocess_and_lift
            import jax.numpy as jnp

            track_cam = downsample_camera(frame, band_track_stride)
            if track_settings is None:
                track_settings = RasterSettings.from_args(
                    args, track_cam.image_height, track_cam.image_width)

            start = time.time()
            frame_map = tracker.map_preprocess(track_cam, frame_id)
            tracker.tracking(track_cam, frame_map)
            tracker_time = time.time() - start
            recorder.update_mean("tracking", tracker_time, 1)
            frame.update(track_cam.R, track_cam.T)   # tracked pose -> frame

            map_start = time.time()
            mapper.update_poses(tracker.get_new_poses())
            bands = split_bands(frame, n_bands, rotate=frame_id)
            for bcam in bands:
                bfm = preprocess_and_lift(
                    jnp.asarray(bcam.depth, jnp.float32),
                    jnp.asarray(bcam.image, jnp.float32),
                    jnp.asarray(bcam.intrinsic),
                    jnp.asarray(bcam.c2w, jnp.float32),
                    args.min_depth, args.max_depth,
                    tracker.invalid_confidence_thresh, tracker.depth_filter)
                bfm["time"] = frame_id
                mapper.mapping(bcam, bfm, frame_id, optimization_params)
                mapper.time += 1
            mapper.time -= 1   # main-loop tail increments once more
            # model feedback for frame-to-model ICP, at TRACK resolution
            out = mapper._render(track_cam.device_dict(), "global",
                                 settings=track_settings)
            mapper._set_model_map(out)
            tracker.update_last_status(
                track_cam,
                mapper.model_map["render_depth"],
                frame_map["depth_map"],
                mapper.model_map["render_normal"],
                frame_map["normal_map_w"],
            )
            eval_cam = bands[0]
        else:
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
            eval_cam = frame
        mapper_time = time.time() - map_start
        recorder.update_mean("mapping", mapper_time, 1)
        if recorder.record_mem:
            recorder.watch_memory()
        print(f"[LOG] tracker {tracker_time*1e3:.1f} ms  mapper {mapper_time*1e3:.1f} ms")

        if (mapper.time + 1) % mapper.save_step == 0 or mapper.time == 0:
            metrics = eval_frame(
                mapper, eval_cam, os.path.join(args.save_path, "eval_render"),
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
        if n_bands > 1:
            # Band-by-band final eval: a single full-res dispatch is what
            # --bands exists to avoid (the flaky worker crashes executing
            # it).  Equal-pixel bands make the full-frame PSNR exact:
            # mse_full = mean(mse_band), psnr = -10 log10(mse_full).
            import math as _math
            from rtgslam_tpu.data.bands import split_bands
            mses, d1s = [], []
            for bcam in split_bands(kf_full, n_bands):
                m = eval_frame(
                    mapper, bcam, os.path.join(args.save_path, "eval_render"),
                    min_depth=args.min_depth, max_depth=args.max_depth,
                    save_picture=True)
                mses.append(10.0 ** (-m["psnr"] / 10.0))
                d1s.append(m["depth_l1_cm"])
            print(f"[EVAL] final keyframe (banded x{n_bands}): "
                  f"psnr {-10.0 * _math.log10(sum(mses) / len(mses)):.2f} "
                  f"depthL1 {sum(d1s) / len(d1s):.2f}cm")
        else:
            eval_frame(mapper, kf_full,
                       os.path.join(args.save_path, "eval_render"),
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
