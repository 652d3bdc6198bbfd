#!/usr/bin/env python
"""Offline evaluation CLI.

Reference-compatible with ``metric.py``: loads a saved PLY checkpoint into a
fresh mapper, re-renders every train camera at its estimated pose, scores
PSNR/SSIM/depth-L1 per frame (geometry metrics on the last frame when a GT
mesh exists), and writes ``statis_frame_{F}_iter_{I}.csv``.

    python metric.py --config configs/replica/room0.yaml [--frame_id -1]
"""

import glob
import os
import re
from argparse import ArgumentParser

import numpy as np

parser = ArgumentParser()
parser.add_argument("--config", type=str, required=True)
parser.add_argument("--frame_id", type=int, default=-1,
                    help="which save_model/frame_XXXX snapshot (-1 = latest)")
parser.add_argument("--load_type", type=str, default="merge",
                    choices=["merge", "stable", "unstable"])
parser.add_argument("--eval_frame_num", type=int, default=-1)
parser.add_argument("--platform", type=str, default=None,
                    help="force a jax backend (e.g. 'cpu'); see slam.py")
cli = parser.parse_args()

if cli.platform:
    import jax

    jax.config.update("jax_platforms", cli.platform)

from rtgslam_tpu.config import read_config, DatasetParams
from rtgslam_tpu.data import Dataset, load_camera
from rtgslam_tpu.slam.mapper import Mapper
from rtgslam_tpu.slam.eval import eval_frame
from rtgslam_tpu.utils.general import safe_state


def pick_model(save_path: str, frame_id: int, load_type: str):
    """Pick the checkpoint PLY like the reference ``filter_models``
    (metric.py:37-153)."""
    frames = sorted(glob.glob(os.path.join(save_path, "save_model", "frame_*")))
    if not frames:
        raise FileNotFoundError(f"no checkpoints under {save_path}/save_model")
    frame_dir = frames[frame_id]
    frame_num = int(re.search(r"frame_(\d+)", frame_dir).group(1))
    suffix = {"merge": "_merge.ply", "stable": "_stable.ply", "unstable": ".ply"}[load_type]
    plys = sorted(glob.glob(os.path.join(frame_dir, f"iter_*{suffix}")))
    if not plys and load_type == "merge":
        # single-pool runs produce no merge file; fall back to stable
        plys = sorted(glob.glob(os.path.join(frame_dir, "iter_*_stable.ply")))
    if not plys:
        plys = sorted(p for p in glob.glob(os.path.join(frame_dir, "iter_*.ply"))
                      if "sibr" not in p and "stable" not in p and "merge" not in p)
    ply = plys[-1]
    iter_num = int(re.search(r"iter_(\d+)", ply).group(1))
    return ply, frame_num, iter_num


def main():
    args = read_config(cli.config)
    safe_state(getattr(args, "quiet", False))
    dataset_params = DatasetParams().extract(args)
    dataset = Dataset(dataset_params)

    ply_path, frame_num, iter_num = pick_model(
        args.save_path, cli.frame_id, cli.load_type)
    print(f"[metric] loading {ply_path}")

    # eval uses the looser opaque threshold (configs/base.yaml
    # renderer_opaque_threshold_eval, reference metric.py:138)
    args.renderer_opaque_threshold = getattr(
        args, "renderer_opaque_threshold_eval", args.renderer_opaque_threshold)
    mapper = Mapper(args)
    mapper.load_model(ply_path)

    pose_es_path = os.path.join(args.save_path, "save_traj", "pose_es.npy")
    pose_es = np.load(pose_es_path) if os.path.exists(pose_es_path) else None

    # geometry eval prefers the densified point cloud when slam.py wrote one
    # (reference metric.py:156-157: pcd_densify.ply over the raw PLY)
    pcd_rec_path = None
    if getattr(args, "pcd_densify", False):
        cand = os.path.join(args.save_path, "save_model", "pcd_densify.ply")
        if os.path.exists(cand):
            pcd_rec_path = cand
            print(f"[metric] geometry eval ply: {cand}")

    rows = []
    infos = dataset.scene_info.train_cameras
    n = len(infos) if cli.eval_frame_num == -1 else min(cli.eval_frame_num, len(infos))
    for frame_id in range(n):
        frame = load_camera(dataset_params, frame_id, infos[frame_id])
        if pose_es is not None and frame_id < len(pose_es):
            frame.update_pose(pose_es[frame_id])
        mapper._ensure_settings(frame)
        run_pcd = frame_id == n - 1 and dataset.mesh_path is not None
        metrics = eval_frame(
            mapper, frame,
            save_path=os.path.join(args.save_path, "eval_metric"),
            min_depth=args.min_depth, max_depth=args.max_depth,
            save_picture=(frame_id % 20 == 0), run_pcd=run_pcd,
            pcd_gt_path=dataset.mesh_path, pcd_rec_path=pcd_rec_path)
        metrics["frame"] = frame_id
        rows.append(metrics)
        print(f"[metric] frame {frame_id}: psnr {metrics['psnr']:.2f} "
              f"depthL1 {metrics['depth_l1_cm']:.2f}cm")

    import pandas as pd

    df = pd.DataFrame(rows)
    mean_row = df.mean(numeric_only=True).to_dict()
    mean_row["frame"] = "mean"
    df = pd.concat([df, pd.DataFrame([mean_row])], ignore_index=True)
    out_csv = os.path.join(
        args.save_path, f"statis_frame_{frame_num}_iter_{iter_num}.csv")
    df.to_csv(out_csv, index=False)
    print(f"[metric] wrote {out_csv}")
    print(df.tail(1).to_string())


if __name__ == "__main__":
    main()
