#!/usr/bin/env python
"""Pipelined (tracker ∥ mapper) SLAM entry point.

CLI-compatible with the reference ``slam_mp.py``:

    python slam_mp.py --config configs/replica/room0.yaml

The reference spawns tracker/mapper as separate CUDA processes; here they are
two host threads over one TPU device queue (see
``rtgslam_tpu/slam/system.py``) with the same strict/loose/free sync
policies.
"""

from argparse import ArgumentParser

parser = ArgumentParser(description="TPU RTG-SLAM (pipelined)")
parser.add_argument("--config", type=str, default="configs/replica/room0.yaml")
parser.add_argument("--frames", type=int, default=-1)
parser.add_argument("--platform", type=str, default=None,
                    help="force a jax backend (e.g. 'cpu'); see slam.py")
cli = parser.parse_args()

if cli.platform:
    import jax

    jax.config.update("jax_platforms", cli.platform)

from rtgslam_tpu.config import read_config, DatasetParams, OptimizationParams, save_config
from rtgslam_tpu.data import Dataset
from rtgslam_tpu.slam.system import SLAM
from rtgslam_tpu.utils.general import safe_state, create_workspace


def main():
    args = read_config(cli.config)
    if cli.frames != -1:
        args.frame_num = cli.frames
    args.mode = "multi process"
    safe_state(getattr(args, "quiet", False))

    dataset_params = DatasetParams().extract(args)
    optimization_params = OptimizationParams().extract(args)
    dataset = Dataset(dataset_params)
    create_workspace(args.save_path)
    save_config(args, args.save_path)

    slam = SLAM(args, dataset, optimization_params)
    slam.run()


if __name__ == "__main__":
    main()
