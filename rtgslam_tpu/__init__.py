"""rtgslam_tpu — a TPU-native online RGBD Gaussian-splatting SLAM framework.

A ground-up JAX/XLA/Pallas rebuild of the capability set of RTG-SLAM
(SIGGRAPH'24): per-frame point-to-plane ICP tracking plus an incrementally
optimized compact 3D-Gaussian map, re-architected for TPU:

* the CUDA differentiable rasterizer (reference submodule
  ``diff-gaussian-rasterization-depth``, call sites ``SLAM/render.py:60-133``)
  becomes a static-shape, depth-sorted, tile-binned blend built from XLA
  primitives (cumprod transmittance + MXU matmul accumulation) with an
  optional Pallas fast path;
* the CUDA ``accumulate_gaussian_error`` / ``distCUDA2`` / pytorch3d KNN
  kernels become segment reductions and a tiled matmul-distance KNN;
* the multi-process tracker/mapper pipeline (``slam_mp.py``) becomes a
  host-threaded two-stage pipeline over jitted device graphs;
* the Gaussian map is a fixed-capacity structure-of-arrays pytree in HBM so
  every step is jittable with static shapes (no recompilation as the map
  grows).

Subpackages:
  config    YAML config system with ``parent:`` inheritance (reference
            ``utils/config_utils.py``) and parameter groups.
  utils     math (SE3/quaternions), SH, PLY I/O, trajectory/ATE, monitoring.
  data      dataset readers (Replica/TUM/ScanNet++/ours) + synthetic scenes.
  ops       device kernels: preprocessing maps, ICP, KNN, segment errors,
            and the Gaussian rasterizer.
  models    fixed-capacity Gaussian map store, masked Adam, losses.
  slam      tracker / mapper / system orchestration and evaluation.
  parallel  device-mesh sharding of the render/optimize step.
"""

__version__ = "0.1.0"
