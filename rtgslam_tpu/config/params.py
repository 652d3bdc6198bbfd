"""Parameter groups: defaults + argparse registration + extraction.

Mirrors the contract of the reference ``arguments/__init__.py:23-62``: each
group declares its defaults as attributes; ``register`` adds them to an
argparse parser; ``extract`` projects a resolved config namespace down to the
subset of keys this group owns.  Leading-underscore attributes get a one-char
shorthand flag, as in the reference.
"""

from __future__ import annotations

import os
from argparse import ArgumentParser
from typing import Any

from .loader import GroupParams


class ParamGroup:
    def __init__(self, parser: ArgumentParser | None = None, name: str = "", fill_none: bool = False):
        if parser is not None:
            self.register(parser, name or type(self).__name__, fill_none)

    def register(self, parser: ArgumentParser, name: str, fill_none: bool = False) -> None:
        group = parser.add_argument_group(name)
        for key, value in vars(self).items():
            shorthand = key.startswith("_")
            key = key[1:] if shorthand else key
            t = type(value)
            default = None if fill_none else value
            flags = ["--" + key] + (["-" + key[:1]] if shorthand else [])
            if t is bool:
                group.add_argument(*flags, default=default, action="store_true")
            else:
                group.add_argument(*flags, default=default, type=t)

    def extract(self, args: Any) -> GroupParams:
        group = GroupParams()
        own = vars(self)
        for key, value in vars(args).items():
            if key in own or ("_" + key) in own:
                setattr(group, key, value)
        return group


class DatasetParams(ParamGroup):
    """Dataset loading knobs (reference ``arguments/__init__.py:121-146``)."""

    def __init__(self, parser=None, sentinel=False):
        self._source_path = ""
        self._model_path = ""
        self._images = "images"
        self._resolution = -1
        self._white_background = False
        self.type = "ours"
        self.data_device = "tpu"
        self.eval = False
        self.init_mode = "random"
        self.frame_num = -1
        self.frame_start = 0
        self.frame_step = 0
        self.eval_llff = 8
        self.sh_degree = 3
        self.preload = False
        self.resolution_scales = [1.0]
        super().__init__(parser, "Dataset Parameters", sentinel)

    def extract(self, args):
        g = super().extract(args)
        g.source_path = os.path.abspath(g.source_path)
        return g


class OptimizationParams(ParamGroup):
    """Per-iteration optimization weights/lrs (reference ``arguments/__init__.py:104-120``)."""

    def __init__(self, parser=None):
        self.train_iterations = 30_000
        self.position_lr = 0.0016
        self.feature_lr = 0.0025
        self.opacity_lr = 0.05
        self.scaling_lr = 0.005
        self.rotation_lr = 0.001

        self.color_weight = 0.8
        self.depth_weight = 1.0
        self.ssim_weight = 0.2
        self.history_weight = 0.1
        self.normal_weight = 0.1
        super().__init__(parser, "Optimization Parameters")


class MapParams(ParamGroup):
    """Gaussian-map management knobs (reference ``arguments/__init__.py:147-214``).

    TPU additions: ``map_capacity`` (static HBM slot count for the map SoA),
    ``temp_capacity`` (per-frame spawn staging capacity), ``tile_capacity`` /
    ``block_capacity`` (rasterizer binning capacities).  These bound static
    shapes; they are capacities, not behavior changes.
    """

    def __init__(self, parser=None, sentinel=False):
        self.init_opacity = 0.999
        self.max_sh_degree = 4
        self.active_sh_degree = -1
        self.uniform_sample_num = 5000
        self.gaussian_update_iter = 300
        self.gaussian_update_frame = 1
        self.KNN_num = 15
        self.KNN_threshold = 0.005

        self.spatial_lr_scale = 1
        self.save_path = "output/slam_test"
        self.min_depth = 0.0
        self.max_depth = 0.0
        self.renderer_opaque_threshold = 0.7
        self.renderer_normal_threshold = 80
        self.renderer_depth_threshold = 1.0
        self.render_mode = "ours"

        self.memory_length = 10
        self.xyz_factor = [1, 1, 1]
        self.use_tensorboard = True
        self.add_depth_thres = 0.05
        self.add_normal_thres = 0.1
        self.add_color_thres = 0.1
        self.add_transmission_thres = 0.1
        self.transmission_sample_ratio = 0.5
        self.error_sample_ratio = 0.3
        self.save_step = 1
        self.stable_confidence_thres = 200
        self.unstable_time_window = 50
        self.min_radius = 0.01
        self.max_radius = 0.10
        self.scale_factor = 0.5
        self.color_sigma = 1.0
        self.depth_filter = False
        self.verbose = False

        self.keyframe_trans_thes = 0.3
        self.keyframe_theta_thes = 20
        self.global_keyframe_num = 3
        self.sync_tracker2mapper_method = "strict"
        self.sync_tracker2mapper_frames = 5

        # --- TPU static-shape capacities (ours) ---
        self.map_capacity = 262144
        self.temp_capacity = 65536
        self.block_capacity = 4096
        self.tile_capacity = 1024
        self.use_pallas_blend = False
        self.use_fused_vjp = True
        self.optimize_freeze_binning = False
        self.optimize_compact = True
        self.multi_device = False
        super().__init__(parser, "Map Parameters", sentinel)
