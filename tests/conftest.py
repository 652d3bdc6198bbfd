"""Test configuration: force an 8-device virtual CPU mesh.

Tests run on CPU so they are hermetic and exercise the multi-chip sharding
path via ``xla_force_host_platform_device_count`` (the driver validates the
same way).  NOTE: the axon TPU plugin ignores ``JAX_PLATFORMS`` env; the
``jax.config`` update below is what actually forces CPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from rtgslam_tpu.config import read_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def base_args():
    args = read_config(os.path.join(REPO, "configs", "base.yaml"))
    # small static capacities so CPU tests stay fast.  NOTE: tile/block are
    # deliberately UNDERSIZED for the synthetic scene — e2e tests therefore
    # also exercise the graceful-overflow path (farthest gaussians dropped,
    # counter raised; see test_overflow_tracked_across_run) while their
    # quality assertions still hold
    args.map_capacity = 8192
    args.temp_capacity = 2048
    args.block_capacity = 512
    args.tile_capacity = 128
    args.uniform_sample_num = 1500
    args.memory_length = 3
    args.gaussian_update_iter = 10
    args.gaussian_update_frame = 2
    args.max_depth = 8.0
    args.stable_confidence_thres = 30
    args.save_step = 10_000
    return args


@pytest.fixture(scope="session")
def synthetic_cams():
    from rtgslam_tpu.data.synthetic import make_cameras

    return make_cameras(n_frames=6, H=96, W=128)
