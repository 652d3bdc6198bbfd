"""Tile-sharded render equals the single-device render (8-device CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from rtgslam_tpu.ops.rasterize import render
from rtgslam_tpu.parallel import make_mesh
from rtgslam_tpu.parallel.sp_render import sp_render

import pytest

pytestmark = pytest.mark.slow  # both tests compile sharded renders (75-800 s)


def test_sp_render_matches_single():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_rasterizer import make_scene

    g, cam, st = make_scene(P=128, n_alive=24, H=96, W=128)
    ref = render(g, cam, st)
    cam_j = {k: jnp.asarray(v) for k, v in cam.items()}
    out = sp_render(g, cam_j, st, make_mesh(8, axis="sp"))
    assert np.allclose(np.asarray(out["render"]), np.asarray(ref["render"]), atol=1e-5)
    assert np.allclose(np.asarray(out["depth"]), np.asarray(ref["depth"]), atol=1e-5)
    assert np.array_equal(np.asarray(out["depth_index_map"]),
                          np.asarray(ref["depth_index_map"]))
    assert np.allclose(np.asarray(out["T_map"]), np.asarray(ref["T_map"]), atol=1e-5)
    # full output-contract parity (api.py:136-146)
    assert np.array_equal(np.asarray(out["color_index_map"]),
                          np.asarray(ref["color_index_map"]))
    assert np.allclose(np.asarray(out["normal"]), np.asarray(ref["normal"]), atol=1e-5)
    assert np.allclose(np.asarray(out["color_hit_weight"]),
                       np.asarray(ref["color_hit_weight"]), atol=1e-5)
    assert np.allclose(np.asarray(out["depth_hit_weight"]),
                       np.asarray(ref["depth_hit_weight"]), atol=1e-5)
    assert int(out["overflow"]) == int(ref["overflow"])


def test_mapper_renders_tile_sharded(base_args, synthetic_cams):
    """With `multi_device` on, the mapper's standalone renders go through
    sp_render over the mesh and the pipeline still runs end to end."""
    import copy
    from rtgslam_tpu.config import OptimizationParams
    from rtgslam_tpu.slam import Mapper, Tracker

    args = copy.deepcopy(base_args)
    args.use_gt_pose = True
    args.multi_device = True
    opt = OptimizationParams().extract(args)
    tracker, mapper = Tracker(args), Mapper(args)
    assert mapper.mesh is not None
    for i, cam in enumerate(synthetic_cams[:3]):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        mapper.mapping(cam, fm, i, opt)
        mapper.time += 1
    out = mapper._render(synthetic_cams[2].device_dict(), "global")
    assert np.isfinite(np.asarray(out["render"])).all()
    assert (np.asarray(out["depth_index_map"]) >= 0).any()
