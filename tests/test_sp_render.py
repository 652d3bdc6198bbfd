"""Tile-sharded render equals the single-device render (8-device CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from rtgslam_tpu.ops.rasterize import render
from rtgslam_tpu.parallel import make_mesh
from rtgslam_tpu.parallel.sp_render import sp_render


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
