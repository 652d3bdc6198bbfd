"""Pallas blend kernel vs the XLA blend: bit-level semantic equivalence.

Runs in Pallas interpreter mode on CPU (hermetic); the compiled path is
exercised on TPU by the main pipeline when enabled.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtgslam_tpu.ops.rasterize import binning, blend
from rtgslam_tpu.ops.rasterize.pallas_blend import blend_tiles_pallas
from rtgslam_tpu.ops.rasterize.project import project


def _setup(seed=0, n_alive=24, H=64, W=96, Kt=128):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_rasterizer import make_scene

    g, cam, st = make_scene(P=64, n_alive=n_alive, seed=seed, H=H, W=W)
    pr = project(g["xyz"], g["scales"], g["rotations"], g["opacity"], g["shs"],
                 g["normal"], g["alive"], cam["w2c"], cam["K"], cam["campos"],
                 W, H, st.sh_degree, st.normal_threshold)
    bins = binning.bin_gaussians(pr, H, W, 256, Kt, max_visible=64)
    order = bins.order
    feat = blend._pack_features((
        pr.mean2d[order, 0], pr.mean2d[order, 1],
        pr.conic[order, 0], pr.conic[order, 1], pr.conic[order, 2],
        pr.depth[order], pr.rgb[order, 0], pr.rgb[order, 1], pr.rgb[order, 2],
        pr.opacity[order], pr.normal_elig[order].astype(jnp.float32)))
    origins = binning.tile_origins(H, W)
    order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])
    tile_feat = feat.gather(bins.tile_lists)     # FeatCols of [T, Kt]
    tile_gidx = order_pad[bins.tile_lists]
    return feat, order, bins, origins, tile_feat, tile_gidx, st


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_matches_xla(seed):
    feat, order, bins, origins, tile_feat, tile_gidx, st = _setup(seed=seed)
    ref = blend.blend_tiles(feat, order, bins.tile_lists, bins.tile_counts,
                            origins, opaque_threshold=st.opaque_threshold,
                            differentiable=True)
    out = blend_tiles_pallas(tile_feat.pack(), tile_gidx, bins.tile_counts,
                             origins, opaque_threshold=st.opaque_threshold,
                             interpret=True)
    assert np.allclose(np.asarray(out.color), np.asarray(ref.color), atol=1e-5)
    assert np.allclose(np.asarray(out.depth), np.asarray(ref.depth), atol=1e-5)
    assert np.array_equal(np.asarray(out.depth_index), np.asarray(ref.depth_index))
    assert np.array_equal(np.asarray(out.color_index), np.asarray(ref.color_index))
    assert np.allclose(np.asarray(out.T_final), np.asarray(ref.T_final), atol=1e-5)
    assert np.allclose(np.asarray(out.depth_weight), np.asarray(ref.depth_weight), atol=1e-5)


def test_pallas_empty_tiles():
    feat, order, bins, origins, tile_feat, tile_gidx, st = _setup(n_alive=0)
    out = blend_tiles_pallas(tile_feat.pack(), tile_gidx, bins.tile_counts,
                             origins, opaque_threshold=0.6, interpret=True)
    assert np.all(np.asarray(out.T_final) == 1.0)
    assert np.all(np.asarray(out.depth_index) == -1)


@pytest.mark.slow
def test_use_pallas_flag_in_render_api():
    """`use_pallas_blend` selects the Pallas kernel for inference renders
    through the product API and matches the XLA path."""
    import dataclasses
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_rasterizer import make_scene
    from rtgslam_tpu.ops.rasterize import render

    g, cam, st = make_scene(P=64, n_alive=24, seed=1, H=64, W=96)
    st = dataclasses.replace(st, tile_capacity=128)  # pallas needs Kt % 128 == 0
    ref = render(g, cam, st, differentiable=False)
    st_p = dataclasses.replace(st, use_pallas=True, pallas_interpret=True)
    out = render(g, cam, st_p, differentiable=False)
    for k in ("render", "depth", "T_map"):
        assert np.allclose(np.asarray(out[k]), np.asarray(ref[k]), atol=1e-5), k
    assert np.array_equal(np.asarray(out["depth_index_map"]),
                          np.asarray(ref["depth_index_map"]))
    # the differentiable path with the flag on uses the Pallas fused VJP
    grad_out = render(g, cam, st_p, differentiable=True)
    assert np.allclose(np.asarray(grad_out["render"]),
                       np.asarray(ref["render"]), atol=1e-5)


@pytest.mark.slow
def test_pallas_fused_vjp_matches_xla_fused():
    """Pallas forward+backward fused VJP == XLA fused VJP on values and
    gradients of a color/depth/T loss (interpreter mode)."""
    feat, order, bins, origins, tile_feat, tile_gidx, st = _setup(seed=7)
    rng = np.random.default_rng(1)
    T_tiles = tile_gidx.shape[0]
    wc = jnp.asarray(rng.standard_normal((T_tiles, 256, 3)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((T_tiles, 256)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((T_tiles, 256)), jnp.float32)

    def loss(tf, use_pallas):
        out = blend.blend_tiles_fused(
            tf, tile_gidx, bins.tile_counts, origins,
            st.opaque_threshold, st.T_threshold, use_pallas, use_pallas)
        return (jnp.sum(out.color * wc) + jnp.sum(out.depth * wd)
                + jnp.sum(out.T_final * wt))

    v_x, g_x = jax.value_and_grad(lambda tf: loss(tf, False))(tile_feat)
    v_p, g_p = jax.value_and_grad(lambda tf: loss(tf, True))(tile_feat)
    assert np.isclose(float(v_x), float(v_p), rtol=1e-5, atol=1e-5)
    a = np.stack([np.asarray(c) for c in g_x], axis=-1)
    b = np.stack([np.asarray(c) for c in g_p], axis=-1)
    assert np.isfinite(b).all()
    scale = max(np.abs(a).max(), 1e-3)
    assert np.allclose(a, b, atol=1e-4 * scale, rtol=1e-3), np.abs(a - b).max()
