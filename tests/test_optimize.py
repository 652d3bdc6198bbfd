"""Fused optimize-loop behavior tests (CPU)."""

import pytest
import numpy as np
import jax.numpy as jnp

from rtgslam_tpu.models import map_ops, optimize
from rtgslam_tpu.models.gaussian_map import (
    MapState, alive_mask, unstable_mask, stable_mask, UNSTABLE, STABLE,
)
from rtgslam_tpu.parallel.sharded import _tiny_problem


def _problem():
    state, frames, settings = _tiny_problem(n_frames=2)
    lrs = {k: jnp.float32(1e-3) for k in optimize.PARAM_KEYS}
    hist = map_ops.capture_history(state)
    hyper = {
        "color_weight": jnp.float32(0.8),
        "depth_weight": jnp.float32(1.0),
        "normal_weight": jnp.float32(0.0),
        "add_depth_thres": jnp.float32(0.1),
        "hist_opacity": hist["opacity"],
        "hist_scaling": hist["scaling"],
        "hist_xyz": hist["xyz"],
        "hist_rotation_raw": hist["rotation_raw"],
    }
    return state, frames, settings, lrs, hyper


@pytest.mark.slow
def test_loss_decreases_over_iterations():
    state, frames, settings, lrs, hyper = _problem()
    # the tiny problem's default gt color exactly matches the zero-SH render
    # (0.5); give the optimizer real photometric work
    frames = frames._replace(color=jnp.full_like(frames.color, 0.8))
    lrs = dict(lrs, features_dc=jnp.float32(2e-2))
    seq = jnp.zeros(30, jnp.int32)
    _, report1 = optimize.run_optimize(
        state, frames, seq, 1, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings)
    _, report30 = optimize.run_optimize(
        state, frames, seq, 30, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings)
    assert float(report30["color"]) < float(report1["color"])


@pytest.mark.slow
def test_update_mask_freezes_rows():
    state, frames, settings, lrs, hyper = _problem()
    # promote half the alive rows to STABLE; only UNSTABLE rows may move
    status = np.asarray(state.status)
    alive_rows = np.nonzero(status == UNSTABLE)[0]
    frozen = alive_rows[: len(alive_rows) // 2]
    state = state.replace(status=state.status.at[frozen].set(STABLE))
    seq = jnp.zeros(5, jnp.int32)
    out, _ = optimize.run_optimize(
        state, frames, seq, 5, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings)
    dx = np.abs(np.asarray(out.xyz) - np.asarray(state.xyz)).sum(-1)
    assert np.all(dx[frozen] == 0), "stable rows must not move in local opt"
    moved = np.asarray(unstable_mask(state)) & (dx > 0)
    assert moved.sum() > 0


def test_confidence_grows_only_for_touched_rows():
    state, frames, settings, lrs, hyper = _problem()
    seq = jnp.zeros(5, jnp.int32)
    out, _ = optimize.run_optimize(
        state, frames, seq, 5, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings)
    dc = np.asarray(out.confidence - state.confidence)[:, 0]
    um = np.asarray(unstable_mask(state))
    assert dc[um].max() == 5           # touched every iteration
    assert np.all(dc[~um] == 0)


@pytest.mark.slow
def test_dynamic_iteration_count_no_retrace():
    """n_iters is a traced bound: different counts reuse one executable."""
    state, frames, settings, lrs, hyper = _problem()
    seq = jnp.zeros(8, jnp.int32)
    for n in (1, 3, 8):
        out, _ = optimize.run_optimize(
            state, frames, seq, n, alive_mask(state), unstable_mask(state),
            lrs, hyper, settings)
        assert np.isfinite(np.asarray(out.xyz)).all()


@pytest.mark.slow
def test_freeze_binning_quality():
    """optimize_freeze_binning (sort/bin once per call) must (a) be EXACTLY
    the per-iteration path when parameters don't move (zero lr), and (b)
    still optimize: loss decreases and lands within 1.5x of the exact
    path's final loss on the tiny problem."""
    state, frames, settings, lrs, hyper = _problem()
    frames = frames._replace(color=jnp.full_like(frames.color, 0.8))
    lrs = dict(lrs, features_dc=jnp.float32(2e-2))
    weights = {
        "color_weight": jnp.float32(0.8),
        "depth_weight": jnp.float32(1.0),
        "normal_weight": jnp.float32(0.0),
        "add_depth_thres": jnp.float32(0.1),
    }
    seq = jnp.zeros(30, jnp.int32)

    def run(n_iters, lrs_, freeze):
        return optimize.optimize_chain(
            state, frames.color, frames.depth, frames.normal,
            frames.w2c, frames.K, frames.campos, seq, n_iters,
            lrs_, weights, settings, mode="local", sample_ratio=-1.0,
            mask_depth_positive=False, max_weight=0.5,
            freeze_binning=freeze)

    # (a) zero learning rate -> no parameter drift -> bit-equal losses
    lrs0 = {k: jnp.float32(0.0) for k in optimize.PARAM_KEYS}
    _, r_e0 = run(3, lrs0, False)
    _, r_f0 = run(3, lrs0, True)
    assert np.isclose(float(r_e0["total"]), float(r_f0["total"]),
                      rtol=1e-6, atol=1e-7)

    # (b) real optimization: frozen path converges comparably
    _, r1 = run(1, lrs, False)
    _, r_e = run(30, lrs, False)
    _, r_f = run(30, lrs, True)
    assert float(r_f["color"]) < float(r1["color"])
    assert float(r_f["total"]) <= 1.5 * float(r_e["total"]) + 1e-4


@pytest.mark.slow
def test_compact_matches_freeze():
    """The two-stage compact path (optimize_prepare -> optimize_execute with
    host-picked static buckets) must reproduce the freeze_binning path's
    result: the crops only ever remove sentinel entries when Vc >= n_visible
    and Ktc >= max tile count, so the iteration math is identical."""
    state, frames, settings, lrs, hyper = _problem()
    frames = frames._replace(color=jnp.full_like(frames.color, 0.8))
    lrs = dict(lrs, features_dc=jnp.float32(2e-2))
    weights = {
        "color_weight": jnp.float32(0.8),
        "depth_weight": jnp.float32(1.0),
        "normal_weight": jnp.float32(0.0),
        "add_depth_thres": jnp.float32(0.1),
    }
    seq = jnp.zeros(12, jnp.int32)
    n_iters = 12

    ref_state, ref_report = optimize.optimize_chain(
        state, frames.color, frames.depth, frames.normal,
        frames.w2c, frames.K, frames.campos, seq, n_iters,
        lrs, weights, settings, mode="local", sample_ratio=-1.0,
        mask_depth_positive=False, max_weight=0.5, freeze_binning=True)

    (rmasks, tiles, lists_orig, counts, pool_order, tile_order,
     n_pool, cnt_max, n_live_tiles) = optimize.optimize_prepare(
        state, frames.color, frames.depth, frames.normal,
        frames.w2c, frames.K, frames.campos, settings=settings,
        mode="local", sample_ratio=-1.0, mask_depth_positive=False)

    def bucket(n, floor, cap):
        b = floor
        while b < n:
            b *= 2
        return min(b, cap)

    # deliberately SMALLER than the full shapes so the crops are exercised
    Ac = bucket(int(n_pool), 64, pool_order.shape[0])
    Ktc = bucket(int(cnt_max), 64, lists_orig.shape[-1])
    T_full = counts.shape[-1]
    Tc = bucket(int(n_live_tiles), 4, T_full)
    assert (Ac < pool_order.shape[0] or Ktc < lists_orig.shape[-1]
            or Tc < T_full), \
        "tiny problem should exercise at least one real crop"

    out_state, out_report = optimize.optimize_execute(
        state, frames.color, frames.depth, frames.normal,
        frames.w2c, frames.K, frames.campos,
        rmasks, lists_orig, counts, pool_order[:Ac], n_pool,
        tile_order[:, :Tc],
        seq, n_iters, lrs, weights, settings,
        mode="local", max_weight=0.5, Ac=Ac, Ktc=Ktc, Tc=Tc)

    np.testing.assert_allclose(np.asarray(out_state.xyz),
                               np.asarray(ref_state.xyz),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_state.features_dc),
                               np.asarray(ref_state.features_dc),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_state.opacity),
                               np.asarray(ref_state.opacity),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_state.confidence),
                                  np.asarray(ref_state.confidence))
    assert np.isclose(float(out_report["total"]), float(ref_report["total"]),
                      rtol=1e-5, atol=1e-6)
