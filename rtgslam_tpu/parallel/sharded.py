"""Multi-chip scaling of map optimization over a device mesh.

The reference's parallelism is a 2-stage tracker/mapper pipeline plus
intra-kernel CUDA data parallelism (SURVEY.md §2.3) — it has no multi-GPU
story.  On TPU we add one: **frame-parallel optimization**.  Global/keyframe
optimization renders F keyframes per step; placing one frame per device with
gaussian parameters replicated gives

  * per-device: project -> bin -> blend -> loss -> backward (all local);
  * one ``lax.pmean`` of the parameter gradients over the ICI ring;
  * a replicated masked-Adam update (bitwise identical on every device).

This is the classic DP recipe (psum gradients, replicated optimizer) applied
to splatting; collectives ride ICI via ``shard_map`` over a 1-D mesh.  The
same step also serves as the driver's multi-chip dry-run entry
(:func:`dryrun_multichip`).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import optimize as opt_mod
from ..models.gaussian_map import MapState
from ..ops.rasterize.api import RasterSettings


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devices, (axis,))


def dp_optimize_step(
    state: MapState,
    frames: opt_mod.FrameBatch,      # leading dim F == mesh size
    render_alive: jnp.ndarray,
    update_mask: jnp.ndarray,
    lrs: Dict[str, jnp.ndarray],
    hyper: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    mesh: Mesh,
    n_steps: int = 1,
):
    """Run ``n_steps`` frame-parallel optimization steps.

    Every device holds the full (replicated) gaussian state and one frame of
    the batch; gradients are pmean'd so the update equals a large-batch step
    over all F frames simultaneously (a strictly stronger iteration than the
    reference's one-random-frame-per-iteration loop).
    """
    axis = mesh.axis_names[0]
    params = state.params()
    aux = {"render_alive": render_alive, "update_mask": update_mask}

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(), P()),
        out_specs=(P(), P()),
        # the blend's internal scan carries start replicated and become
        # device-varying on the first chunk; skip the strict vma typecheck
        check_vma=False,
    )
    def run(params, frame_shard, lrs, hyper):
        local_frame = {
            "color": frame_shard.color[0],
            "depth": frame_shard.depth[0],
            "normal": frame_shard.normal[0],
            "w2c": frame_shard.w2c[0],
            "K": frame_shard.K[0],
            "campos": frame_shard.campos[0],
            "render_mask": frame_shard.render_mask[0],
            "tile_mask": frame_shard.tile_mask[0],
        }
        m = {k: jnp.zeros_like(v) for k, v in params.items()}
        v = {k: jnp.zeros_like(vv) for k, vv in params.items()}

        def body(i, carry):
            params, m, v, _ = carry
            (_, report), grads = jax.value_and_grad(
                opt_mod._loss_fn, has_aux=True)(
                    params, aux, local_frame, settings, hyper)
            grads = jax.lax.pmean(grads, axis)
            params, m, v = opt_mod._adam_step(
                params, grads, m, v, i, lrs, aux["update_mask"])
            return params, m, v, report

        # the loss report is device-varying (depends on the local frame), so
        # the loop carry must start device-varying too
        init_report = jax.lax.pcast(
            {k: jnp.float32(0)
             for k in ("total", "color", "depth", "normal", "attach")},
            (axis,), to="varying")
        params, _, _, report = jax.lax.fori_loop(
            0, n_steps, body, (params, m, v, init_report))
        return params, jax.lax.pmean(report["total"], axis)

    new_params, loss = run(params, frames, lrs, hyper)
    return state.with_params(new_params), loss


def dp_global_optimize(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F == mesh size]
    n_steps: int,
    lrs: Dict[str, jnp.ndarray],
    weights: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    mesh: Mesh,
    sample_ratio: float = 0.4,
    mask_depth_positive: bool = False,
):
    """Keyframe global optimization over a device mesh, complete with the
    per-keyframe partial-render masks computed ON the owning device.

    ``mask_depth_positive`` restricts the loss to pixels with valid depth
    (ScanNet++, reference mapper.py:419-420), matching the single-chip
    ``optimize_chain`` option of the same name.

    The single-chip twin is ``optimize.optimize_chain(mode="global")``; here
    each device holds one keyframe, renders its own color-error tile mask
    from the replicated stable pool, and every step takes a pmean'd gradient
    over all keyframes — a strictly larger batch than the reference's
    one-random-keyframe-per-iteration loop (mapper.py:594-712).  Used by
    ``Mapper.global_optimization`` when a mesh is configured.
    """
    from ..models.map_ops import capture_history
    from ..models.gaussian_map import render_inputs, stable_mask
    from ..ops import preprocess
    from ..ops.rasterize.api import _render_impl

    axis = mesh.axis_names[0]
    H, W = settings.height, settings.width
    params = state.params()
    hist = capture_history(state)
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                 hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])
    smask = stable_mask(state)
    aux = {"render_alive": smask, "update_mask": smask}
    mask_gauss = render_inputs(state, smask)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(params, colors, depths, normals, w2cs, Ks, camposes):
        cam_w2c, cam_K, campos = w2cs[0], Ks[0], camposes[0]
        gt_color = colors[0]
        out = _render_impl.__wrapped__(
            mask_gauss, cam_w2c, cam_K, campos, None, settings, False, False)
        if sample_ratio > 0:
            err = jnp.sum(jnp.abs(out["render"] - gt_color), axis=-1)
            err = jnp.where(jnp.sum(out["render"], axis=-1) == 0, 0.0, err)
            tile = preprocess.colorerror_to_tilemask(err, 16, sample_ratio)
            rmask = preprocess.tilemask_to_pixelmask(tile, H, W)
        else:
            rmask = out["T_map"][..., 0] != 1.0
            tile = jnp.ones(((H + 15) // 16, (W + 15) // 16), jnp.int32)
        if mask_depth_positive:
            rmask = rmask & (depths[0] > 0)
        local_frame = {
            "color": gt_color, "depth": depths[0], "normal": normals[0],
            "w2c": cam_w2c, "K": cam_K, "campos": campos,
            "render_mask": rmask, "tile_mask": tile,
        }
        m = {k: jnp.zeros_like(v) for k, v in params.items()}
        v = {k: jnp.zeros_like(vv) for k, vv in params.items()}

        def body(i, carry):
            params, m, v, _ = carry
            (_, report), grads = jax.value_and_grad(
                opt_mod._loss_fn, has_aux=True)(
                    params, aux, local_frame, settings, hyper)
            grads = jax.lax.pmean(grads, axis)
            params, m, v = opt_mod._adam_step(
                params, grads, m, v, i, lrs, aux["update_mask"])
            return params, m, v, report

        init_report = jax.lax.pcast(
            {k: jnp.float32(0)
             for k in ("total", "color", "depth", "normal", "attach")},
            (axis,), to="varying")
        params, _, _, report = jax.lax.fori_loop(
            0, n_steps, body, (params, m, v, init_report))
        return params, jax.lax.pmean(report["total"], axis)

    new_params, loss = run(params, colors, depths, normals, w2cs, Ks, camposes)
    return state.with_params(new_params), loss


def dp_local_optimize(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F == mesh size]
    n_steps: int,
    lrs: Dict[str, jnp.ndarray],
    weights: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    mesh: Mesh,
    mask_depth_positive: bool = False,
    max_weight: float = 10.0,
):
    """Frame-parallel LOCAL optimization over the memory window — the #1 hot
    loop (SURVEY §3.5) on the mesh.

    One memory frame per device; each device renders its own unstable-pool
    transmission mask (the ``evaluate_render_range`` masks of reference
    mapper.py:471-508) locally, every step takes a pmean'd gradient over the
    whole window, and the history snapshot/EMA merge
    (reference ``history_merge``, mapper.py:212-252) brackets the loop
    exactly like the single-chip twin ``optimize.optimize_chain
    (mode="local")``.  Called from ``Mapper.local_optimize`` when a mesh is
    configured; parity pinned by
    ``tests/test_parallel.py::test_dp_local_optimize_matches_single_chip``.
    """
    from ..models.gaussian_map import (alive_mask, render_inputs,
                                       unstable_mask)
    from ..models.map_ops import capture_history, history_merge
    from ..ops import preprocess
    from ..ops.rasterize.api import render_transmission

    axis = mesh.axis_names[0]
    params = state.params()
    hist = capture_history(state)
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                 hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])
    umask = unstable_mask(state)
    aux = {"render_alive": alive_mask(state), "update_mask": umask}
    mask_gauss = render_inputs(state, umask)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(params, colors, depths, normals, w2cs, Ks, camposes):
        cam_w2c, cam_K, campos = w2cs[0], Ks[0], camposes[0]
        out = render_transmission.__wrapped__(
            mask_gauss, cam_w2c, cam_K, campos, settings)
        # raw transmission mask feeds the loss, pooled mask gates tiles —
        # reference parity as in optimize_chain's make_masks
        rmask = out["T_map"][..., 0] != 1.0
        tile = preprocess.transmission_to_tilemask(rmask, 16, 0.5)
        if mask_depth_positive:
            rmask = rmask & (depths[0] > 0)
        local_frame = {
            "color": colors[0], "depth": depths[0], "normal": normals[0],
            "w2c": cam_w2c, "K": cam_K, "campos": campos,
            "render_mask": rmask, "tile_mask": tile,
        }
        m = {k: jnp.zeros_like(v) for k, v in params.items()}
        v = {k: jnp.zeros_like(vv) for k, vv in params.items()}

        def body(i, carry):
            params, m, v, confidence, _ = carry
            (_, report), grads = jax.value_and_grad(
                opt_mod._loss_fn, has_aux=True)(
                    params, aux, local_frame, settings, hyper)
            grads = jax.lax.pmean(grads, axis)
            params, m, v = opt_mod._adam_step(
                params, grads, m, v, i, lrs, aux["update_mask"])
            # optimization-confidence bump, exactly run_optimize's rule —
            # grads are pmean'd so the update is replicated
            touched = jnp.any(grads["features_dc"] != 0, axis=-1) \
                & aux["update_mask"]
            confidence = confidence + touched[:, None].astype(jnp.float32)
            return params, m, v, confidence, report

        init_report = jax.lax.pcast(
            {k: jnp.float32(0)
             for k in ("total", "color", "depth", "normal", "attach")},
            (axis,), to="varying")
        params, _, _, confidence, report = jax.lax.fori_loop(
            0, n_steps, body,
            (params, m, v, jax.lax.pcast(state.confidence, (axis,),
                                         to="varying"), init_report))
        return (params, jax.lax.pmean(confidence, axis),
                jax.lax.pmean(report["total"], axis))

    new_params, confidence, loss = run(params, colors, depths, normals,
                                       w2cs, Ks, camposes)
    state = state.with_params(new_params).replace(confidence=confidence)
    return history_merge(state, hist, max_weight, unstable_mask(state)), loss


# ---------------------------------------------------------------------------
# driver dry-run: compile + execute the full sharded step on a virtual mesh
# ---------------------------------------------------------------------------

def _tiny_problem(n_frames: int, H: int = 32, W: int = 32, P_cap: int = 256):
    from ..models.gaussian_map import GaussianMapConfig, UNSTABLE

    cfg = GaussianMapConfig(capacity=P_cap, temp_capacity=32)
    state = MapState.create(cfg)
    rng = np.random.default_rng(0)
    n_alive = 64
    state = state.replace(
        xyz=state.xyz.at[:n_alive].set(
            rng.uniform([-1, -1, 1.5], [1, 1, 3.5], (n_alive, 3))),
        scaling=state.scaling.at[:n_alive].set(np.log(0.1)),
        opacity=state.opacity.at[:n_alive].set(2.0),
        status=state.status.at[:n_alive].set(UNSTABLE),
    )
    K = jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    ty, tx = (H + 15) // 16, (W + 15) // 16
    frames = opt_mod.FrameBatch(
        color=jnp.full((n_frames, H, W, 3), 0.5),
        depth=jnp.full((n_frames, H, W), 2.0),
        normal=jnp.tile(jnp.asarray([0.0, 0, -1]), (n_frames, H, W, 1)),
        w2c=jnp.tile(jnp.eye(4), (n_frames, 1, 1)),
        K=jnp.tile(K, (n_frames, 1, 1)),
        campos=jnp.zeros((n_frames, 3)),
        render_mask=jnp.ones((n_frames, H, W), bool),
        tile_mask=jnp.ones((n_frames, ty, tx), jnp.int32),
    )
    settings = RasterSettings(height=H, width=W, block_capacity=128,
                              tile_capacity=64)
    return state, frames, settings


def dryrun_multichip(n_devices: int) -> None:
    """Compile and execute one full frame-parallel training step on an
    ``n_devices`` mesh with tiny shapes (driver contract)."""
    from ..models.gaussian_map import alive_mask, unstable_mask

    mesh = make_mesh(n_devices)
    state, frames, settings = _tiny_problem(n_frames=n_devices)
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
    new_state, loss = dp_optimize_step(
        state, frames, alive_mask(state), unstable_mask(state),
        lrs, hyper, settings, mesh)
    jax.block_until_ready(new_state.xyz)
    delta = float(jnp.abs(new_state.xyz - state.xyz).max())
    assert np.isfinite(float(loss)), "sharded step produced non-finite loss"
    assert delta > 0, "sharded step did not update parameters"

    # the production hot loop on the mesh: frame-parallel LOCAL optimization
    # including per-device mask renders and the history merge
    weights = {k: hyper[k] for k in
               ("color_weight", "depth_weight", "normal_weight",
                "add_depth_thres")}
    loc_state, loc_loss = dp_local_optimize(
        state, frames.color, frames.depth, frames.normal, frames.w2c,
        frames.K, frames.campos, 2, lrs, weights, settings, mesh)
    jax.block_until_ready(loc_state.xyz)
    assert np.isfinite(float(loc_loss)), "dp_local_optimize non-finite loss"

    # keyframe GLOBAL optimization on the mesh (per-device mask renders over
    # the stable pool): flip half the live rows STABLE so it has a pool
    from ..models.gaussian_map import STABLE

    g_state = state.replace(status=state.status.at[:32].set(STABLE))
    glob_state, glob_loss = dp_global_optimize(
        g_state, frames.color, frames.depth, frames.normal, frames.w2c,
        frames.K, frames.campos, 2, lrs, weights, settings, mesh,
        sample_ratio=0.4)
    jax.block_until_ready(glob_state.xyz)
    assert np.isfinite(float(glob_loss)), "dp_global_optimize non-finite loss"

    # the OTHER sharding axis: single-frame-window optimize with the tile
    # axis sharded over the same mesh (spatial parallelism, sp_optimize.py)
    from .sp_optimize import sp_optimize_execute

    (rmasks, _, lists_orig, counts, pool_order, tile_order,
     n_pool, cnt_max, n_live_t) = opt_mod.optimize_prepare(
        state, frames.color, frames.depth, frames.normal, frames.w2c,
        frames.K, frames.campos, settings=settings, mode="local",
        sample_ratio=-1.0, mask_depth_positive=False)

    def bucket(n, lo, hi):
        b = lo
        while b < n:
            b *= 2
        return min(b, hi)

    T_full = counts.shape[-1]
    Ac = bucket(int(n_pool), 64, pool_order.shape[0])
    Ktc = bucket(int(cnt_max), 64, lists_orig.shape[-1])
    Tc = bucket(max(int(n_live_t), n_devices), n_devices, T_full)
    sp_state, sp_report = sp_optimize_execute(
        state, frames.color, frames.depth, frames.normal, frames.w2c,
        frames.K, frames.campos, rmasks, lists_orig, counts,
        pool_order[:Ac], n_pool, tile_order[:, :Tc],
        jnp.zeros(2, jnp.int32), 2, lrs, weights, settings,
        mode="local", max_weight=5.0, Ac=Ac, Ktc=Ktc, Tc=Tc, mesh=mesh)
    jax.block_until_ready(sp_state.xyz)
    sp_loss = float(sp_report["total"])
    assert np.isfinite(sp_loss), "sp_optimize_execute non-finite loss"
    print(f"[dryrun_multichip] mesh={mesh.shape} loss={float(loss):.4f} "
          f"max|dxyz|={delta:.2e} local_loss={float(loc_loss):.4f} "
          f"global_loss={float(glob_loss):.4f} sp_loss={sp_loss:.4f} OK")
