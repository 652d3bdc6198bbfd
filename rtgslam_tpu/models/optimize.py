"""Fused Gaussian-map optimization loop.

The reference's hot loop (``local_optimize`` mapper.py:143-210 /
``global_optimization`` mapper.py:594-712) alternates render -> backward ->
Adam per iteration from Python.  Here the WHOLE loop — render (differentiable
blend), loss, gradient, masked sparse Adam, confidence bump — runs inside one
``lax.fori_loop`` under a single jit: zero host round-trips per iteration,
which is what makes the >=30 FPS budget feasible on TPU.

Loss semantics (``loss_update``, mapper.py:371-469):
  * masked L1 color over the frame's render mask;
  * masked L1 depth where the opaque-depth hit exists, gt depth > 0 and the
    signed error is below the spawn threshold;
  * optional cosine normal loss;
  * "attach" anchor: gaussians whose pre-optimization opacity < 0.9 are
    pulled toward their snapshot xyz/scaling/rotation with weight 1000;
  * SSIM only applies when no render mask is given (never in the SLAM path).

Adam matches ``torch.optim.Adam(eps=1e-15)`` with per-group learning rates
(``parametrize``, gaussian_pointcloud.py:245-284) and a fresh state per call.
Updates are masked to the optimized pool (unstable for local, stable for
global) — the reference achieves the same by only parametrizing that pool.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.rasterize.api import RasterSettings, _render_impl
from .gaussian_map import (
    MapState, activated_opacity, activated_scales, derived_normal,
    shs_from_features,
)
from ..ops.segment import stable_partition_order
from ..utils.geometry import normalize
from .losses import masked_mean

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-15

PARAM_KEYS = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


class FrameBatch(NamedTuple):
    """Stacked per-frame optimization inputs (device arrays, leading dim F)."""

    color: jnp.ndarray        # [F, H, W, 3]
    depth: jnp.ndarray        # [F, H, W]
    normal: jnp.ndarray       # [F, H, W, 3]
    w2c: jnp.ndarray          # [F, 4, 4]
    K: jnp.ndarray            # [F, 3, 3]
    campos: jnp.ndarray       # [F, 3]
    render_mask: jnp.ndarray  # [F, H, W] bool
    tile_mask: jnp.ndarray    # [F, ty, tx] int32


def _image_losses(out, frame, hyper):
    """Masked color/depth/normal losses over one rendered frame
    (``loss_update`` semantics, mapper.py:371-469) — shared by the full,
    fixed-binning and compact render paths (index-map space-agnostic:
    only ``>= 0`` is tested)."""
    rmask = frame["render_mask"]
    color_loss = masked_mean(
        jnp.sum(jnp.abs(out["render"] - frame["color"]), axis=-1) / 3.0, rmask)
    # the reference takes l1 over 3 channels of masked pixels: same mean

    depth = out["depth"][..., 0]
    gt_depth = frame["depth"]
    depth_err = depth - gt_depth
    dmask = (out["depth_index_map"] >= 0) & (gt_depth > 0) \
        & (depth_err < hyper["add_depth_thres"]) & rmask
    depth_loss = masked_mean(jnp.abs(depth_err), dmask)

    gt_normal = frame["normal"]
    cos = jnp.sum(out["normal"] * gt_normal, axis=-1) / (
        jnp.linalg.norm(out["normal"], axis=-1)
        * jnp.linalg.norm(gt_normal, axis=-1) + 1e-8)
    nmask = rmask & (out["depth_index_map"] >= 0) \
        & jnp.any(gt_normal != 0, axis=-1)
    normal_loss = masked_mean(1.0 - cos, nmask)
    return color_loss, depth_loss, normal_loss


def _attach_loss(params, aux, hyper):
    """Anchor low-opacity gaussians to their pre-optimization snapshot
    (weight 1000, mapper.py:445-453) — full-[P] row-masked means."""
    attach_rows = (activated_opacity(hyper["hist_opacity"])[:, 0] < 0.9) \
        & aux["update_mask"]

    def row_l2(a, b):
        per_row = jnp.mean((a - b).reshape(a.shape[0], -1) ** 2, axis=-1)
        return masked_mean(per_row, attach_rows)

    return 1000.0 * (
        row_l2(params["scaling"], hyper["hist_scaling"])
        + row_l2(params["xyz"], hyper["hist_xyz"])
        + row_l2(params["rotation"], hyper["hist_rotation_raw"])
    )


def _loss_fn(params: Dict[str, jnp.ndarray], aux, frame, settings: RasterSettings,
             hyper: Dict[str, jnp.ndarray]):
    gauss = {
        "xyz": params["xyz"],
        "scales": activated_scales(params["scaling"]),
        "rotations": normalize(params["rotation"]),
        "opacity": activated_opacity(params["opacity"]),
        "shs": shs_from_features(params["features_dc"], params["features_rest"]),
        "normal": derived_normal(params["scaling"], params["rotation"]),
        "alive": aux["render_alive"],
    }
    if "bin_order" in frame:
        from ..ops.rasterize.api import render_fixed_binning

        out = render_fixed_binning.__wrapped__(
            gauss, frame["bin_order"], frame["bin_tile_lists"],
            frame["bin_tile_counts"], frame["w2c"], frame["K"],
            frame["campos"], settings)
    else:
        out = _render_impl.__wrapped__(
            gauss, frame["w2c"], frame["K"], frame["campos"], frame["tile_mask"],
            settings, True, True)

    color_loss, depth_loss, normal_loss = _image_losses(out, frame, hyper)
    attach_loss = _attach_loss(params, aux, hyper)

    total = (hyper["color_weight"] * color_loss
             + hyper["depth_weight"] * depth_loss
             + hyper["normal_weight"] * normal_loss)
    report = {"total": total, "color": color_loss, "depth": depth_loss,
              "normal": normal_loss, "attach": attach_loss}
    return total + attach_loss, report


def _loss_fn_compact(params_c: Dict[str, jnp.ndarray], aux, frame,
                     settings: RasterSettings, hyper: Dict[str, jnp.ndarray]):
    """:func:`_loss_fn` over the POOL-COMPACT working set: ``params_c`` are
    the optimized pool's rows gathered ONCE per call by optimize_execute
    (not per iteration), so activation/projection/shade/blend — and, in the
    caller, Adam and its moment state — all scale with the live population
    (an [Ac] bucket) instead of the [P] capacity.  Tile lists arrive
    pre-remapped into compact row space (see api.render_compact).  The
    attach anchor runs over the same compact rows — exactly the full-[P]
    value, since attach rows ⊆ update pool ⊆ the compact basis."""
    from ..ops.rasterize.api import render_compact

    Ac = params_c["xyz"].shape[0]
    gauss_c = {
        "xyz": params_c["xyz"],
        "scales": activated_scales(params_c["scaling"]),
        "rotations": normalize(params_c["rotation"]),
        "opacity": activated_opacity(params_c["opacity"]),
        "shs_flat": shs_from_features(
            params_c["features_dc"], params_c["features_rest"]).reshape(Ac, -1),
        "normal": derived_normal(params_c["scaling"], params_c["rotation"]),
        "valid": aux["row_valid"],
    }
    out = render_compact.__wrapped__(
        gauss_c, frame["tile_lists_c"], frame["tile_counts_c"],
        frame["w2c"], frame["K"], frame["campos"], settings,
        tile_rows=frame.get("tile_rows"),
        tile_origins=frame.get("tile_origins"),
        n_tiles_full=frame.get("n_tiles_full"))

    color_loss, depth_loss, normal_loss = _image_losses(out, frame, hyper)
    attach_loss = _attach_loss(params_c, aux, hyper)

    total = (hyper["color_weight"] * color_loss
             + hyper["depth_weight"] * depth_loss
             + hyper["normal_weight"] * normal_loss)
    report = {"total": total, "color": color_loss, "depth": depth_loss,
              "normal": normal_loss, "attach": attach_loss}
    return total + attach_loss, report


def _adam_step(params, grads, m, v, step, lrs, update_mask):
    new_params, new_m, new_v = {}, {}, {}
    t = step.astype(jnp.float32) + 1.0
    c1 = 1.0 - ADAM_B1 ** t
    c2 = 1.0 - ADAM_B2 ** t
    for k in PARAM_KEYS:
        g = grads[k]
        mask = update_mask.reshape((-1,) + (1,) * (g.ndim - 1))
        g = jnp.where(mask, g, 0.0)
        m_k = ADAM_B1 * m[k] + (1 - ADAM_B1) * g
        v_k = ADAM_B2 * v[k] + (1 - ADAM_B2) * g * g
        update = lrs[k] * (m_k / c1) / (jnp.sqrt(v_k / c2) + ADAM_EPS)
        new_params[k] = params[k] - jnp.where(mask, update, 0.0)
        new_m[k], new_v[k] = m_k, v_k
    return new_params, new_m, new_v


@partial(jax.jit, static_argnames=("settings",))
def run_optimize(
    state: MapState,
    frames: FrameBatch,
    frame_seq: jnp.ndarray,       # [n_max] int32 frame index per iteration
    n_iters,                      # traced scalar <= len(frame_seq)
    render_alive: jnp.ndarray,    # [P] bool: pool rendered each iteration
    update_mask: jnp.ndarray,     # [P] bool: pool receiving updates
    lrs: Dict[str, jnp.ndarray],
    hyper: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    frozen_bins: Optional[Dict[str, jnp.ndarray]] = None,
):
    """Run the optimization loop; returns (state', confidence-aware, report).

    ``frozen_bins`` (optional): per-frame precomputed binning
    {"order" [F, V], "tile_lists" [F, T, Kt], "tile_counts" [F, T]} — when
    given, every iteration renders through api.render_fixed_binning
    instead of re-sorting/re-binning (see optimize_chain freeze_binning).
    """
    params = state.params()
    zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
    aux = {"render_alive": render_alive, "update_mask": update_mask}

    def body(i, carry):
        params, m, v, confidence, _ = carry
        f = frame_seq[i]
        frame = {
            "color": frames.color[f],
            "depth": frames.depth[f],
            "normal": frames.normal[f],
            "w2c": frames.w2c[f],
            "K": frames.K[f],
            "campos": frames.campos[f],
            "render_mask": frames.render_mask[f],
            "tile_mask": frames.tile_mask[f],
        }
        if frozen_bins is not None:
            frame["bin_order"] = frozen_bins["order"][f]
            frame["bin_tile_lists"] = frozen_bins["tile_lists"][f]
            frame["bin_tile_counts"] = frozen_bins["tile_counts"][f]
        (_, report), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            params, aux, frame, settings, hyper)
        params, m, v = _adam_step(params, grads, m, v, i, lrs, update_mask)
        touched = jnp.any(grads["features_dc"] != 0, axis=-1) & update_mask
        confidence = confidence + touched[:, None].astype(jnp.float32)
        return params, m, v, confidence, report

    init_report = {k: jnp.float32(0) for k in ("total", "color", "depth", "normal", "attach")}
    params, _, _, confidence, report = jax.lax.fori_loop(
        0, n_iters, body,
        (params, zeros, dict(zeros), state.confidence, init_report))
    return state.with_params(params).replace(confidence=confidence), report


def _make_masks_impl(state, cams, settings, mode, sample_ratio, H, W):
    """Per-frame partial-render masks (``evaluate_render_range``,
    mapper.py:471-508) — the shared first stage of optimize_chain and
    optimize_prepare.  ``cams`` are stacked [F, ...]; vmapped so the F
    [P]-key depth sorts batch into one pass."""
    from ..ops import preprocess
    from .gaussian_map import render_inputs, stable_mask, unstable_mask

    local = mode == "local"
    mask_gauss = render_inputs(
        state, unstable_mask(state) if local else stable_mask(state))

    def make_masks(cam):
        if sample_ratio > 0 and not local:
            # the color-error tile selection needs the rendered colors
            out = _render_impl.__wrapped__(
                mask_gauss, cam["w2c"], cam["K"], cam["campos"], None,
                settings, False, False)
            err = jnp.sum(jnp.abs(out["render"] - cam["gt_color"]), axis=-1)
            err = jnp.where(jnp.sum(out["render"], axis=-1) == 0, 0.0, err)
            tile = preprocess.colorerror_to_tilemask(err, 16, sample_ratio)
            rmask = preprocess.tilemask_to_pixelmask(tile, H, W)
            return rmask, tile
        # transmission-only masks: the light render variant (same alpha
        # math, no color/depth/shade) — the only consumer is T != 1
        from ..ops.rasterize.api import render_transmission

        out = render_transmission.__wrapped__(
            mask_gauss, cam["w2c"], cam["K"], cam["campos"], settings)
        T = out["T_map"][..., 0]
        # rmask is NOT intersected with the tile mask, so loss pixels in
        # skipped (<50%-coverage) tiles see background renders —
        # reference parity: evaluate_render_range returns the raw
        # transmission mask alongside the pooled tile mask and
        # loss_update consumes it as-is (mapper.py:503-505, :371-468)
        rmask = T != 1.0
        if local:
            tile = preprocess.transmission_to_tilemask(rmask, 16, 0.5)
        else:
            tile = jnp.ones(((H + 15) // 16, (W + 15) // 16), jnp.int32)
        return rmask, tile

    return jax.lax.map(make_masks, cams)    # lax.map: see optimize_prepare


@partial(jax.jit, static_argnames=(
    "settings", "mode", "sample_ratio", "mask_depth_positive", "row_limit"))
def optimize_prepare(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F, ...]
    settings: RasterSettings,
    mode: str,
    sample_ratio: float,
    mask_depth_positive: bool,
    row_limit: Optional[int] = None,
):
    """Stage 1 of the compact optimize path: per-frame partial-render masks
    + one frozen binning pass per frame, plus the occupancy scalars the host
    needs to pick the static compaction buckets for
    :func:`optimize_execute`.

    LOCAL mode shares ONE projection / [P]-key depth sort / binning pass per
    frame between the mask render and the frozen bins: the mask is the
    unstable pool's transmission, and unstable is a subset of alive, so the
    alive pass's tile lists reproduce it exactly with non-unstable alpha
    contributions zeroed (the pool-variant render trick,
    api.render_model_and_stable) — the separate mask-render pipeline (its
    own projection + sort + binning, reference ``evaluate_render_range``
    mapper.py:471-508) collapses into one cheap transmission blend.  The
    local tile mask (>=50 %-coverage pooling of the mask) is applied AFTER
    binning by zeroing tile counts (binning.tile_mask_flat) —
    blend-equivalent to binning under the mask.  GLOBAL mode keeps the
    two-stage structure (the sample_ratio > 0 branch needs a full color
    render of the stable pool first).

    ``row_limit`` (static) bounds every [P]-row stage to the occupied slot
    prefix (inserts fill the lowest free slots — the same high-water-mark
    bucketing the KNN scans use, mapper._cached_hwm); slot ids are preserved
    by the prefix so all returned indices remain original map slots.

    Returns (rmasks [F,H,W], tiles [F,ty,tx], lists_orig [F,T,Kt] — tile
    lists in ORIGINAL slot space (sentinel = capacity), tile_counts [F,T],
    pool_order [L], tile_order [F,T] — per-frame live-tile-first partition
    of the tile axis, n_pool [], cnt_max [], n_live_tiles []).  Slot-space
    lists keep :func:`optimize_execute`'s signature independent of
    ``row_limit``, so high-water-mark bucket crossings recompile only this
    (cheaper) stage.  The host fetches only the three scalars (one small
    D2H round trip on the 1-in-gaussian_update_frame optimize frames).
    """
    from ..ops.rasterize import binning as binning_mod
    from ..ops.rasterize import blend as blend_mod
    from ..ops.rasterize.project import project_geometry
    from ..ops import preprocess
    from .gaussian_map import (
        activated_opacity, activated_scales, alive_mask, render_inputs,
        stable_mask, unstable_mask)

    H, W = settings.height, settings.width
    local = mode == "local"
    L = row_limit or state.capacity
    pool_full = alive_mask(state) if local else stable_mask(state)
    # compact basis: pool rows first (stable partition), original slot ids
    pool_order = stable_partition_order(pool_full[:L])
    n_pool = jnp.sum(pool_full[:L]).astype(jnp.int32)

    if local:
        pool = pool_full[:L]
        mask_pool = unstable_mask(state)[:L].astype(jnp.float32)
        xyz = state.xyz[:L]
        scales = activated_scales(state.scaling[:L])
        rots = normalize(state.rotation[:L])
        opa = activated_opacity(state.opacity[:L]).reshape(-1)

        def per_frame(cam, depth):
            geo = project_geometry(
                xyz, scales, rots, pool, cam["w2c"], cam["K"], W, H,
                settings.scale_modifier)
            bins = binning_mod.bin_gaussians(
                geo, H, W, settings.block_capacity, settings.tile_capacity,
                min(settings.max_visible, L), tile_mask=None)
            order = bins.order
            zero = jnp.zeros((1,), jnp.float32)
            # 6 transmission columns with the unstable-pool contribution
            # mask folded into opacity (zero alpha = blend-invisible)
            cols = tuple(
                jnp.concatenate([col, zero])[bins.tile_lists]
                for col in (geo.mean2d[order, 0], geo.mean2d[order, 1],
                            geo.conic[order, 0], geo.conic[order, 1],
                            geo.conic[order, 2],
                            opa[order] * mask_pool[order]))
            T = blend_mod.blend_transmission_blocked(
                cols, bins.tile_counts, binning_mod.tile_origins(H, W),
                T_threshold=settings.T_threshold)
            T_map = binning_mod.scatter_tiles(
                T.reshape(T.shape[0], blend_mod.TILE * blend_mod.TILE, 1),
                H, W)
            rmask = T_map[..., 0] != 1.0
            tile = preprocess.transmission_to_tilemask(rmask, 16, 0.5)
            counts = jnp.where(
                binning_mod.tile_mask_flat(tile, H, W) > 0,
                bins.tile_counts, 0)
            if mask_depth_positive:
                rmask = rmask & (depth > 0)
            # sorted position -> original slot (sentinel V' -> capacity)
            order_pad = jnp.concatenate(
                [order, jnp.array([state.capacity], jnp.int32)])
            return rmask, tile, order_pad[bins.tile_lists], counts

        # lax.map over frames: with the compaction scatter marked
        # unique_indices (binning._compact_rows) vmap and lax.map measure
        # identical on the v5e (scripts/prepare_probe.py — the radix-sort
        # scatter expansion that penalized the vmapped form is gone);
        # lax.map keeps the executable one-frame-sized.
        rmasks, tiles, lists_orig, counts = jax.lax.map(
            lambda cd: per_frame(cd[0], cd[1]),
            ({"w2c": w2cs, "K": Ks, "campos": camposes}, depths))
        tile_order = jax.vmap(lambda c: stable_partition_order(c > 0))(counts)
        n_live_tiles = jnp.max(jnp.sum(counts > 0, axis=1))
        return (rmasks, tiles, lists_orig, counts,
                pool_order, tile_order, n_pool, jnp.max(counts),
                n_live_tiles)

    # ---- global mode: masks first, then the frozen binning pass ----------
    cams = {"w2c": w2cs, "K": Ks, "campos": camposes}
    if sample_ratio > 0:
        cams["gt_color"] = colors
    rmasks, tiles = _make_masks_impl(state, cams, settings, mode,
                                     sample_ratio, H, W)
    if mask_depth_positive:
        rmasks = rmasks & (depths > 0)

    gauss0 = render_inputs(state, pool_full)
    gauss0 = {k: (v[:L] if hasattr(v, "ndim") and v.ndim >= 1
                  and v.shape[0] == state.capacity else v)
              for k, v in gauss0.items()}

    def make_bins(cam, tile):
        geo = project_geometry(
            gauss0["xyz"], gauss0["scales"], gauss0["rotations"],
            gauss0["alive"], cam["w2c"], cam["K"], W, H,
            settings.scale_modifier)
        bins = binning_mod.bin_gaussians(
            geo, H, W, settings.block_capacity, settings.tile_capacity,
            min(settings.max_visible, L), tile_mask=tile)
        order_pad = jnp.concatenate(
            [bins.order, jnp.array([state.capacity], jnp.int32)])
        return order_pad[bins.tile_lists], bins.tile_counts

    lists_orig, counts = jax.lax.map(       # lax.map: see local-mode note
        lambda ct: make_bins(ct[0], ct[1]),
        ({"w2c": w2cs, "K": Ks, "campos": camposes}, tiles))
    tile_order = jax.vmap(lambda c: stable_partition_order(c > 0))(counts)
    n_live_tiles = jnp.max(jnp.sum(counts > 0, axis=1))
    return (rmasks, tiles, lists_orig, counts,
            pool_order, tile_order, n_pool, jnp.max(counts), n_live_tiles)


@partial(jax.jit, static_argnames=("settings", "mode", "max_weight",
                                   "Ac", "Ktc", "Tc"))
def optimize_execute(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F, ...]
    rmasks,                                        # from optimize_prepare
    lists_orig, counts, pool_rows, n_pool,         # from optimize_prepare
    tile_rows,                                     # [F, Tc] live-first tiles
    frame_seq: jnp.ndarray,
    n_iters,
    lrs: Dict[str, jnp.ndarray],
    weights: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    mode: str,
    max_weight: float,
    Ac: int,
    Ktc: int,
    Tc: Optional[int] = None,
):
    """Stage 2 of the compact optimize path: the render->loss->grad->Adam
    loop in POOL-COMPACT space, followed by the local-mode history merge —
    one executable, like optimize_chain's loop.

    The optimized pool's rows (alive for local, stable for global) are
    gathered ONCE into an [Ac] bucket; params, Adam moments, the attach
    anchor, the confidence counter and every per-iteration render stage
    live in that space, and the per-frame slot-space tile lists are
    remapped into it once up front (visible is a subset of the pool so
    every real entry remaps; ``pool_rows`` is pool_order already cropped to
    [Ac] by the caller, keeping this signature independent of the prepare
    stage's row_limit).  Updated rows scatter back to the full [P] SoA once
    at the end.  ``Ac``/``Ktc``/``Tc`` are
    static host-picked power-of-two buckets with ``Ac >= n_pool``,
    ``Ktc >= max(counts)`` and ``Tc >= max per-frame live-tile count``;
    under those bounds the math is identical to the freeze_binning path
    (test_compact_matches_freeze).  ``tile_rows`` ([F, Tc], from prepare's
    ``tile_order``) compacts the TILE axis the same way ``pool_rows``
    compacts the row axis: at steady state the local mask leaves only
    ~15-55 % of tiles with any optimized-pool contribution, yet the
    vmapped-while blend moves every tile's [256, Ktc] alpha block per joint
    trip — rendering only the live-tile prefix and scattering outputs back
    (render_compact tile_rows path) cuts the fwd+bwd blend proportionally.
    Measured slope at the 170x300 bench point: plain 25.0 -> frozen 13.7 ->
    pool-compact ~5 ms per iteration (OPT_ITER_PROBE.json /
    OPT_COMPACT_PROBE.json); tile compaction multiplies the live-tile
    fraction on top.
    """
    from .map_ops import capture_history, history_merge
    from .gaussian_map import stable_mask, unstable_mask

    P = state.capacity
    local = mode == "local"
    update_full = unstable_mask(state) if local else stable_mask(state)
    hist = capture_history(state)

    # ---- compact basis (once per call) -----------------------------------
    rows = pool_rows                                  # [Ac] original slot ids
    row_valid = jnp.arange(Ac, dtype=jnp.int32) < n_pool
    params_full = state.params()
    params_c = {k: v[rows] for k, v in params_full.items()}
    update_c = update_full[rows] & row_valid
    conf_c = state.confidence[rows]
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"][rows],
                 hist_scaling=hist["scaling"][rows],
                 hist_xyz=hist["xyz"][rows],
                 hist_rotation_raw=hist["rotation_raw"][rows])
    aux = {"update_mask": update_c, "row_valid": row_valid}

    # ---- remap tile lists into compact row space (once per call) ---------
    # original slot (sentinel P) -> compact row (sentinel Ac)
    inv = jnp.full((P + 1,), Ac, jnp.int32)
    inv = inv.at[jnp.where(row_valid, rows, P)].set(
        jnp.arange(Ac, dtype=jnp.int32))
    inv = inv.at[P].set(Ac)
    lists_a = inv[lists_orig[:, :, :Ktc]]
    counts_c = jnp.minimum(counts, Ktc)

    # ---- compact the TILE axis (once per call) ----------------------------
    # At steady state most tiles carry no optimized-pool contribution (the
    # local mask zeroes their counts — measured live fraction 15-55 % on the
    # synthetic run), yet a vmapped while_loop still moves every tile's
    # [256, Ktc] alpha block on every joint trip.  Gather the live-first
    # tile prefix ([F, Tc], host-bucketed like Ac/Ktc) so the fwd+bwd blend
    # scales with LIVE tiles; the render scatters tile outputs back to the
    # full grid (dead tiles = the blend's zero-trip init values, exactly
    # what the full-grid blend produces for count == 0).
    from ..ops.rasterize import binning as binning_mod

    H, W = settings.height, settings.width
    T_full = counts.shape[1]
    if Tc is None:
        Tc = T_full
    trows = tile_rows[:, :Tc]
    lists_ct = jnp.take_along_axis(lists_a, trows[:, :, None], axis=1)
    counts_ct = jnp.take_along_axis(counts_c, trows, axis=1)
    origins_ct = binning_mod.tile_origins(H, W)[trows]

    zeros = {k: jnp.zeros_like(v) for k, v in params_c.items()}

    def body(i, carry):
        params_c, m, v, conf_c, _ = carry
        f = frame_seq[i]
        frame = {
            "color": colors[f], "depth": depths[f], "normal": normals[f],
            "w2c": w2cs[f], "K": Ks[f], "campos": camposes[f],
            "render_mask": rmasks[f],
            "tile_lists_c": lists_ct[f],
            "tile_counts_c": counts_ct[f],
            "tile_rows": trows[f],
            "tile_origins": origins_ct[f],
            "n_tiles_full": T_full,
        }
        (_, report), grads = jax.value_and_grad(_loss_fn_compact, has_aux=True)(
            params_c, aux, frame, settings, hyper)
        params_c, m, v = _adam_step(params_c, grads, m, v, i, lrs, update_c)
        touched = jnp.any(grads["features_dc"] != 0, axis=-1) & update_c
        conf_c = conf_c + touched[:, None].astype(jnp.float32)
        return params_c, m, v, conf_c, report

    init_report = {k: jnp.float32(0)
                   for k in ("total", "color", "depth", "normal", "attach")}
    params_c, _, _, conf_c, report = jax.lax.fori_loop(
        0, n_iters, body,
        (params_c, zeros, dict(zeros), conf_c, init_report))

    # ---- scatter compact rows back into the full SoA ---------------------
    scatter_idx = jnp.where(row_valid, rows, P)       # OOB rows drop
    params = {k: v.at[scatter_idx].set(params_c[k], mode="drop")
              for k, v in params_full.items()}
    confidence = state.confidence.at[scatter_idx].set(conf_c, mode="drop")
    state = state.with_params(params).replace(confidence=confidence)
    if local:
        state = history_merge(state, hist, max_weight, unstable_mask(state))
    return state, report


@partial(jax.jit, static_argnames=(
    "settings", "mode", "sample_ratio", "mask_depth_positive", "max_weight",
    "freeze_binning"))
def optimize_chain(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F, ...]
    frame_seq: jnp.ndarray,
    n_iters,
    lrs: Dict[str, jnp.ndarray],
    weights: Dict[str, jnp.ndarray],   # color/depth/normal weights + add_depth_thres
    settings: RasterSettings,
    mode: str,                         # "local" | "global"
    sample_ratio: float,               # >0: top-k color-error tiles (global)
    mask_depth_positive: bool,
    max_weight: float,                 # history-merge weight (local mode)
    freeze_binning: bool = False,      # sort/bin once per call, not per iter
):
    """The COMPLETE local/global optimization pass as ONE executable.

    Covers reference ``local_optimize`` (mapper.py:143-210) / the windowed
    part of ``global_optimization`` (mapper.py:594-712): history snapshot,
    the per-frame partial-render masks (``evaluate_render_range``,
    mapper.py:471-508 — one inference render per memory frame), the
    render->loss->grad->Adam loop, and the history EMA merge.  The host
    previously issued 2 + 3*F separate dispatches for this; each one costs
    a device round trip.
    """
    from .map_ops import capture_history, history_merge
    from .gaussian_map import alive_mask, render_inputs, stable_mask, unstable_mask

    H, W = settings.height, settings.width
    local = mode == "local"
    render_alive = alive_mask(state) if local else stable_mask(state)
    update_mask = unstable_mask(state) if local else stable_mask(state)
    hist = capture_history(state)
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                 hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])

    cams = {"w2c": w2cs, "K": Ks, "campos": camposes}
    if not local and sample_ratio > 0:
        cams["gt_color"] = colors
    # vmap, not lax.map: the F per-frame mask renders batch into ONE pass —
    # in particular the F [P]-key depth sorts become one batched sort, and
    # the per-tile early-exit while loops run lockstep across frames (the
    # few extra masked iterations are far cheaper than F sequential
    # dispatch chains)
    rmasks, tiles = _make_masks_impl(state, cams, settings, mode,
                                     sample_ratio, H, W)
    if mask_depth_positive:
        rmasks = rmasks & (depths > 0)

    frames = FrameBatch(color=colors, depth=depths, normal=normals,
                        w2c=w2cs, K=Ks, campos=camposes,
                        render_mask=rmasks, tile_mask=tiles)

    frozen_bins = None
    if freeze_binning:
        # one batched sort/bin pass over the F frames from the INITIAL
        # parameters; every iteration then reuses its frame's lists
        # (api.render_fixed_binning documents the approximation)
        from ..ops.rasterize.project import project_geometry

        gauss0 = render_inputs(state, render_alive)

        def make_bins(cam, tile):
            from ..ops.rasterize import binning as binning_mod

            geo = project_geometry(
                gauss0["xyz"], gauss0["scales"], gauss0["rotations"],
                gauss0["alive"], cam["w2c"], cam["K"], W, H,
                settings.scale_modifier)
            bins = binning_mod.bin_gaussians(
                geo, H, W, settings.block_capacity, settings.tile_capacity,
                settings.max_visible, tile_mask=tile)
            return bins.order, bins.tile_lists, bins.tile_counts

        orders, lists, counts = jax.vmap(make_bins)(
            {"w2c": w2cs, "K": Ks, "campos": camposes}, tiles)
        frozen_bins = {"order": orders, "tile_lists": lists,
                       "tile_counts": counts}

    state, report = run_optimize.__wrapped__(
        state, frames, frame_seq, n_iters, render_alive, update_mask,
        lrs, hyper, settings, frozen_bins)
    if local:
        state = history_merge(state, hist, max_weight, unstable_mask(state))
    return state, report


# Mapper-facing twin donating the map state: the 50-300-iteration Adam loop
# rewrites every parameter field each call, so aliasing input to output saves
# a full SoA copy + 2x peak HBM (see map_ops.py donated-twins note for the
# caller contract).
optimize_chain_donated = partial(
    jax.jit, static_argnames=(
        "settings", "mode", "sample_ratio", "mask_depth_positive",
        "max_weight", "freeze_binning"),
    donate_argnames=("state",))(optimize_chain.__wrapped__)

# Same contract for the compact path's loop stage (the prepare stage only
# READS the state — no donation there; its outputs must survive the fetch
# of the bucket scalars).
optimize_execute_donated = partial(
    jax.jit,
    static_argnames=("settings", "mode", "max_weight", "Ac", "Ktc", "Tc"),
    donate_argnames=("state",))(optimize_execute.__wrapped__)
