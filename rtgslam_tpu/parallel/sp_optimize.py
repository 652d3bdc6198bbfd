"""Tile-sharded (spatial-parallel) map optimization over a device mesh.

`sharded.py` scales the optimize loop by FRAMES (one memory frame per
device) — which leaves a single-frame (or narrow-window) optimize call
capped at one chip.  This module shards the other axis of the compact
optimize formulation (`models/optimize.py::optimize_execute`): the
live-tile prefix.  Gaussian parameters stay replicated ([Ac] compact pool,
a few MB); each device blends and differentiates ITS slice of the tile
axis; the loss terms are masked means whose numerators/denominators are
``psum``'d over the mesh, and the per-device parameter gradients are
``psum``'d so the replicated masked-Adam update is identical on every
device.  Collectives per iteration: one scalar psum pack + one [Ac]-sized
gradient psum, riding the ICI ring.

Why this decomposes exactly: the SLAM-path losses (reference
``loss_update``, SLAM/multiprocess/mapper.py:371-469) are pixelwise masked
L1/cosine means — no SSIM (never applied under a render mask), no spatial
coupling — so a sum over image pixels equals a sum over the disjoint
16x16 tiles.  Tiles outside the live prefix render as the blend's
zero-trip output (color 0, no depth hit); their color-term contribution is
parameter-independent, computed once per call (``dead color const``), and
they cannot contribute depth/normal terms (those gate on a depth hit).
Parity with the single-chip executable is pinned by
tests/test_parallel.py::test_sp_optimize_matches_single_chip.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models import optimize as opt_mod
from ..models.gaussian_map import (
    MapState, activated_opacity, activated_scales, derived_normal,
    shs_from_features,
)
from ..ops.rasterize import binning, blend
from ..ops.rasterize.api import RasterSettings
from ..ops.rasterize.project import project_geometry, shade_cols
from ..utils.geometry import normalize

TILE = binning.TILE
NPX = TILE * TILE


def _tile_pixel_coords(origins: jnp.ndarray):
    """Per-tile pixel (u, v) in _tile_pixels order: u fast, v slow."""
    r = jnp.arange(TILE, dtype=jnp.int32)
    du = jnp.tile(r, TILE)                 # [256]
    dv = jnp.repeat(r, TILE)
    u = origins[..., 0].astype(jnp.int32)[..., None] + du
    v = origins[..., 1].astype(jnp.int32)[..., None] + dv
    return u, v


def _gather_tiles(img: jnp.ndarray, origins: jnp.ndarray, H: int, W: int):
    """Gather an image to tile space: [..., T, 256(, C)] plus in-bounds
    mask.  Out-of-bounds pixels (partial edge tiles) read clamped values
    under a zero mask — they do not exist in image space."""
    u, v = _tile_pixel_coords(origins)
    inb = (u < W) & (v < H)
    uc, vc = jnp.minimum(u, W - 1), jnp.minimum(v, H - 1)
    return img[vc, uc], inb


def _render_tiles_compact(params_c, row_valid, tile_lists_c, tile_counts_c,
                          origins, w2c, K, campos, settings: RasterSettings):
    """The compact render pipeline (api.render_compact) up to — and
    including — the blend, WITHOUT the scatter back to image space: the
    tile-sharded loss consumes tile-space outputs directly.  Also returns
    the per-gaussian world normals for the normal term."""
    Ac = params_c["xyz"].shape[0]
    H, W = settings.height, settings.width
    scales = activated_scales(params_c["scaling"])
    rotations = normalize(params_c["rotation"])
    normal_g = derived_normal(params_c["scaling"], params_c["rotation"])
    geo = project_geometry(
        params_c["xyz"], scales, rotations, row_valid, w2c, K, W, H,
        settings.scale_modifier)
    shs_flat = shs_from_features(
        params_c["features_dc"], params_c["features_rest"]).reshape(Ac, -1)
    r, g, b, elig = shade_cols(
        params_c["xyz"], shs_flat, normal_g, campos,
        settings.sh_degree, settings.normal_threshold)
    feat = blend._pack_features((
        geo.mean2d[:, 0], geo.mean2d[:, 1],
        geo.conic[:, 0], geo.conic[:, 1], geo.conic[:, 2],
        geo.depth, r, g, b,
        activated_opacity(params_c["opacity"]).reshape(-1),
        elig.astype(jnp.float32),
    ))
    gidx_pad = jnp.concatenate(
        [jnp.arange(Ac, dtype=jnp.int32), jnp.array([-1], jnp.int32)])
    tiles = blend.blend_tiles_fused(
        feat.gather(tile_lists_c), gidx_pad[tile_lists_c],
        tile_counts_c, origins,
        settings.opaque_threshold, settings.T_threshold,
        settings.use_pallas_vjp, settings.pallas_interpret)
    return tiles, normal_g


def _tile_local_terms(tiles: blend.TileOutputs, normal_g, ftiles, hyper):
    """Per-device loss numerators/denominators over the local tile shard —
    the tile-space transcription of optimize._image_losses (identical
    masks and residuals, summed instead of averaged)."""
    rm = ftiles["rm"]                                   # [Tl, 256] f32
    num_c = jnp.sum(
        jnp.sum(jnp.abs(tiles.color - ftiles["color"]), axis=-1) / 3.0 * rm)

    di = tiles.depth_index                              # [Tl, 256]
    gt_depth = ftiles["depth"]
    derr = tiles.depth - gt_depth
    dmask = ((di >= 0) & (gt_depth > 0)
             & (derr < hyper["add_depth_thres"]) & (rm > 0))
    num_d = jnp.sum(jnp.abs(derr) * dmask)
    den_d = jnp.sum(dmask)

    npad = jnp.concatenate([normal_g, jnp.zeros((1, 3), normal_g.dtype)])
    out_n = jnp.where((di >= 0)[..., None], npad[jnp.clip(di, 0)], 0.0)
    gt_n = ftiles["normal"]
    cos = jnp.sum(out_n * gt_n, axis=-1) / (
        jnp.linalg.norm(out_n, axis=-1)
        * jnp.linalg.norm(gt_n, axis=-1) + 1e-8)
    nmask = (rm > 0) & (di >= 0) & jnp.any(gt_n != 0, axis=-1)
    num_n = jnp.sum((1.0 - cos) * nmask)
    den_n = jnp.sum(nmask)
    return num_c, num_d, den_d, num_n, den_n


def sp_optimize_execute(
    state: MapState,
    colors, depths, normals, w2cs, Ks, camposes,   # stacked [F, ...]
    rmasks,
    lists_orig, counts, pool_rows, n_pool,         # from optimize_prepare
    tile_rows,                                     # [F, Tc]
    frame_seq: jnp.ndarray,
    n_iters,
    lrs: Dict[str, jnp.ndarray],
    weights: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    mode: str,
    max_weight: float,
    Ac: int,
    Ktc: int,
    Tc: int,
    mesh: Mesh,
):
    """`optimize.optimize_execute` with the TILE axis sharded over ``mesh``.

    Same argument contract as the single-chip executable plus the mesh;
    ``Tc`` must be a multiple of the mesh size (both are powers of two in
    the mapper's bucketing, so this holds whenever ``Tc >= n_devices``).
    Every device runs the full fori_loop; per iteration it renders and
    differentiates its [Tc/n] tile slice, the masked-mean numerators /
    denominators and the [Ac]-space gradients are psum'd, and the Adam
    update replicates.  History snapshot/merge and the SoA scatter-back
    bracket the loop exactly as in the single-chip twin.
    """
    from ..models.map_ops import capture_history, history_merge
    from ..models.gaussian_map import stable_mask, unstable_mask

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    assert Tc % n_dev == 0, "tile bucket must divide over the mesh"

    Pc = state.capacity
    local = mode == "local"
    update_full = unstable_mask(state) if local else stable_mask(state)
    hist = capture_history(state)

    # ---- compact basis + tile compaction: optimize_execute verbatim ------
    rows = pool_rows
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

    inv = jnp.full((Pc + 1,), Ac, jnp.int32)
    inv = inv.at[jnp.where(row_valid, rows, Pc)].set(
        jnp.arange(Ac, dtype=jnp.int32))
    inv = inv.at[Pc].set(Ac)
    lists_a = inv[lists_orig[:, :, :Ktc]]
    counts_c = jnp.minimum(counts, Ktc)

    H, W = settings.height, settings.width
    trows = tile_rows[:, :Tc]
    lists_ct = jnp.take_along_axis(lists_a, trows[:, :, None], axis=1)
    counts_ct = jnp.take_along_axis(counts_c, trows, axis=1)
    origins_all = binning.tile_origins(H, W)
    origins_ct = origins_all[trows]

    # ---- tile-space ground truth (once per call, then sharded) -----------
    def per_frame_gt(color, depth, normal, rmask, origins):
        c, inb = _gather_tiles(color, origins, H, W)
        d, _ = _gather_tiles(depth, origins, H, W)
        n, _ = _gather_tiles(normal, origins, H, W)
        rm_t, _ = _gather_tiles(rmask, origins, H, W)
        rm = (rm_t & inb).astype(jnp.float32)
        return {"color": c, "depth": d, "normal": n, "rm": rm}

    gt_tiles = jax.vmap(per_frame_gt)(colors, depths, normals, rmasks,
                                      origins_ct)

    # ---- image-space constants: the dead-tile color term ------------------
    # Tiles outside the live prefix render as zero -> their color residual
    # |0 - gt| * rmask is parameter-independent.  den_c is the full-image
    # mask count (reference masked_mean denominator).
    def per_frame_consts(color, rmask, trow):
        elem = jnp.sum(jnp.abs(color), axis=-1) / 3.0 * rmask
        # tile-sum in the binning's BLOCK-MAJOR flat-tile layout (the same
        # id space as tile_order/origins): gather at the true origins
        et, inb = _gather_tiles(elem, origins_all, H, W)
        tsum = jnp.sum(et * inb, axis=-1)                 # [T_full]
        dead = jnp.sum(tsum) - jnp.sum(tsum[trow])
        return dead, jnp.sum(rmask)

    dead_c, den_c = jax.vmap(per_frame_consts)(colors, rmasks, trows)

    zeros = {k: jnp.zeros_like(v) for k, v in params_c.items()}
    spec_t = P(None, axis)   # shard dim 1 (the tile axis) of [F, Tc, ...]

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), spec_t, spec_t, spec_t,
                  jax.tree.map(lambda _: spec_t, gt_tiles)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(params_c, lists_sh, counts_sh, origins_sh, gt_sh):
        def obj(params_c, f):
            tiles, normal_g = _render_tiles_compact(
                params_c, row_valid, lists_sh[f], counts_sh[f],
                origins_sh[f], w2cs[f], Ks[f], camposes[f], settings)
            ftiles = jax.tree.map(lambda x: x[f], gt_sh)
            num_c, num_d, den_d, num_n, den_n = _tile_local_terms(
                tiles, normal_g, ftiles, hyper)
            gden_d = jax.lax.psum(den_d, axis)
            gden_n = jax.lax.psum(den_n, axis)
            # local objective: local numerators over GLOBAL denominators;
            # the attach anchor is replicated, so its share is 1/n per
            # device — after the gradient psum both recover the single-chip
            # gradient exactly (the dead-tile color term is parameter-free
            # and so absent here).
            attach = opt_mod._attach_loss(params_c, aux, hyper)
            total_loc = (
                hyper["color_weight"] * num_c / jnp.maximum(den_c[f], 1.0)
                + hyper["depth_weight"] * num_d / jnp.maximum(gden_d, 1.0)
                + hyper["normal_weight"] * num_n / jnp.maximum(gden_n, 1.0)
                + attach / n_dev)
            # global (replicated-value) report, reference masked_mean
            # semantics including the empty-mask zero
            gnum_c = jax.lax.psum(num_c, axis) + dead_c[f]
            gnum_d = jax.lax.psum(num_d, axis)
            gnum_n = jax.lax.psum(num_n, axis)
            color_l = jnp.where(den_c[f] > 0,
                                gnum_c / jnp.maximum(den_c[f], 1.0), 0.0)
            depth_l = jnp.where(gden_d > 0,
                                gnum_d / jnp.maximum(gden_d, 1.0), 0.0)
            normal_l = jnp.where(gden_n > 0,
                                 gnum_n / jnp.maximum(gden_n, 1.0), 0.0)
            total = (hyper["color_weight"] * color_l
                     + hyper["depth_weight"] * depth_l
                     + hyper["normal_weight"] * normal_l)
            report = {"total": total, "color": color_l, "depth": depth_l,
                      "normal": normal_l, "attach": attach}
            return total_loc, report

        def body(i, carry):
            params_c, m, v, conf_c, _ = carry
            f = frame_seq[i]
            (_, report), grads = jax.value_and_grad(obj, has_aux=True)(
                params_c, f)
            grads = jax.lax.psum(grads, axis)
            params_c, m, v = opt_mod._adam_step(
                params_c, grads, m, v, i, lrs, update_c)
            touched = jnp.any(grads["features_dc"] != 0, axis=-1) & update_c
            conf_c = conf_c + touched[:, None].astype(jnp.float32)
            return params_c, m, v, conf_c, report

        init_report = jax.lax.pcast(
            {k: jnp.float32(0)
             for k in ("total", "color", "depth", "normal", "attach")},
            (axis,), to="varying")
        conf_v = jax.lax.pcast(conf_c, (axis,), to="varying")
        params_o, _, _, conf_o, report = jax.lax.fori_loop(
            0, n_iters, body,
            (params_c, zeros, dict(zeros), conf_v, init_report))
        return (params_o, jax.lax.pmean(conf_o, axis),
                jax.lax.pmean(report, axis))

    params_c, conf_c, report = run(
        params_c, lists_ct, counts_ct, origins_ct, gt_tiles)

    # ---- scatter back + history merge: optimize_execute verbatim ---------
    scatter_idx = jnp.where(row_valid, rows, Pc)
    params = {k: v.at[scatter_idx].set(params_c[k], mode="drop")
              for k, v in params_full.items()}
    confidence = state.confidence.at[scatter_idx].set(conf_c, mode="drop")
    state = state.with_params(params).replace(confidence=confidence)
    if local:
        state = history_merge(state, hist, max_weight, unstable_mask(state))
    return state, report
