"""Renderer API: the TPU equivalent of the reference rasterizer wrapper.

``render`` mirrors the call contract of ``SLAM/render.py:60-145`` /
``GaussianRasterizer_depth`` and returns the same seven conceptual outputs
(plus the gathered normal map), in [H, W, C] layout:

  render, depth, normal, color_index_map, depth_index_map,
  color_hit_weight, depth_hit_weight, T_map

Index maps hold slot indices into the fixed-capacity gaussian arrays
(-1 = no hit) — the role the reference's concat-ordering indices play for
error scattering (mapper.py:541-591) and normal gathering (render.py:130-133).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import binning, blend
from .project import project_geometry, shade_cols


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static render configuration (hashable: used as a jit static arg).

    Mirrors ``GaussianRasterizationSettings_depth`` (render.py:68-88) minus
    per-frame tensors, which travel as traced arrays.
    """

    height: int
    width: int
    sh_degree: int = 3
    opaque_threshold: float = 0.6
    depth_threshold: float = 1.0
    normal_threshold: float = 0.5     # cos(renderer_normal_threshold deg)
    color_sigma: float = 3.0
    T_threshold: float = 1e-4
    scale_modifier: float = 1.0
    block_capacity: int = 4096
    tile_capacity: int = 1024
    max_visible: int = 131072
    # Pallas TPU blend kernels (grid = tiles, per-tile early exit):
    # `use_pallas` drives INFERENCE renders (compiled-proven on v5e:
    # bitwise color parity, PERF.md); `use_pallas_vjp` additionally runs
    # BOTH directions of the differentiable blend as Pallas kernels
    # (pallas_blend.blend_bwd_pallas via blend._fused_bwd) — kept separate
    # because the backward's Mosaic compile is proven only in interpreter
    # mode so far (PERF.md trail).  `pallas_interpret` runs kernels in
    # interpreter mode (CPU tests).
    use_pallas: bool = False
    use_pallas_vjp: bool = False
    pallas_interpret: bool = False
    # custom-VJP blend for the optimize loop: early-exit forward + hand-
    # written back-to-front backward (blend.blend_tiles_fused) instead of
    # the scan+checkpoint autodiff path.  XLA by default, Pallas kernels in
    # both directions when use_pallas is set; default on.
    use_fused_vjp: bool = True

    @classmethod
    def from_args(cls, args, height: int, width: int,
                  opaque_threshold: Optional[float] = None) -> "RasterSettings":
        sh_degree = args.active_sh_degree
        if sh_degree < 0:
            sh_degree = args.max_sh_degree
        # use_pallas_blend: "auto" enables the Pallas TPU kernels on a TPU
        # backend and falls back to the XLA blend elsewhere.  Default is
        # False: the kernel is compiled-PROVEN on v5e but measured 3.5x
        # slower than the XLA blend at the bench operating point (PERF.md
        # "Pallas on the TPU target") — the serial per-tile grid loses to
        # XLA's batched-tiles formulation on this workload.
        def _resolve_auto(v):
            return jax.default_backend() == "tpu" if isinstance(v, str) else v

        use_pallas = _resolve_auto(getattr(args, "use_pallas_blend", False))
        return cls(
            height=height,
            width=width,
            sh_degree=sh_degree,
            opaque_threshold=(args.renderer_opaque_threshold
                              if opaque_threshold is None else opaque_threshold),
            depth_threshold=args.renderer_depth_threshold,
            normal_threshold=float(np.cos(np.deg2rad(args.renderer_normal_threshold))),
            color_sigma=args.color_sigma,
            block_capacity=getattr(args, "block_capacity", 4096),
            tile_capacity=getattr(args, "tile_capacity", 1024),
            max_visible=getattr(args, "max_visible", 131072),
            use_pallas=bool(use_pallas),
            use_pallas_vjp=bool(_resolve_auto(
                getattr(args, "use_pallas_vjp", False))),
            pallas_interpret=bool(getattr(args, "pallas_interpret", False)),
            use_fused_vjp=bool(getattr(args, "use_fused_vjp", True)),
        )


@partial(jax.jit, static_argnames=("settings", "differentiable", "with_tile_mask"))
def _render_impl(
    gaussians: Dict[str, jnp.ndarray],
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    tile_mask: Optional[jnp.ndarray],
    settings: RasterSettings,
    differentiable: bool,
    with_tile_mask: bool,
):
    H, W = settings.height, settings.width
    geo = project_geometry(
        gaussians["xyz"], gaussians["scales"], gaussians["rotations"],
        gaussians["alive"], w2c, K, W, H, settings.scale_modifier,
    )

    bins = binning.bin_gaussians(
        geo, H, W,
        block_capacity=settings.block_capacity,
        tile_capacity=settings.tile_capacity,
        max_visible=settings.max_visible,
        tile_mask=tile_mask if with_tile_mask else None,
    )

    # shade only the depth-sorted visible working set; everything below is
    # scalar-column SoA (see blend.FeatCols on the TPU layout-padding tax
    # the stacked [V, 11] form paid)
    order = bins.order
    P = gaussians["xyz"].shape[0]
    r, g, b, elig = shade_cols(
        gaussians["xyz"][order],
        gaussians["shs"].reshape(P, -1)[order],
        gaussians["normal"][order], campos,
        settings.sh_degree, settings.normal_threshold,
    )
    feat = blend._pack_features((
        geo.mean2d[order, 0], geo.mean2d[order, 1],
        geo.conic[order, 0], geo.conic[order, 1], geo.conic[order, 2],
        geo.depth[order], r, g, b,
        gaussians["opacity"].reshape(-1)[order], elig.astype(jnp.float32),
    ))
    origins = binning.tile_origins(H, W)
    if settings.use_pallas and not differentiable:
        from . import pallas_blend

        order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])
        tiles = pallas_blend.blend_tiles_pallas(
            feat.gather(bins.tile_lists).pack(), order_pad[bins.tile_lists],
            bins.tile_counts, origins,
            opaque_threshold=settings.opaque_threshold,
            t_threshold=settings.T_threshold,
            interpret=settings.pallas_interpret,
        )
    elif differentiable and settings.use_fused_vjp:
        order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])
        tiles = blend.blend_tiles_fused(
            feat.gather(bins.tile_lists), order_pad[bins.tile_lists],
            bins.tile_counts, origins,
            settings.opaque_threshold, settings.T_threshold,
            settings.use_pallas_vjp, settings.pallas_interpret,
        )
    else:
        tiles = blend.blend_tiles(
            feat, order, bins.tile_lists, bins.tile_counts, origins,
            opaque_threshold=settings.opaque_threshold,
            T_threshold=settings.T_threshold,
            differentiable=differentiable,
        )

    return _assemble_outputs(tiles, gaussians["normal"], bins.overflow, H, W)


def _assemble_outputs(tiles, normals, overflow, H: int, W: int):
    """Tile-major blend outputs -> the render's [H, W, C] output dict."""

    def to_image(x, channels):
        img = binning.scatter_tiles(x.reshape(x.shape[0], blend.TILE * blend.TILE, channels), H, W)
        return img

    color = to_image(tiles.color, 3)
    depth = to_image(tiles.depth[..., None], 1)
    depth_index = to_image(tiles.depth_index[..., None].astype(jnp.int32), 1)[..., 0]
    color_index = to_image(tiles.color_index[..., None].astype(jnp.int32), 1)[..., 0]
    depth_w = to_image(tiles.depth_weight[..., None], 1)
    color_w = to_image(tiles.color_weight[..., None], 1)
    T_map = to_image(tiles.T_final[..., None], 1)

    # normal map: gather the opaque gaussian's world normal (render.py:130-133)
    normal_pad = jnp.concatenate(
        [normals, jnp.zeros((1, 3), normals.dtype)], axis=0)
    normal = jnp.where(
        (depth_index >= 0)[..., None],
        normal_pad[jnp.clip(depth_index, 0)],
        0.0,
    )

    return {
        "render": color,
        "depth": depth,
        "normal": normal,
        "color_index_map": color_index,
        "depth_index_map": depth_index,
        "color_hit_weight": color_w,
        "depth_hit_weight": depth_w,
        "T_map": T_map,
        "overflow": overflow,
    }


class BasePass(NamedTuple):
    """The reusable state of one projection/sort/shade pass: the depth-
    sorted working set, pre-tile-gather.  Carried from the spawn render to
    the same frame's post-insert lifecycle render (render_with_inserted)
    so the second render skips the [P]-row projection, the [P]-key sort
    and the SH shade."""

    feat: "blend.FeatCols"        # [V] sorted columns (no sentinel)
    keys: jnp.ndarray             # [V] sort keys: depth, +inf for invalid
    r2: jnp.ndarray               # [V] squared pixel radius
    order: jnp.ndarray            # [V] original slot indices
    valid: jnp.ndarray            # [V] bool
    visible_overflow: jnp.ndarray  # [] int32: visibles dropped by max_visible


def _sorted_working_set(gaussians, w2c, K, campos, settings) -> BasePass:
    """Project + depth-sort + shade: everything before tile binning."""
    H, W = settings.height, settings.width
    geo = project_geometry(
        gaussians["xyz"], gaussians["scales"], gaussians["rotations"],
        gaussians["alive"], w2c, K, W, H, settings.scale_modifier,
    )
    P = gaussians["xyz"].shape[0]
    V = min(settings.max_visible, P)
    keys_all = jnp.where(geo.visible, geo.depth, jnp.inf)
    order = jax.lax.top_k(-keys_all, V)[1].astype(jnp.int32)
    n_visible = jnp.sum(geo.visible).astype(jnp.int32)
    n_valid = jnp.minimum(n_visible, V)
    valid = jnp.arange(V, dtype=jnp.int32) < n_valid

    r, g, b, elig = shade_cols(
        gaussians["xyz"][order],
        gaussians["shs"].reshape(P, -1)[order],
        gaussians["normal"][order], campos,
        settings.sh_degree, settings.normal_threshold,
    )
    feat = blend.FeatCols(
        mean_x=geo.mean2d[order, 0], mean_y=geo.mean2d[order, 1],
        conic_a=geo.conic[order, 0], conic_b=geo.conic[order, 1],
        conic_c=geo.conic[order, 2], depth=geo.depth[order],
        r=r, g=g, b=b,
        opacity=gaussians["opacity"].reshape(-1)[order],
        elig=elig.astype(jnp.float32))
    radius = geo.radius[order]
    return BasePass(feat=feat, keys=keys_all[order], r2=radius * radius,
                    order=order, valid=valid,
                    visible_overflow=n_visible - n_valid)


def _with_sentinel(cols: "blend.FeatCols") -> "blend.FeatCols":
    zero = jnp.zeros((1,), jnp.float32)
    return blend.FeatCols(*(jnp.concatenate([c, zero]) for c in cols))


@partial(jax.jit, static_argnames=("settings",))
def render_model_and_stable(
    gaussians: Dict[str, jnp.ndarray],
    stable: jnp.ndarray,          # [P] bool: the stable subset of alive
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    settings: RasterSettings,
):
    """Model (alive-pool) render + stable-pool color index map from ONE
    projection / depth-sort / binning / shade pass.

    The reference renders the global map (mapper.py:728) and the stable map
    (mapper.py:849) as two full rasterizer launches at the SAME camera;
    since stable ⊂ alive, the stable render here reuses the alive pass's
    sorted working set and tile lists and re-runs only the (cheap) blend
    with non-stable contributions zeroed (`FeatCols.mask_contribution` —
    exact: a zero-alpha entry is blend-invisible on every output).  That
    skips the second projection, the second [P]-key depth sort, the second
    binning and the second SH shade — the fixed per-render costs that
    dominate now that the blend itself is ~0.1 ms (PERF.md round-3).

    DIVERGENCE from two standalone renders: tile/visible capacities bound
    the combined alive population, not the stable subset, so under
    overflow the shared lists may drop a stable gaussian a standalone
    stable render would keep (overflow counter reports it; exact when 0 —
    pinned by tests/test_rasterizer.py::test_model_and_stable_pair).

    Returns (model_out_dict, stable_color_index_map [H, W] int32, BasePass
    — the carried working set render_with_inserted resumes from).
    """
    H, W = settings.height, settings.width
    base = _sorted_working_set(gaussians, w2c, K, campos, settings)
    tile_lists, tile_counts, bin_ovf = binning.bin_sorted(
        base.feat.mean_x, base.feat.mean_y, base.r2, base.valid,
        H, W, settings.block_capacity, settings.tile_capacity, None)
    overflow = (base.visible_overflow + bin_ovf).astype(jnp.int32)

    stable_col = jnp.concatenate([
        stable[base.order].astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
    origins = binning.tile_origins(H, W)
    order_pad = jnp.concatenate([base.order, jnp.array([-1], jnp.int32)])
    tile_feat, (tile_stable,) = _with_sentinel(base.feat).gather_with_extra(
        (stable_col,), tile_lists)
    tile_gidx = order_pad[tile_lists]

    model_tiles = blend.blend_tiles_blocked(
        tile_feat, tile_gidx, tile_counts, origins,
        opaque_threshold=settings.opaque_threshold,
        T_threshold=settings.T_threshold)
    stable_tiles = blend.blend_tiles_blocked(
        tile_feat.mask_contribution(tile_stable), tile_gidx,
        tile_counts, origins,
        opaque_threshold=settings.opaque_threshold,
        T_threshold=settings.T_threshold)

    model_out = _assemble_outputs(
        model_tiles, gaussians["normal"], overflow, H, W)
    stable_cidx = binning.scatter_tiles(
        stable_tiles.color_index[..., None].astype(jnp.int32).reshape(
            stable_tiles.color_index.shape[0], blend.TILE * blend.TILE, 1),
        H, W)[..., 0]
    return model_out, stable_cidx, base


@partial(jax.jit, static_argnames=("settings",))
def render_with_inserted(
    new_rows: Dict[str, jnp.ndarray],  # [M] activated rows (xyz, scales,
                                       # rotations, opacity, shs_flat,
                                       # normal, alive)
    new_index: jnp.ndarray,            # [M] original slot of each row
    normals_full: jnp.ndarray,         # [P, 3] world normals (post-insert)
    base: BasePass,
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    settings: RasterSettings,
):
    """Render base working set ∪ newly inserted gaussians, reusing the
    carried pass.

    The post-spawn lifecycle render (reference mapper.py:119-126 renders
    the global model right after ``gaussians_add``) differs from the spawn
    model render ONLY by the just-inserted rows: instead of re-projecting
    and re-sorting all [P] slots, project/shade the M new rows, merge them
    into the carried depth order by rank (two ``searchsorted`` calls give
    collision-free merged positions, base-before-new on equal depths), and
    re-run binning + blend on the merged [V+M] set.

    DIVERGENCES from a fresh full render (both observable, both nil in
    the no-overflow regime the capacities are sized for): (1) if the base
    pass dropped visibles to ``max_visible``, the merged set inherits that
    truncation (and conversely never re-truncates to max_visible, so it
    keeps MORE entries than a fresh render would); (2) a depth TIE between
    an old and a new gaussian orders old-first here vs slot-order in the
    fresh sort — f32-exact ties between independent continuous depths only.
    Exactness pinned by test_render_with_inserted_matches_fresh.
    """
    H, W = settings.height, settings.width
    V = base.keys.shape[0]
    M = new_index.shape[0]

    geo_n = project_geometry(
        new_rows["xyz"], new_rows["scales"], new_rows["rotations"],
        new_rows["alive"], w2c, K, W, H, settings.scale_modifier,
    )
    r, g, b, elig = shade_cols(
        new_rows["xyz"], new_rows["shs_flat"], new_rows["normal"], campos,
        settings.sh_degree, settings.normal_threshold,
    )
    keys_n = jnp.where(geo_n.visible, geo_n.depth, jnp.inf)
    o = jnp.argsort(keys_n)
    keys_ns = keys_n[o]
    feat_n = blend.FeatCols(
        mean_x=geo_n.mean2d[o, 0], mean_y=geo_n.mean2d[o, 1],
        conic_a=geo_n.conic[o, 0], conic_b=geo_n.conic[o, 1],
        conic_c=geo_n.conic[o, 2], depth=geo_n.depth[o],
        r=r[o], g=g[o], b=b[o],
        opacity=new_rows["opacity"].reshape(-1)[o],
        elig=elig[o].astype(jnp.float32))
    radius_n = geo_n.radius[o]

    # rank-merge: position of every entry in the combined depth order
    pos_old = jnp.arange(V, dtype=jnp.int32) + jnp.searchsorted(
        keys_ns, base.keys, side="left").astype(jnp.int32)
    pos_new = jnp.arange(M, dtype=jnp.int32) + jnp.searchsorted(
        base.keys, keys_ns, side="right").astype(jnp.int32)

    # one packed scatter per side (12 columns: 11 features + r2), then one
    # transpose back to columns — same layout reasoning as FeatCols.gather
    rows_old = jnp.stack(tuple(base.feat) + (base.r2,), axis=-1)
    rows_new = jnp.stack(tuple(feat_n) + (radius_n * radius_n,), axis=-1)
    merged = jnp.zeros((V + M, 12), jnp.float32)
    merged = merged.at[pos_old].set(rows_old).at[pos_new].set(rows_new)
    colsT = jnp.transpose(merged, (1, 0))
    feat_m = blend.FeatCols(*(colsT[i] for i in range(11)))
    r2_m = colsT[11]
    idx_m = jnp.zeros((V + M,), jnp.int32)
    idx_m = idx_m.at[pos_old].set(base.order).at[pos_new].set(
        new_index[o].astype(jnp.int32))
    valid_m = jnp.zeros((V + M,), bool)
    valid_m = valid_m.at[pos_old].set(base.valid).at[pos_new].set(
        geo_n.visible[o])

    tile_lists, tile_counts, bin_ovf = binning.bin_sorted(
        feat_m.mean_x, feat_m.mean_y, r2_m, valid_m,
        H, W, settings.block_capacity, settings.tile_capacity, None)
    origins = binning.tile_origins(H, W)
    idx_pad = jnp.concatenate([idx_m, jnp.array([-1], jnp.int32)])
    tile_feat = _with_sentinel(feat_m).gather(tile_lists)
    tile_gidx = idx_pad[tile_lists]
    tiles = blend.blend_tiles_blocked(
        tile_feat, tile_gidx, tile_counts, origins,
        opaque_threshold=settings.opaque_threshold,
        T_threshold=settings.T_threshold)
    overflow = (base.visible_overflow + bin_ovf).astype(jnp.int32)
    return _assemble_outputs(tiles, normals_full, overflow, H, W)


@partial(jax.jit, static_argnames=("settings",))
def render_fixed_binning(
    gaussians: Dict[str, jnp.ndarray],
    order: jnp.ndarray,        # [V] frozen depth order (sorted -> original)
    tile_lists: jnp.ndarray,   # [T, Kt] frozen per-tile lists (sentinel V)
    tile_counts: jnp.ndarray,  # [T]
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    settings: RasterSettings,
):
    """Differentiable render over a FROZEN depth order and tile lists.

    The optimize loop's approximation lever (`optimize_freeze_binning`):
    within one 50-iteration optimization call the attach anchor holds
    gaussians near their snapshot (optimize.py _loss_fn), so the depth
    order and tile membership computed from the INITIAL parameters stay
    ~valid for the whole call.  Sorting and binning once per call instead
    of per iteration removes the [P]-key top_k sort and the binning
    cumsum/scatter from every iteration; projection, shading, gathers and
    the blend still run fresh each iteration (they carry the gradients).

    DIVERGENCE from the reference (which re-sorts per iteration like
    every 3DGS trainer): blend order and tile membership lag parameter
    updates within a call.  Gated off by default; quality impact bounded
    by tests/test_optimize.py::test_freeze_binning_quality.
    """
    H, W = settings.height, settings.width
    geo = project_geometry(
        gaussians["xyz"], gaussians["scales"], gaussians["rotations"],
        gaussians["alive"], w2c, K, W, H, settings.scale_modifier,
    )
    P = gaussians["xyz"].shape[0]
    r, g, b, elig = shade_cols(
        gaussians["xyz"][order],
        gaussians["shs"].reshape(P, -1)[order],
        gaussians["normal"][order], campos,
        settings.sh_degree, settings.normal_threshold,
    )
    feat = blend._pack_features((
        geo.mean2d[order, 0], geo.mean2d[order, 1],
        geo.conic[order, 0], geo.conic[order, 1], geo.conic[order, 2],
        geo.depth[order], r, g, b,
        gaussians["opacity"].reshape(-1)[order], elig.astype(jnp.float32),
    ))
    origins = binning.tile_origins(H, W)
    order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])
    tiles = blend.blend_tiles_fused(
        feat.gather(tile_lists), order_pad[tile_lists],
        tile_counts, origins,
        settings.opaque_threshold, settings.T_threshold,
        settings.use_pallas_vjp, settings.pallas_interpret,
    )
    return _assemble_outputs(
        tiles, gaussians["normal"], jnp.int32(0), H, W)


@partial(jax.jit, static_argnames=("settings",))
def render_compact(
    gaussians_c: Dict[str, jnp.ndarray],
    tile_lists_c: jnp.ndarray,   # [T, Ktc] compact-space indices (sentinel Vc)
    tile_counts_c: jnp.ndarray,  # [T]
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    settings: RasterSettings,
    tile_rows: Optional[jnp.ndarray] = None,    # [Tc] grid-tile id per row
    tile_origins: Optional[jnp.ndarray] = None,  # [Tc, 2]
    n_tiles_full: Optional[int] = None,
):
    """Differentiable render over a COMPACT pre-gathered working set.

    The round-4 optimize-loop formulation (`optimize.optimize_execute`):
    instead of projecting/shading all [P] capacity rows (or the [V] sorted
    order) every iteration, the caller gathers the ~n_visible live rows
    once per iteration into ``gaussians_c`` (activated arrays of length
    ``Vc``, a static power-of-two bucket >= the frame's visible count) and
    supplies tile lists re-indexed into that compact space, cropped to a
    ``Ktc`` bucket >= the max per-tile count.  Projection, SH shade, the
    per-tile gather and the blend then all scale with the LIVE population:
    measured 13.7 -> 5.2 ms per optimize iteration at the 170x300 bench
    point (OPT_COMPACT_PROBE.json).

    Same blend math as :func:`render_fixed_binning`; bitwise-identical
    outputs when ``Vc >= n_visible`` and ``Ktc >= max tile count`` (chunk
    boundaries coincide — pinned by tests/test_optimize.py).

    DIVERGENCE from the full render: the index maps are in COMPACT space
    (the position of the gaussian in ``gaussians_c``), not original map
    slots — the optimize loss only tests ``>= 0`` and gathers normals,
    both space-agnostic.  Reference context: the per-iteration re-sorting
    trainer loop this replaces is ``local_optimize`` mapper.py:143-210.

    ``gaussians_c`` keys: xyz [Vc,3], scales [Vc,3], rotations [Vc,4],
    opacity [Vc,1] (activated), shs_flat [Vc,3K], normal [Vc,3],
    valid [Vc] bool.
    """
    H, W = settings.height, settings.width
    Vc = gaussians_c["xyz"].shape[0]
    geo = project_geometry(
        gaussians_c["xyz"], gaussians_c["scales"], gaussians_c["rotations"],
        gaussians_c["valid"], w2c, K, W, H, settings.scale_modifier,
    )
    r, g, b, elig = shade_cols(
        gaussians_c["xyz"], gaussians_c["shs_flat"], gaussians_c["normal"],
        campos, settings.sh_degree, settings.normal_threshold,
    )
    feat = blend._pack_features((
        geo.mean2d[:, 0], geo.mean2d[:, 1],
        geo.conic[:, 0], geo.conic[:, 1], geo.conic[:, 2],
        geo.depth, r, g, b,
        gaussians_c["opacity"].reshape(-1), elig.astype(jnp.float32),
    ))
    origins = (binning.tile_origins(H, W)
               if tile_origins is None else tile_origins)
    # compact-space identity index map: entry e -> e, sentinel Vc -> -1
    gidx_pad = jnp.concatenate(
        [jnp.arange(Vc, dtype=jnp.int32), jnp.array([-1], jnp.int32)])
    tiles = blend.blend_tiles_fused(
        feat.gather(tile_lists_c), gidx_pad[tile_lists_c],
        tile_counts_c, origins,
        settings.opaque_threshold, settings.T_threshold,
        settings.use_pallas_vjp, settings.pallas_interpret,
    )
    if tile_rows is not None:
        # TILE-COMPACT mode (optimize_execute): the rows are a live-first
        # prefix of the full tile grid; scatter each output back into a
        # full-grid buffer initialized to the blend's zero-trip carry —
        # exactly what the full-grid blend produces for count == 0 tiles,
        # so assembled images are bitwise identical (pinned end-to-end by
        # test_compact_matches_freeze, which exercises a 16x tile crop).
        Tf = n_tiles_full
        npx = blend.TILE * blend.TILE

        def put(init, x):
            return init.at[tile_rows].set(x, mode="drop")

        tiles = blend.TileOutputs(
            color=put(jnp.zeros((Tf, npx, 3)), tiles.color),
            depth=put(jnp.zeros((Tf, npx)), tiles.depth),
            depth_index=put(jnp.full((Tf, npx), -1, jnp.int32),
                            tiles.depth_index),
            color_index=put(jnp.full((Tf, npx), -1, jnp.int32),
                            tiles.color_index),
            depth_weight=put(jnp.zeros((Tf, npx)), tiles.depth_weight),
            color_weight=put(jnp.zeros((Tf, npx)), tiles.color_weight),
            T_final=put(jnp.ones((Tf, npx)), tiles.T_final),
        )
    return _assemble_outputs(
        tiles, gaussians_c["normal"], jnp.int32(0), H, W)


@partial(jax.jit, static_argnames=("settings",))
def render_transmission(
    gaussians: Dict[str, jnp.ndarray],
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    settings: RasterSettings,
):
    """Final-transmittance map only: the cheap render variant behind the
    optimize loop's partial-render masks (reference evaluate_render_range,
    mapper.py:471-508, consumes only the transmission in local mode).

    Same projection/binning as the full render; the blend skips color,
    depth, index and hit-weight bookkeeping and the SH shade, and its
    per-tile gather carries 6 floats per gaussian instead of 11.
    Returns {"T_map": [H, W, 1], "overflow": scalar}.
    """
    H, W = settings.height, settings.width
    geo = project_geometry(
        gaussians["xyz"], gaussians["scales"], gaussians["rotations"],
        gaussians["alive"], w2c, K, W, H, settings.scale_modifier,
    )
    bins = binning.bin_gaussians(
        geo, H, W,
        block_capacity=settings.block_capacity,
        tile_capacity=settings.tile_capacity,
        max_visible=settings.max_visible,
        tile_mask=None,
    )
    order = bins.order
    zero = jnp.zeros((1,), jnp.float32)
    # opacity 0 for the sentinel entry: alpha contribution exactly none
    cols = tuple(
        jnp.concatenate([col, zero])[bins.tile_lists]
        for col in (geo.mean2d[order, 0], geo.mean2d[order, 1],
                    geo.conic[order, 0], geo.conic[order, 1],
                    geo.conic[order, 2],
                    gaussians["opacity"].reshape(-1)[order]))
    T = blend.blend_transmission_blocked(
        cols, bins.tile_counts, binning.tile_origins(H, W),
        T_threshold=settings.T_threshold)
    T_map = binning.scatter_tiles(
        T.reshape(T.shape[0], blend.TILE * blend.TILE, 1), H, W)
    return {"T_map": T_map, "overflow": bins.overflow}


def render(
    gaussians: Dict[str, jnp.ndarray],
    camera: Dict[str, jnp.ndarray],
    settings: RasterSettings,
    tile_mask: Optional[jnp.ndarray] = None,
    differentiable: bool = False,
):
    """Render the gaussian map from a camera.

    Args:
      gaussians: dict with activated arrays xyz [P,3], scales [P,3],
        rotations [P,4], opacity [P,1], shs [P,K,3], normal [P,3],
        alive [P] bool.
      camera: dict with w2c [4,4], K [3,3], campos [3].
      tile_mask: optional [tiles_y, tiles_x] int mask; 0-tiles are skipped.
      differentiable: pick the scan (grad-capable) or while_loop (early-exit)
        blend path.
    """
    return _render_impl(
        gaussians, camera["w2c"], camera["K"], camera["campos"],
        tile_mask, settings, differentiable, tile_mask is not None,
    )


def render_from_camera(gaussians, cam, settings=None, args=None,
                       tile_mask=None, differentiable=False):
    """Convenience wrapper taking a host-side Camera object."""
    if settings is None:
        settings = RasterSettings.from_args(args, cam.image_height, cam.image_width)
    return render(gaussians, cam.device_dict(), settings, tile_mask, differentiable)
