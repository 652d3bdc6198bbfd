"""Front-to-back alpha blending over per-tile depth-ordered lists.

TPU-native reformulation of the reference CUDA blend loop: instead of a
sequential per-gaussian walk per pixel, each 16x16 tile processes its list in
chunks of ``CHUNK`` gaussians at once —

* per-chunk alphas form a [256, CHUNK] matrix (VPU elementwise work);
* the front-to-back transmittance is an *exclusive cumulative product* along
  the chunk axis (a log-depth scan XLA vectorizes well);
* color accumulation is a [256, CHUNK] @ [CHUNK, 3] matmul (MXU).

Three execution modes share the math:
  ``blend_scan``  — fixed chunk count, reverse-differentiable (jax.checkpoint
                    on the body keeps activation memory at one chunk);
  ``blend_while`` — ``lax.while_loop`` with early exit once every pixel of
                    the tile is saturated (T < T_threshold) or the list is
                    exhausted; inference-only.
  ``blend_tiles_fused`` — custom-VJP variant: the forward is the early-exit
                    while_loop (recording each chunk's entry transmittance),
                    the backward is a hand-written back-to-front traversal
                    (the reference CUDA backward's structure,
                    ``SLAM/render.py:110-133`` bwd) that also early-exits.

Outputs per pixel (contract from ``SLAM/render.py:110-133``):
  color          standard alpha-blended RGB;
  depth/index    the paper's single-opaque-gaussian depth: view-z and global
                 index of the *first* gaussian along the ray with individual
                 alpha >= opaque_threshold that passes the normal gate;
  color_index    global index of the max-blend-weight contributor;
  hit weights    blend weight (alpha * T) of those two gaussians;
  T              final transmittance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE

CHUNK = 128
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


class TileOutputs(NamedTuple):
    color: jnp.ndarray         # [T, 256, 3]
    depth: jnp.ndarray         # [T, 256]
    depth_index: jnp.ndarray   # [T, 256] int32, -1 = none
    color_index: jnp.ndarray   # [T, 256] int32, -1 = none
    depth_weight: jnp.ndarray  # [T, 256]
    color_weight: jnp.ndarray  # [T, 256]
    T_final: jnp.ndarray       # [T, 256]


def _pack_features(proj_sorted):
    """Stack sorted per-gaussian blend features into one [P+1, 11] array
    (one gather per chunk instead of seven); the final row is the sentinel."""
    mean2d, conic, depth, rgb, opacity, elig = proj_sorted
    feat = jnp.concatenate([
        mean2d,                      # 0:2
        conic,                       # 2:5
        depth[:, None],              # 5
        rgb,                         # 6:9
        opacity[:, None],            # 9
        elig.astype(jnp.float32)[:, None],  # 10
    ], axis=-1)
    sentinel = jnp.zeros((1, feat.shape[-1]), feat.dtype)
    return jnp.concatenate([feat, sentinel], axis=0)


def _chunk_alphas(feat_chunk, pix, opaque_threshold):
    """alpha/weight math for one chunk against one tile's pixels.

    feat_chunk [C, 11], pix [256, 2] -> alpha [256, C], rgb [C, 3],
    z [C], opaque-eligibility [256, C].
    """
    mean2d = feat_chunk[:, 0:2]
    conic = feat_chunk[:, 2:5]
    z = feat_chunk[:, 5]
    rgb = feat_chunk[:, 6:9]
    opa = feat_chunk[:, 9]
    elig = feat_chunk[:, 10] > 0.5

    # dx/dy as two [256, C] tensors: stacking them as [256, C, 2] puts a
    # size-2 axis minor-most, and the materialized (vmapped-over-tiles)
    # intermediate measured ~100 MB per chunk step in the optimized HLO
    # (scripts/hlo_traffic.py) — the single largest traffic source
    dx = pix[:, None, 0] - mean2d[None, :, 0]
    dy = pix[:, None, 1] - mean2d[None, :, 1]
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) \
        - conic[None, :, 1] * dx * dy
    alpha = opa[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    opaque = elig[None, :] & (alpha >= opaque_threshold)
    return alpha, rgb, z, opaque


class _Carry(NamedTuple):
    T: jnp.ndarray            # [256]
    color: jnp.ndarray        # [256, 3]
    depth: jnp.ndarray        # [256]
    depth_index: jnp.ndarray  # [256] int32 (sorted-space position, -1 none)
    depth_weight: jnp.ndarray
    color_index: jnp.ndarray  # [256] int32
    color_weight: jnp.ndarray


def _init_carry():
    n = TILE * TILE
    return _Carry(
        T=jnp.ones(n),
        color=jnp.zeros((n, 3)),
        depth=jnp.zeros(n),
        depth_index=jnp.full(n, -1, jnp.int32),
        depth_weight=jnp.zeros(n),
        color_index=jnp.full(n, -1, jnp.int32),
        color_weight=jnp.zeros(n),
    )


def _blend_chunk(carry: _Carry, feat_chunk, idx_chunk, pix, opaque_threshold) -> _Carry:
    alpha, rgb, z, opaque = _chunk_alphas(feat_chunk, pix, opaque_threshold)

    one_minus = 1.0 - alpha
    cum = jnp.cumprod(one_minus, axis=1)                  # [256, C]
    T_in = carry.T[:, None] * jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)  # exclusive
    w = alpha * T_in                                      # [256, C]

    color = carry.color + jnp.dot(w, rgb, preferred_element_type=jnp.float32)

    # first opaque hit (front-to-back == ascending chunk position)
    has_hit = jnp.any(opaque, axis=1)
    first = jnp.argmax(opaque, axis=1)                    # first True
    new_hit = has_hit & (carry.depth_index < 0)
    depth = jnp.where(new_hit, z[first], carry.depth)
    depth_index = jnp.where(new_hit, idx_chunk[first], carry.depth_index)
    depth_weight = jnp.where(new_hit, w[jnp.arange(w.shape[0]), first], carry.depth_weight)

    # max blend-weight contributor
    best = jnp.argmax(w, axis=1)
    best_w = w[jnp.arange(w.shape[0]), best]
    better = best_w > carry.color_weight
    color_weight = jnp.where(better, best_w, carry.color_weight)
    color_index = jnp.where(better, idx_chunk[best], carry.color_index)

    return _Carry(
        T=carry.T * cum[:, -1],
        color=color,
        depth=depth,
        depth_index=depth_index,
        depth_weight=depth_weight,
        color_index=color_index,
        color_weight=color_weight,
    )


def _tile_pixels(origin: jnp.ndarray) -> jnp.ndarray:
    """[256, 2] pixel-center coordinates of a tile given its (x, y) origin."""
    r = jnp.arange(TILE, dtype=jnp.float32)
    px = jnp.tile(r, TILE) + origin[0]
    py = jnp.repeat(r, TILE) + origin[1]
    return jnp.stack([px, py], axis=-1)


@partial(jax.jit, static_argnames=("differentiable",))
def blend_tiles(
    proj_sorted_feat: jnp.ndarray,   # [P+1, 11] packed, depth-sorted
    order: jnp.ndarray,              # [P] sorted -> original
    tile_lists: jnp.ndarray,         # [T, Kt]
    tile_counts: jnp.ndarray,        # [T]
    origins: jnp.ndarray,            # [T, 2]
    opaque_threshold: float,
    T_threshold: float = 1e-4,
    differentiable: bool = False,
) -> TileOutputs:
    """Blend every tile.  vmapped over tiles; chunked over each tile's list."""
    # map sorted-space sentinel V -> original-index sentinel -1
    order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])

    # Pre-gather every tile's features into contiguous [T, Kt, 11] layout
    # with ONE batched gather: the chunk loop then reads sequential memory.
    # (Per-chunk random-row gathers inside the loop measured ~5x slower.)
    tile_feat = proj_sorted_feat[tile_lists]          # [T, Kt, 11]
    tile_gidx = order_pad[tile_lists]                 # [T, Kt]
    return blend_tiles_pregathered(
        tile_feat, tile_gidx, tile_counts, origins,
        opaque_threshold, T_threshold, differentiable)


@partial(jax.jit, static_argnames=("differentiable",))
def blend_tiles_pregathered(
    tile_feat: jnp.ndarray,    # [T, Kt, 11] contiguous, depth-ordered
    tile_gidx: jnp.ndarray,    # [T, Kt] int32 original indices (-1 sentinel)
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    opaque_threshold: float,
    T_threshold: float = 1e-4,
    differentiable: bool = False,
) -> TileOutputs:
    """Blend from pre-gathered per-tile blocks (shardable over tiles)."""
    Kt = tile_feat.shape[1]
    chunk = min(CHUNK, Kt)
    assert Kt % chunk == 0, "tile_capacity must be a power of two >= 64"
    n_chunks = Kt // chunk

    def run_tile(tfeat, tgidx, count, origin):
        pix = _tile_pixels(origin)

        def chunk_step(carry, c):
            feat = jax.lax.dynamic_slice_in_dim(tfeat, c * chunk, chunk, axis=0)
            gidx = jax.lax.dynamic_slice_in_dim(tgidx, c * chunk, chunk, axis=0)
            return _blend_chunk(carry, feat, gidx, pix, opaque_threshold)

        if differentiable:
            def body(carry, c):
                return jax.checkpoint(
                    lambda cr, cc: (chunk_step(cr, cc), None),
                    prevent_cse=False,
                )(carry, c)
            carry, _ = jax.lax.scan(body, _init_carry(), jnp.arange(n_chunks))
        else:
            active_chunks = (count + chunk - 1) // chunk

            def cond(state):
                c, carry = state
                return (c < active_chunks) & (jnp.max(carry.T) > T_threshold)

            def step(state):
                c, carry = state
                return c + 1, chunk_step(carry, c)

            _, carry = jax.lax.while_loop(cond, step, (jnp.int32(0), _init_carry()))

        return TileOutputs(
            color=carry.color,
            depth=carry.depth,
            depth_index=carry.depth_index,
            color_index=carry.color_index,
            depth_weight=carry.depth_weight,
            color_weight=carry.color_weight,
            T_final=carry.T,
        )

    return jax.vmap(run_tile)(tile_feat, tile_gidx, tile_counts, origins)


# ---------------------------------------------------------------------------
# transmission-only blend (mask renders)
# ---------------------------------------------------------------------------

@jax.jit
def blend_transmission(
    tile_feat: jnp.ndarray,    # [T, Kt, 6]: mean2d, conic, opacity
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    T_threshold: float = 1e-4,
) -> jnp.ndarray:
    """Per-pixel final transmittance ONLY — the piece the optimize loop's
    partial-render masks consume (reference ``evaluate_render_range``,
    mapper.py:471-508, uses the render's transmission map and nothing else
    in local mode).  Identical alpha math and early-exit rule as the full
    blend, minus color/depth/index bookkeeping and the SH shade — and the
    per-tile gather carries 6 floats per gaussian instead of 11.

    Exactness pinned by test_rasterizer.py::test_transmission_only_matches:
    the mask (T != 1) is exact — T == 1.0 iff every alpha is exactly 0 on
    both paths — and T itself agrees to reduction-order rounding.
    """
    Kt = tile_feat.shape[1]
    chunk = min(CHUNK, Kt)

    def run_tile(tfeat, count, origin):
        pix = _tile_pixels(origin)
        active_chunks = (count + chunk - 1) // chunk

        def cond(state):
            c, T = state
            return (c < active_chunks) & (jnp.max(T) > T_threshold)

        def step(state):
            c, T = state
            feat = jax.lax.dynamic_slice_in_dim(tfeat, c * chunk, chunk, axis=0)
            mean2d, conic, opa = feat[:, 0:2], feat[:, 2:5], feat[:, 5]
            dx = pix[:, None, 0] - mean2d[None, :, 0]
            dy = pix[:, None, 1] - mean2d[None, :, 1]
            power = -0.5 * (conic[None, :, 0] * dx * dx
                            + conic[None, :, 2] * dy * dy) \
                - conic[None, :, 1] * dx * dy
            alpha = opa[None, :] * jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.where(power > 0, 0.0, alpha)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
            return c + 1, T * jnp.prod(1.0 - alpha, axis=1)

        _, T = jax.lax.while_loop(
            cond, step, (jnp.int32(0), jnp.ones(TILE * TILE)))
        return T

    return jax.vmap(run_tile)(tile_feat, tile_counts, origins)


# ---------------------------------------------------------------------------
# custom-VJP fused blend: early-exit forward AND hand-written backward
# ---------------------------------------------------------------------------
#
# The scan path above differentiates via jax.checkpoint: every optimize
# iteration pays (forward over ALL chunks) + (recompute + reverse over ALL
# chunks), even though typical tiles hold 1-2 live chunks.  The fused path
# mirrors the reference CUDA rasterizer (forward stops at T < threshold and
# records per-chunk state; backward walks the same range back-to-front,
# diff_gaussian_rasterization_depth backward.cu / SLAM/render.py:110-133):
#
#   C  = sum_i alpha_i T_i rgb_i,   T_i = prod_{j<i} (1 - alpha_j)
#   dL/drgb_i   = w_i g_C
#   dL/dalpha_i = T_i (rgb_i . g_C) - (s_i + T_fin g_T) / (1 - alpha_i),
#                 s_i = sum_{j>i} w_j (rgb_j . g_C)
#   depth out   = z of the first opaque hit  ->  dL/dz_k = g_D at that slot.
#
# Differentiable outputs: color, depth, T_final.  The hit-weight outputs and
# index maps are treated as non-differentiable (the optimize loss never
# consumes them; grads would be silently dropped — keep it that way).

_BIG = jnp.float32(3.0e38)


def _chunk_alphas_vjp(feat_chunk, pix, opaque_threshold):
    """Like _chunk_alphas but also returns the pieces the backward needs:
    exp-term, gradient gate, pixel deltas, conic rows."""
    mean2d = feat_chunk[:, 0:2]
    conic = feat_chunk[:, 2:5]
    z = feat_chunk[:, 5]
    rgb = feat_chunk[:, 6:9]
    opa = feat_chunk[:, 9]
    elig = feat_chunk[:, 10] > 0.5

    dx = pix[:, None, 0] - mean2d[None, :, 0]   # [256, C] (see _chunk_alphas
    dy = pix[:, None, 1] - mean2d[None, :, 1]   # on why not a [.., 2] stack)
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) \
        - conic[None, :, 1] * dx * dy
    e = jnp.exp(jnp.minimum(power, 0.0))
    raw = opa[None, :] * e
    alpha = jnp.minimum(raw, ALPHA_MAX)
    gate = (power <= 0) & (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
    alpha = jnp.where((power > 0) | (raw < ALPHA_EPS), 0.0, alpha)
    opaque = elig[None, :] & (alpha >= opaque_threshold)
    return alpha, rgb, z, opaque, e, gate, dx, dy, conic


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_tiles_fused(tile_feat, tile_gidx, tile_counts, origins,
                      opaque_threshold, T_threshold,
                      use_pallas=False, pallas_interpret=False) -> TileOutputs:
    """Differentiable blend with early exit in forward and backward.

    Same inputs/outputs as :func:`blend_tiles_pregathered`; use for the
    optimize loop's render (`models/optimize.py`).  With ``use_pallas`` both
    the forward and the backward run as Pallas TPU kernels (grid = tiles,
    fully independent per-tile early exit)."""
    out, _ = _fused_fwd(tile_feat, tile_gidx, tile_counts, origins,
                        opaque_threshold, T_threshold,
                        use_pallas, pallas_interpret)
    return out


def _fused_fwd(tile_feat, tile_gidx, tile_counts, origins,
               opaque_threshold, T_threshold,
               use_pallas=False, pallas_interpret=False):
    Kt = tile_feat.shape[1]
    chunk = min(CHUNK, Kt)
    n_chunks = Kt // chunk

    if use_pallas:
        from . import pallas_blend

        out, entry_T, done = pallas_blend.blend_fwd_pallas(
            tile_feat, tile_gidx, tile_counts, origins,
            opaque_threshold, T_threshold, pallas_interpret)
        res = (tile_feat, tile_gidx, origins, entry_T, done,
               out.T_final, out.depth_index)
        return out, res

    def run_tile(tfeat, tgidx, count, origin):
        pix = _tile_pixels(origin)
        active_chunks = (count + chunk - 1) // chunk
        entry0 = jnp.zeros((n_chunks, TILE * TILE))

        def cond(state):
            c, carry, _ = state
            return (c < active_chunks) & (jnp.max(carry.T) > T_threshold)

        def step(state):
            c, carry, entry = state
            entry = jax.lax.dynamic_update_slice_in_dim(
                entry, carry.T[None], c, axis=0)
            feat = jax.lax.dynamic_slice_in_dim(tfeat, c * chunk, chunk, axis=0)
            gidx = jax.lax.dynamic_slice_in_dim(tgidx, c * chunk, chunk, axis=0)
            return c + 1, _blend_chunk(carry, feat, gidx, pix, opaque_threshold), entry

        done, carry, entry = jax.lax.while_loop(
            cond, step, (jnp.int32(0), _init_carry(), entry0))
        out = TileOutputs(
            color=carry.color, depth=carry.depth,
            depth_index=carry.depth_index, color_index=carry.color_index,
            depth_weight=carry.depth_weight, color_weight=carry.color_weight,
            T_final=carry.T)
        return out, entry, done

    out, entry_T, done = jax.vmap(run_tile)(
        tile_feat, tile_gidx, tile_counts, origins)
    res = (tile_feat, tile_gidx, origins, entry_T, done,
           out.T_final, out.depth_index)
    return out, res


def _float_cot(g, like):
    """Cotangents for integer outputs arrive as float0 — replace with zeros."""
    if g is None or g.dtype == jax.dtypes.float0:
        return jnp.zeros(like.shape, jnp.float32)
    return g.astype(jnp.float32)


def _fused_bwd(opaque_threshold, T_threshold, use_pallas, pallas_interpret,
               res, g: TileOutputs):
    tile_feat, tile_gidx, origins, entry_T, done, T_fin, depth_index = res
    Kt = tile_feat.shape[1]
    chunk = min(CHUNK, Kt)

    g_color = _float_cot(g.color, T_fin[..., None].repeat(3, -1))
    g_depth = _float_cot(g.depth, T_fin)
    g_T = _float_cot(g.T_final, T_fin)

    if use_pallas:
        import numpy as np

        from . import pallas_blend

        g_feat = pallas_blend.blend_bwd_pallas(
            tile_feat, tile_gidx, origins, entry_T, done,
            g_color, g_depth, T_fin * g_T, depth_index,
            opaque_threshold, pallas_interpret)
        return (g_feat,
                np.zeros(tile_gidx.shape, jax.dtypes.float0),
                np.zeros(done.shape, jax.dtypes.float0),
                jnp.zeros_like(origins))

    def bwd_tile(tfeat, tgidx, origin, entry, n_done, Tf, didx,
                 gc, gd, gt):
        pix = _tile_pixels(origin)
        tfin_gt = Tf * gt                                   # [256]

        def cond(state):
            c, _, _ = state
            return c >= 0

        def step(state):
            c, s_carry, gfeat = state
            feat = jax.lax.dynamic_slice_in_dim(tfeat, c * chunk, chunk, axis=0)
            gidx = jax.lax.dynamic_slice_in_dim(tgidx, c * chunk, chunk, axis=0)
            alpha, rgb, z, opaque, e, gate, dx, dy, conic = \
                _chunk_alphas_vjp(feat, pix, opaque_threshold)

            one_minus = 1.0 - alpha
            cum = jnp.cumprod(one_minus, axis=1)
            excl = jnp.concatenate(
                [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
            T_in = entry[c][:, None] * excl                 # [256, C]
            w = alpha * T_in

            rgbdot = jnp.dot(gc, rgb.T,
                             preferred_element_type=jnp.float32)  # [256, C]
            wg = w * rgbdot
            incl = jnp.cumsum(wg, axis=1)
            tot = incl[:, -1]
            s_in = tot[:, None] - incl                      # suffix-exclusive
            s_total = s_in + s_carry[:, None]

            galpha = T_in * rgbdot \
                - (s_total + tfin_gt[:, None]) / one_minus
            galpha = jnp.where(gate, galpha, 0.0)

            gpow = galpha * alpha                           # [256, C]
            gmean_x = jnp.sum(
                gpow * (conic[None, :, 0] * dx + conic[None, :, 1] * dy), axis=0)
            gmean_y = jnp.sum(
                gpow * (conic[None, :, 2] * dy + conic[None, :, 1] * dx), axis=0)
            gca = jnp.sum(gpow * (-0.5 * dx * dx), axis=0)
            gcb = jnp.sum(gpow * (-dx * dy), axis=0)
            gcc = jnp.sum(gpow * (-0.5 * dy * dy), axis=0)
            gopa = jnp.sum(galpha * e, axis=0)
            grgb = jnp.dot(w.T, gc,
                           preferred_element_type=jnp.float32)  # [C, 3]

            # depth: the forward recorded the hit's ORIGINAL index; a
            # gaussian appears at most once per tile list, so matching
            # indices recovers the hit slot (sentinels are -1 on both sides).
            hit = opaque & (gidx[None, :] == didx[:, None]) & (didx >= 0)[:, None]
            gz = jnp.sum(jnp.where(hit, gd[:, None], 0.0), axis=0)

            gchunk = jnp.concatenate([
                gmean_x[:, None], gmean_y[:, None],
                gca[:, None], gcb[:, None], gcc[:, None],
                gz[:, None], grgb, gopa[:, None],
                jnp.zeros((chunk, 1)),
            ], axis=-1)
            gfeat = jax.lax.dynamic_update_slice_in_dim(
                gfeat, gchunk, c * chunk, axis=0)
            return c - 1, s_carry + tot, gfeat

        _, _, gfeat = jax.lax.while_loop(
            cond, step,
            (n_done - 1, jnp.zeros(TILE * TILE), jnp.zeros((Kt, 11))))
        return gfeat

    g_feat = jax.vmap(bwd_tile)(
        tile_feat, tile_gidx, origins, entry_T, done, T_fin, depth_index,
        g_color, g_depth, g_T)

    import numpy as np

    # integer primals (gidx, counts) take float0 cotangents
    return (g_feat,
            np.zeros(tile_gidx.shape, jax.dtypes.float0),
            np.zeros(done.shape, jax.dtypes.float0),
            jnp.zeros_like(origins))


blend_tiles_fused.defvjp(_fused_fwd, _fused_bwd)
