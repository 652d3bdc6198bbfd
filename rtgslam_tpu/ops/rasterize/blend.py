"""Front-to-back alpha blending over per-tile depth-ordered lists.

TPU-native reformulation of the reference CUDA blend loop: instead of a
sequential per-gaussian walk per pixel, each 16x16 tile processes its list in
chunks of ``CHUNK`` gaussians at once —

* per-chunk alphas form a [256, CHUNK] matrix (VPU elementwise work);
* the front-to-back transmittance is an *exclusive cumulative product* along
  the chunk axis (a log-depth scan XLA vectorizes well);
* color accumulation is a [256, CHUNK] @ [CHUNK, 3] matmul (MXU).

Two execution modes share the math:
  ``blend_scan``  — fixed chunk count, reverse-differentiable (jax.checkpoint
                    on the body keeps activation memory at one chunk);
  ``blend_while`` — ``lax.while_loop`` with early exit once every pixel of
                    the tile is saturated (T < T_threshold) or the list is
                    exhausted; inference-only.

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

    d = pix[:, None, :] - mean2d[None, :, :]             # [256, C, 2]
    dx, dy = d[..., 0], d[..., 1]
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
