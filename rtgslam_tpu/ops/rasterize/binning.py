"""Depth sorting and hierarchical tile binning with static shapes.

Replaces the CUDA rasterizer's duplicate+radix-sort tile binning with a
TPU-friendly scheme that never materializes dynamic-length lists:

1. one global depth ``argsort`` of the fixed-capacity gaussian array
   (invisible gaussians sort to the end via +inf keys), truncated to a
   static ``max_visible`` working set — every later stage scales with the
   *visible* population, not the map capacity;
2. coarse binning into 128x128-pixel *blocks* and fine binning into their
   16x16-pixel *tiles*.  Each level is ONE batched cumsum over the overlap
   mask plus ONE scatter into the fixed-capacity lists (vmapped ``nonzero``
   compiles to a serial kernel per row — measured 60x slower);
3. because step 1 pre-sorts by depth and the compaction scatter preserves
   order, every per-tile list is automatically front-to-back — the property
   the blend stage relies on.

Overflow beyond any capacity drops the *farthest* gaussians of that bin
(the most occluded); overflow counts are returned for observability.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .project import Projected

TILE = 16
TILES_PER_BLOCK = 8           # 8x8 tiles per block
BLOCK = TILE * TILES_PER_BLOCK  # 128 px


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


class Binning(NamedTuple):
    tile_lists: jnp.ndarray   # [T, Kt] int32 indices into the truncated sorted arrays (sentinel = V)
    tile_counts: jnp.ndarray  # [T] int32 valid entries per tile
    order: jnp.ndarray        # [V] sorted -> original index (valid prefix)
    n_visible: jnp.ndarray    # [] int32
    overflow: jnp.ndarray     # [] int32 dropped entries (visible+block+tile)


def tile_grid_shape(height: int, width: int):
    """(tiles_y, tiles_x) matching the reference tile-mask layout."""
    return cdiv(height, TILE), cdiv(width, TILE)


def _compact_rows(hit: jnp.ndarray, capacity: int, fill: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row stable compaction of a [..., N] boolean mask into index lists.

    Returns (lists [..., capacity] int32 with ``fill`` sentinel, counts).

    Formulated as a TOP_K, not a scatter or cumsum+gather: the k-th set
    bit of a row is the k-th smallest value of ``where(hit, index, BIG)``,
    and top_k's returned VALUES are those indices directly (XLA lowers
    batched top_k to the TPU's PartialReduce unit).  The alternatives were
    all probed on the v5e (scripts/prepare_probe3.py, 5-frame production
    structure, [384, 4096] -> [384, 512]):

      cumsum + scatter (even with ``unique_indices`` declared so the
        sort-based scatter expansion is skipped): +37 ms over the
        hit-matrix floor — the scatter itself is the cost;
      cumsum as a strictly-lower-triangular MXU matmul: cumsum was never
        the cost (+1 ms), scatter still dominates;
      binary-search gather (k-th set bit via ceil(log2 N) lane-axis
        ``take_along_axis`` rounds on the cumsum): REGRESSED measured at
        the prepare level (143 -> 277 ms);
      top_k: +1.7 ms, bit-identical output.
    """
    n = hit.shape[-1]
    counts = jnp.sum(hit.astype(jnp.int32), axis=-1)
    key = jnp.where(
        hit, jax.lax.broadcasted_iota(jnp.int32, hit.shape, hit.ndim - 1),
        jnp.int32(1) << 30)
    k_eff = min(capacity, n)
    vals = -jax.lax.top_k(-key, k_eff)[0]       # k_eff smallest, ascending
    if k_eff < capacity:                        # static pad (capacity > n)
        pad = jnp.broadcast_to(jnp.int32(1) << 30,
                               (*hit.shape[:-1], capacity - k_eff))
        vals = jnp.concatenate([vals, pad], axis=-1)
    counts_c = jnp.minimum(counts, capacity).astype(jnp.int32)
    k_iota = jnp.arange(capacity, dtype=jnp.int32)
    out = jnp.where(k_iota < counts_c[..., None], vals, fill)
    return out, counts_c


def bin_gaussians(
    proj: Projected,
    height: int,
    width: int,
    block_capacity: int,
    tile_capacity: int,
    max_visible: int,
    tile_mask: jnp.ndarray | None = None,
) -> Binning:
    """Build per-tile front-to-back index lists.

    ``tile_mask`` is the reference's int [tiles_y, tiles_x] grid
    (render.py:101-108): tiles with 0 get empty lists so the blend skips them.
    """
    P = proj.depth.shape[0]
    V = min(max_visible, P)
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    B = blocks_y * blocks_x
    T = B * TILES_PER_BLOCK * TILES_PER_BLOCK

    # ---- 1. global depth sort, truncated to the static working set -------
    keys = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jax.lax.top_k(-keys, V)[1].astype(jnp.int32)  # V smallest depths
    n_visible = jnp.sum(proj.visible).astype(jnp.int32)
    n_valid = jnp.minimum(n_visible, V)
    visible_overflow = n_visible - n_valid

    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    rank = jnp.arange(V, dtype=jnp.int32)
    valid = rank < n_valid

    tile_lists, tile_counts, bin_overflow = bin_sorted(
        mean2d[:, 0], mean2d[:, 1], radius * radius, valid,
        height, width, block_capacity, tile_capacity, tile_mask)

    return Binning(
        tile_lists=tile_lists,
        tile_counts=tile_counts,
        order=order,
        n_visible=n_valid,
        overflow=(visible_overflow + bin_overflow).astype(jnp.int32),
    )


def bin_sorted(
    mx: jnp.ndarray,              # [V] screen-x of depth-sorted entries
    my: jnp.ndarray,              # [V]
    r2: jnp.ndarray,              # [V] squared pixel radius
    valid: jnp.ndarray,           # [V] bool
    height: int,
    width: int,
    block_capacity: int,
    tile_capacity: int,
    tile_mask: jnp.ndarray | None = None,
):
    """Block/tile binning of an ALREADY depth-sorted working set.

    Split out of :func:`bin_gaussians` so an incremental render (one that
    merges newly inserted gaussians into a carried sorted working set,
    api.render_with_inserted) can rebuild tile lists without re-running the
    [P]-key depth sort.  Returns (tile_lists [T, Kt] with sentinel == V,
    tile_counts [T], block+tile overflow).
    """
    V = mx.shape[0]
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    B = blocks_y * blocks_x
    T = B * TILES_PER_BLOCK * TILES_PER_BLOCK

    def circle_hits_rect(cx, cy, rx0, ry0, size):
        """Tighter circle-vs-rect test than bbox overlap (~20-30% fewer
        gaussian-tile pairs -> fewer alpha/exp evals in the blend)."""
        nx = jnp.clip(cx, rx0, rx0 + size)
        ny = jnp.clip(cy, ry0, ry0 + size)
        dx = cx - nx
        dy = cy - ny
        return dx * dx + dy * dy <= r2

    # ---- 2. coarse block binning -----------------------------------------
    bx = jnp.arange(blocks_x, dtype=jnp.float32) * BLOCK
    by = jnp.arange(blocks_y, dtype=jnp.float32) * BLOCK
    block_x0 = jnp.tile(bx, blocks_y)               # [B]
    block_y0 = jnp.repeat(by, blocks_x)
    hit_block = valid[None, :] & circle_hits_rect(
        mx[None, :], my[None, :], block_x0[:, None], block_y0[:, None], BLOCK)
    # [B, V]
    block_total = hit_block.sum(axis=1)
    block_lists, block_counts = _compact_rows(hit_block, block_capacity, V)
    block_overflow = (block_total - block_counts).sum()

    # ---- 3. fine tile binning within each block ---------------------------
    def gather_pad(arr, fill_value):
        padded = jnp.concatenate([arr, jnp.full((1,), fill_value, arr.dtype)])
        return padded[block_lists]

    gmx = gather_pad(mx, jnp.inf)                   # [B, Kb]
    gmy = gather_pad(my, jnp.inf)
    gr2 = gather_pad(r2, 0.0)

    txy = jnp.arange(TILES_PER_BLOCK, dtype=jnp.float32) * TILE
    tile_dx = jnp.tile(txy, TILES_PER_BLOCK)        # [64]
    tile_dy = jnp.repeat(txy, TILES_PER_BLOCK)
    tile_x0 = block_x0[:, None] + tile_dx[None, :]  # [B, 64]
    tile_y0 = block_y0[:, None] + tile_dy[None, :]

    nx = jnp.clip(gmx[:, None, :], tile_x0[:, :, None], (tile_x0 + TILE)[:, :, None])
    ny = jnp.clip(gmy[:, None, :], tile_y0[:, :, None], (tile_y0 + TILE)[:, :, None])
    ddx = gmx[:, None, :] - nx
    ddy = gmy[:, None, :] - ny
    hit_tile = (ddx * ddx + ddy * ddy) <= gr2[:, None, :]  # [B, 64, Kb]

    if tile_mask is not None:
        padded = jnp.zeros(
            (blocks_y * TILES_PER_BLOCK, blocks_x * TILES_PER_BLOCK), jnp.int32
        ).at[:tiles_y, :tiles_x].set(tile_mask.astype(jnp.int32))
        m = padded.reshape(blocks_y, TILES_PER_BLOCK, blocks_x, TILES_PER_BLOCK)
        m = m.transpose(0, 2, 1, 3).reshape(B, TILES_PER_BLOCK * TILES_PER_BLOCK)
        hit_tile = hit_tile & (m[:, :, None] > 0)

    tile_total = hit_tile.sum(axis=2)
    tile_pos, tile_counts = _compact_rows(hit_tile, tile_capacity, block_capacity)
    tile_overflow = (tile_total - tile_counts).sum()

    # positions into the block list -> global sorted indices.  ONE flat 1-D
    # gather: the take_along_axis formulation (block_lists broadcast to
    # [B, 64, Kb+1]) forced ~600 MB of layout-conversion copies per render
    # on TPU (PERF.md round-3 layout table).
    block_lists_pad = jnp.concatenate(
        [block_lists, jnp.full((B, 1), V, jnp.int32)], axis=1)
    flat = block_lists_pad.reshape(-1)                       # [B * (Kb+1)]
    block_of = jax.lax.broadcasted_iota(jnp.int32, tile_pos.shape, 0)
    tile_lists = flat[block_of * (block_capacity + 1)
                      + jnp.minimum(tile_pos, block_capacity)]

    return (tile_lists.reshape(T, tile_capacity), tile_counts.reshape(T),
            block_overflow + tile_overflow)


def tile_mask_flat(tile_mask: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[tiles_y, tiles_x] mask -> [T] in the block-major flat tile layout
    (the layout of tile_lists/tile_counts).  Lets callers apply a tile mask
    AFTER binning by zeroing counts — blend-equivalent to binning with the
    mask (masked tiles produce empty lists either way); used by the shared
    prepare pass (optimize_prepare) which computes its binning before the
    mask exists."""
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    B = blocks_y * blocks_x
    padded = jnp.zeros(
        (blocks_y * TILES_PER_BLOCK, blocks_x * TILES_PER_BLOCK), jnp.int32
    ).at[:tiles_y, :tiles_x].set(tile_mask.astype(jnp.int32))
    m = padded.reshape(blocks_y, TILES_PER_BLOCK, blocks_x, TILES_PER_BLOCK)
    return m.transpose(0, 2, 1, 3).reshape(B * TILES_PER_BLOCK * TILES_PER_BLOCK)


def tile_origins(height: int, width: int) -> jnp.ndarray:
    """[T, 2] (x, y) pixel origin of each flat tile in block-major layout
    (the layout produced by :func:`bin_gaussians`)."""
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    bx = jnp.arange(blocks_x) * BLOCK
    by = jnp.arange(blocks_y) * BLOCK
    block_x0 = jnp.tile(bx, blocks_y)
    block_y0 = jnp.repeat(by, blocks_x)
    t = jnp.arange(TILES_PER_BLOCK) * TILE
    tile_dx = jnp.tile(t, TILES_PER_BLOCK)
    tile_dy = jnp.repeat(t, TILES_PER_BLOCK)
    ox = (block_x0[:, None] + tile_dx[None, :]).reshape(-1)
    oy = (block_y0[:, None] + tile_dy[None, :]).reshape(-1)
    return jnp.stack([ox, oy], axis=-1).astype(jnp.float32)


def scatter_tiles(tile_values: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """[T, TILE*TILE, C] per-tile pixels (block-major) -> [H, W, C] image."""
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    C = tile_values.shape[-1]
    v = tile_values.reshape(
        blocks_y, blocks_x, TILES_PER_BLOCK, TILES_PER_BLOCK, TILE, TILE, C
    )
    # -> [by, tile_y, py, bx, tile_x, px, C]
    v = v.transpose(0, 2, 4, 1, 3, 5, 6)
    img = v.reshape(blocks_y * TILES_PER_BLOCK * TILE, blocks_x * TILES_PER_BLOCK * TILE, C)
    return img[:height, :width]
