"""Depth sorting and hierarchical tile binning with static shapes.

Replaces the CUDA rasterizer's duplicate+radix-sort tile binning with a
TPU-friendly two-level scheme that never materializes dynamic-length lists:

1. one global depth ``argsort`` of the fixed-capacity gaussian array (XLA
   sort on device; invisible gaussians sort to the end via +inf keys);
2. coarse binning into 128x128-pixel *blocks*: a [B, P] overlap test
   compacted to ``block_capacity`` indices per block with a static-size
   ``nonzero`` (cumsum + scatter under the hood);
3. fine binning of each block's list into its 8x8 grid of 16x16-pixel
   *tiles* with ``tile_capacity`` entries each.

Because step 1 pre-sorts by depth and the compactions are stable, every
per-tile list is automatically in front-to-back order — the property the
blend stage relies on.  Overflow beyond a capacity drops the *farthest*
gaussians of that bin (they are the most occluded); overflow counts are
returned for observability.
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
    tile_lists: jnp.ndarray   # [T, Kt] int32 indices into the sorted arrays (sentinel = P)
    tile_counts: jnp.ndarray  # [T] int32 valid entries per tile
    order: jnp.ndarray        # [P] sorted -> original index
    overflow: jnp.ndarray     # [] int32 total dropped entries (block+tile)


def tile_grid_shape(height: int, width: int):
    """(tiles_y, tiles_x) matching the reference tile-mask layout."""
    return cdiv(height, TILE), cdiv(width, TILE)


def bin_gaussians(
    proj: Projected,
    height: int,
    width: int,
    block_capacity: int,
    tile_capacity: int,
    tile_mask: jnp.ndarray | None = None,
) -> Binning:
    """Build per-tile front-to-back index lists.

    ``tile_mask`` is the reference's int [tiles_y, tiles_x] grid
    (render.py:101-108): tiles with 0 get empty lists so the blend skips them.
    """
    P = proj.depth.shape[0]
    tiles_y, tiles_x = tile_grid_shape(height, width)
    blocks_y, blocks_x = cdiv(tiles_y, TILES_PER_BLOCK), cdiv(tiles_x, TILES_PER_BLOCK)
    B = blocks_y * blocks_x
    T = B * TILES_PER_BLOCK * TILES_PER_BLOCK

    # ---- 1. global depth sort (invisible -> +inf -> end) ------------------
    keys = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(keys)                         # [P]
    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    visible = proj.visible[order]

    x0 = mean2d[:, 0] - radius
    x1 = mean2d[:, 0] + radius
    y0 = mean2d[:, 1] - radius
    y1 = mean2d[:, 1] + radius

    # ---- 2. coarse block binning -----------------------------------------
    bx = jnp.arange(blocks_x, dtype=jnp.float32) * BLOCK
    by = jnp.arange(blocks_y, dtype=jnp.float32) * BLOCK
    # [B] pixel bounds of every block
    block_x0 = jnp.tile(bx, blocks_y)
    block_y0 = jnp.repeat(by, blocks_x)
    hit_block = (
        visible[None, :]
        & (x1[None, :] > block_x0[:, None])
        & (x0[None, :] < (block_x0 + BLOCK)[:, None])
        & (y1[None, :] > block_y0[:, None])
        & (y0[None, :] < (block_y0 + BLOCK)[:, None])
    )                                                  # [B, P]
    block_total = hit_block.sum(axis=1)

    def compact(mask, capacity, fill):
        idx = jnp.nonzero(mask, size=capacity, fill_value=fill)[0]
        return idx.astype(jnp.int32)

    block_lists = jax.vmap(lambda m: compact(m, block_capacity, P))(hit_block)
    block_counts = jnp.minimum(block_total, block_capacity).astype(jnp.int32)
    block_overflow = (block_total - block_counts).sum()

    # ---- 3. fine tile binning within each block ---------------------------
    # gather the block's gaussian bboxes: [B, Kb]
    def gather_pad(arr, fill_value):
        padded = jnp.concatenate([arr, jnp.full((1,), fill_value, arr.dtype)])
        return padded[block_lists]

    gx0 = gather_pad(x0, jnp.inf)
    gx1 = gather_pad(x1, -jnp.inf)
    gy0 = gather_pad(y0, jnp.inf)
    gy1 = gather_pad(y1, -jnp.inf)

    # tile origins within a block: [64]
    txy = jnp.arange(TILES_PER_BLOCK, dtype=jnp.float32) * TILE
    tile_dx = jnp.tile(txy, TILES_PER_BLOCK)        # x-offset of tile in block
    tile_dy = jnp.repeat(txy, TILES_PER_BLOCK)

    tile_x0 = block_x0[:, None] + tile_dx[None, :]  # [B, 64]
    tile_y0 = block_y0[:, None] + tile_dy[None, :]

    hit_tile = (
        (gx1[:, None, :] > tile_x0[:, :, None])
        & (gx0[:, None, :] < (tile_x0 + TILE)[:, :, None])
        & (gy1[:, None, :] > tile_y0[:, :, None])
        & (gy0[:, None, :] < (tile_y0 + TILE)[:, :, None])
    )                                                # [B, 64, Kb]

    if tile_mask is not None:
        # pad mask to the block grid then flatten to [B, 64]
        padded = jnp.zeros(
            (blocks_y * TILES_PER_BLOCK, blocks_x * TILES_PER_BLOCK), jnp.int32
        ).at[:tiles_y, :tiles_x].set(tile_mask.astype(jnp.int32))
        m = padded.reshape(blocks_y, TILES_PER_BLOCK, blocks_x, TILES_PER_BLOCK)
        m = m.transpose(0, 2, 1, 3).reshape(B, TILES_PER_BLOCK * TILES_PER_BLOCK)
        hit_tile = hit_tile & (m[:, :, None] > 0)

    tile_total = hit_tile.sum(axis=2)

    def tile_compact(mask, blist):
        # positions into the block list; map through to global sorted indices
        pos = jnp.nonzero(mask, size=tile_capacity, fill_value=block_capacity)[0]
        blist_pad = jnp.concatenate([blist, jnp.array([P], jnp.int32)])
        return blist_pad[pos]

    tile_lists = jax.vmap(jax.vmap(tile_compact, in_axes=(0, None)))(
        hit_tile, block_lists
    )                                                # [B, 64, Kt]
    tile_counts = jnp.minimum(tile_total, tile_capacity).astype(jnp.int32)
    tile_overflow = (tile_total - tile_counts).sum()

    return Binning(
        tile_lists=tile_lists.reshape(T, tile_capacity),
        tile_counts=tile_counts.reshape(T),
        order=order.astype(jnp.int32),
        overflow=(block_overflow + tile_overflow).astype(jnp.int32),
    )


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
