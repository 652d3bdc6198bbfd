"""Tile-sharded (spatial-parallel) rendering over a device mesh.

Complements the frame-parallel optimizer (`sharded.py`): for a SINGLE
camera, the blend stage — the rasterizer's dominant cost — is sharded over
the tile dimension with ``shard_map``.  Gaussian state is replicated (tens
of MB), the per-tile feature blocks are partitioned, each device blends its
tile slice locally, and the image reassembles from the sharded outputs
(XLA inserts the all-gather on the ICI ring at the `scatter_tiles` step).

Projection + binning are replicated: they are a small fraction of render
time and sharding them would need a gaussian-space partition with a
cross-device exchange at the tile boundary — frame- and tile-parallelism
already cover the multi-chip operating points the pipeline uses.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.rasterize import binning, blend
from ..ops.rasterize.api import RasterSettings
from ..ops.rasterize.project import project_geometry, shade_cols


def sp_render(gaussians, camera, settings: RasterSettings, mesh: Mesh,
              tile_mask=None):
    """Render with the blend sharded over ``mesh`` (1-D).  Emits the full
    output contract of ``ops.rasterize.render`` (api.py:136-146): all seven
    rasterizer outputs plus the gathered per-gaussian normal map and the
    binning overflow counter.  Inference path only."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    H, W = settings.height, settings.width

    geo = project_geometry(
        gaussians["xyz"], gaussians["scales"], gaussians["rotations"],
        gaussians["alive"], camera["w2c"], camera["K"], W, H,
        settings.scale_modifier)
    bins = binning.bin_gaussians(
        geo, H, W, settings.block_capacity, settings.tile_capacity,
        settings.max_visible, tile_mask=tile_mask)
    order = bins.order
    r, g, b, elig = shade_cols(
        gaussians["xyz"][order],
        gaussians["shs"].reshape(gaussians["shs"].shape[0], -1)[order],
        gaussians["normal"][order], camera["campos"],
        settings.sh_degree, settings.normal_threshold)
    feat = blend._pack_features((
        geo.mean2d[order, 0], geo.mean2d[order, 1],
        geo.conic[order, 0], geo.conic[order, 1], geo.conic[order, 2],
        geo.depth[order], r, g, b,
        gaussians["opacity"].reshape(-1)[order], elig.astype(jnp.float32)))
    origins = binning.tile_origins(H, W)
    order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])
    tile_feat = feat.gather(bins.tile_lists)      # FeatCols of [T, Kt]
    tile_gidx = order_pad[bins.tile_lists]

    T = tile_gidx.shape[0]
    pad = (-T) % n_dev

    def pad_t(x, fill=0):
        if pad == 0:
            return x
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    tf = jax.tree.map(pad_t, tile_feat)           # FeatCols: pad each column
    tg = pad_t(tile_gidx, -1)
    tc, to = pad_t(bins.tile_counts), pad_t(origins)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P(axis)),
             out_specs=jax.tree.map(lambda _: P(axis), blend.TileOutputs(
                 *([0] * 7))),
             check_vma=False)
    def run(tf, tg, tc, to):
        return blend.blend_tiles_pregathered(
            tf, tg, tc, to,
            opaque_threshold=settings.opaque_threshold,
            T_threshold=settings.T_threshold)

    tiles = run(tf, tg, tc, to)
    tiles = jax.tree.map(lambda x: x[:T], tiles)

    def to_image(x, channels):
        return binning.scatter_tiles(
            x.reshape(T, blend.TILE * blend.TILE, channels), H, W)

    color = to_image(tiles.color, 3)
    depth = to_image(tiles.depth[..., None], 1)
    depth_index = to_image(tiles.depth_index[..., None].astype(jnp.int32), 1)[..., 0]
    color_index = to_image(tiles.color_index[..., None].astype(jnp.int32), 1)[..., 0]
    depth_w = to_image(tiles.depth_weight[..., None], 1)
    color_w = to_image(tiles.color_weight[..., None], 1)
    T_map = to_image(tiles.T_final[..., None], 1)

    # gathered world normal of the opaque gaussian (api.py:136-146 contract)
    normal_pad = jnp.concatenate(
        [gaussians["normal"], jnp.zeros((1, 3), gaussians["normal"].dtype)], axis=0)
    normal = jnp.where(
        (depth_index >= 0)[..., None], normal_pad[jnp.clip(depth_index, 0)], 0.0)

    return {
        "render": color,
        "depth": depth,
        "normal": normal,
        "color_index_map": color_index,
        "depth_index_map": depth_index,
        "color_hit_weight": color_w,
        "depth_hit_weight": depth_w,
        "T_map": T_map,
        "overflow": bins.overflow,
    }
