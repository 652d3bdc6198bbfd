#!/usr/bin/env python
"""Micro-attribution inside bin_sorted: which piece burns the latency?

prepare_probe.py showed optimize_prepare's per-frame body is dominated by
``bin_gaussians`` (binning), not the blend, at ~7% HBM utilization — so
some piece is latency-bound, not byte-bound.  This probe times jitted
micro-stages over the SAME 5-frame lax.map structure as production:

  topk        [L]-key depth sort (lax.top_k, k=V)
  hblock      block hit matrix [B, V] + row compaction (cumsum+scatter)
  htile       tile hit matrix [B, 64, Kb] from gathered block lists
  tcompact    tile-row compaction ([B*64, Kb] cumsum + scatter)
  tgather     positions -> global ids flat gather

Run (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prepare_probe2.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPS = 9


def measure(fn):
    import numpy as np

    def force(out):
        return [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]

    force(fn())
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        force(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from scripts.roofline import run_pipeline
    from rtgslam_tpu.models.gaussian_map import (
        activated_scales, alive_mask)
    from rtgslam_tpu.ops.rasterize import binning as B
    from rtgslam_tpu.ops.rasterize.project import project_geometry
    from rtgslam_tpu.utils.geometry import normalize

    specs, reals = {}, {}
    print("[probe2] capturing real args (8-frame pipeline)...")
    run_pipeline(int(os.environ.get("BENCH_H", 170)),
                 int(os.environ.get("BENCH_W", 300)), 8, specs, reals)
    a, k = reals["optimize_prepare"]
    (state, colors, depths, normals, w2cs, Ks, camposes) = a
    settings = k["settings"]
    L = k["row_limit"] or state.capacity
    H, W = settings.height, settings.width
    V = min(settings.max_visible, L)
    Kb, Kt = settings.block_capacity, settings.tile_capacity

    pool = alive_mask(state)[:L]
    xyz = state.xyz[:L]
    scales = activated_scales(state.scaling[:L])
    rots = normalize(state.rotation[:L])
    cams = {"w2c": w2cs, "K": Ks, "campos": camposes}

    tiles_y, tiles_x = B.tile_grid_shape(H, W)
    blocks_y, blocks_x = B.cdiv(tiles_y, B.TILES_PER_BLOCK), B.cdiv(
        tiles_x, B.TILES_PER_BLOCK)
    nB = blocks_y * blocks_x
    print(f"  L={L} V={V} Kb={Kb} Kt={Kt} blocks={nB} "
          f"tiles={tiles_y}x{tiles_x}")

    def proj(cam):
        return project_geometry(xyz, scales, rots, pool, cam["w2c"],
                                cam["K"], W, H, settings.scale_modifier)

    def stage(upto):
        def body(cam, depth):
            geo = proj(cam)
            keys = jnp.where(geo.visible, geo.depth, jnp.inf)
            order = jax.lax.top_k(-keys, V)[1].astype(jnp.int32)
            if upto == "topk":
                return order
            mean2d = geo.mean2d[order]
            r2 = (geo.radius * geo.radius)[order]
            mx, my = mean2d[:, 0], mean2d[:, 1]
            valid = jnp.arange(V) < jnp.minimum(
                jnp.sum(geo.visible), V)
            bx = jnp.arange(blocks_x, dtype=jnp.float32) * B.BLOCK
            by = jnp.arange(blocks_y, dtype=jnp.float32) * B.BLOCK
            bx0 = jnp.tile(bx, blocks_y)
            by0 = jnp.repeat(by, blocks_x)

            def hits(cx, cy, rx0, ry0, size, rr):
                nx = jnp.clip(cx, rx0, rx0 + size)
                ny = jnp.clip(cy, ry0, ry0 + size)
                return ((cx - nx) ** 2 + (cy - ny) ** 2) <= rr

            hit_block = valid[None, :] & hits(
                mx[None, :], my[None, :], bx0[:, None], by0[:, None],
                B.BLOCK, r2[None, :])
            if upto == "hblock_raw":
                return hit_block
            block_lists, block_counts = B._compact_rows(hit_block, Kb, V)
            if upto == "hblock":
                return block_lists, block_counts

            def gather_pad(arr, fill):
                return jnp.concatenate(
                    [arr, jnp.full((1,), fill, arr.dtype)])[block_lists]

            gmx = gather_pad(mx, jnp.inf)
            gmy = gather_pad(my, jnp.inf)
            gr2 = gather_pad(r2, 0.0)
            txy = jnp.arange(B.TILES_PER_BLOCK, dtype=jnp.float32) * B.TILE
            tdx = jnp.tile(txy, B.TILES_PER_BLOCK)
            tdy = jnp.repeat(txy, B.TILES_PER_BLOCK)
            tx0 = bx0[:, None] + tdx[None, :]
            ty0 = by0[:, None] + tdy[None, :]
            nx = jnp.clip(gmx[:, None, :], tx0[:, :, None],
                          (tx0 + B.TILE)[:, :, None])
            ny = jnp.clip(gmy[:, None, :], ty0[:, :, None],
                          (ty0 + B.TILE)[:, :, None])
            hit_tile = (((gmx[:, None, :] - nx) ** 2
                         + (gmy[:, None, :] - ny) ** 2)
                        <= gr2[:, None, :])
            if upto == "htile":
                return hit_tile
            tile_pos, tile_counts = B._compact_rows(hit_tile, Kt, Kb)
            if upto == "tcompact":
                return tile_pos, tile_counts
            block_lists_pad = jnp.concatenate(
                [block_lists, jnp.full((nB, 1), V, jnp.int32)], axis=1)
            flat = block_lists_pad.reshape(-1)
            block_of = jax.lax.broadcasted_iota(jnp.int32, tile_pos.shape, 0)
            tl = flat[block_of * (Kb + 1) + jnp.minimum(tile_pos, Kb)]
            return tl, tile_counts

        def reduced(cd):
            # scalar-reduce every output: the tunneled D2H fetch is slow
            # enough (MB-sized returns) to swamp stage deltas otherwise
            out = body(cd[0], cd[1])
            leaves = out if isinstance(out, tuple) else (out,)
            return sum(jnp.sum(x.astype(jnp.int32)) if x.dtype == jnp.bool_
                       else jnp.sum(x) for x in leaves)

        return jax.jit(lambda: jax.lax.map(reduced, (cams, depths)))

    rows = {}
    for name in ("topk", "hblock_raw", "hblock", "htile", "tcompact",
                 "tgather"):
        rows[name] = measure(stage(name))
        print(f"  upto {name:10s} {rows[name]:8.1f} ms")
    out = {"L": int(L), "V": int(V), "Kb": Kb, "Kt": Kt, "B": nB,
           "reps": REPS, "F": int(depths.shape[0]), "ms": rows}
    with open("/tmp/prepare_probe2.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
