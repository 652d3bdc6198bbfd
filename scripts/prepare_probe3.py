#!/usr/bin/env python
"""Split the tile-compaction cost (prepare_probe2: +40 ms of prepare's
131.7) into cumsum vs scatter, and A/B TPU-friendlier formulations.

Variants on the REAL [B*64, Kb] tile hit matrix, same 5-frame lax.map:

  sumonly     reduce hit_tile (floor: hit construction)
  cumsum      + exclusive cumsum along Kb (XLA reduce_window lowering)
  cumsum_mm   + cumsum as [rows,Kb]@[Kb,Kb] strictly-lower-tri f32 matmul
              (MXU does 12.9 GFLOP in ~0.3 ms; the log-pass lowering is
              latency-bound instead)
  full        + the production scatter (== _compact_rows)
  full_mm     tri-matmul cumsum + the same scatter

Run (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prepare_probe3.py
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

    np.asarray(fn())
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from scripts.roofline import run_pipeline
    from rtgslam_tpu.models.gaussian_map import activated_scales, alive_mask
    from rtgslam_tpu.ops.rasterize import binning as B
    from rtgslam_tpu.ops.rasterize.project import project_geometry
    from rtgslam_tpu.utils.geometry import normalize

    specs, reals = {}, {}
    print("[probe3] capturing real args (8-frame pipeline)...")
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
    rows = nB * 64
    print(f"  rows={rows} Kb={Kb} Kt={Kt}")

    tri = jnp.tril(jnp.ones((Kb, Kb), jnp.float32), -1)  # strictly lower

    def hit_tile_of(cam):
        geo = project_geometry(xyz, scales, rots, pool, cam["w2c"],
                               cam["K"], W, H, settings.scale_modifier)
        keys = jnp.where(geo.visible, geo.depth, jnp.inf)
        order = jax.lax.top_k(-keys, V)[1].astype(jnp.int32)
        mean2d = geo.mean2d[order]
        r2 = (geo.radius * geo.radius)[order]
        mx, my = mean2d[:, 0], mean2d[:, 1]
        valid = jnp.arange(V) < jnp.minimum(jnp.sum(geo.visible), V)
        bx = jnp.arange(blocks_x, dtype=jnp.float32) * B.BLOCK
        by = jnp.arange(blocks_y, dtype=jnp.float32) * B.BLOCK
        bx0 = jnp.tile(bx, blocks_y)
        by0 = jnp.repeat(by, blocks_x)
        nx = jnp.clip(mx[None, :], bx0[:, None], bx0[:, None] + B.BLOCK)
        ny = jnp.clip(my[None, :], by0[:, None], by0[:, None] + B.BLOCK)
        hit_block = valid[None, :] & (
            ((mx[None, :] - nx) ** 2 + (my[None, :] - ny) ** 2)
            <= r2[None, :])
        block_lists, _ = B._compact_rows(hit_block, Kb, V)

        def gp(arr, fill):
            return jnp.concatenate(
                [arr, jnp.full((1,), fill, arr.dtype)])[block_lists]

        gmx, gmy, gr2 = gp(mx, jnp.inf), gp(my, jnp.inf), gp(r2, 0.0)
        txy = jnp.arange(B.TILES_PER_BLOCK, dtype=jnp.float32) * B.TILE
        tdx = jnp.tile(txy, B.TILES_PER_BLOCK)
        tdy = jnp.repeat(txy, B.TILES_PER_BLOCK)
        tx0 = bx0[:, None] + tdx[None, :]
        ty0 = by0[:, None] + tdy[None, :]
        nx = jnp.clip(gmx[:, None, :], tx0[:, :, None],
                      (tx0 + B.TILE)[:, :, None])
        ny = jnp.clip(gmy[:, None, :], ty0[:, :, None],
                      (ty0 + B.TILE)[:, :, None])
        return ((((gmx[:, None, :] - nx) ** 2 + (gmy[:, None, :] - ny) ** 2)
                 <= gr2[:, None, :]).reshape(rows, Kb))

    def scatter_from(hit_f, pos_f):
        src = jax.lax.broadcasted_iota(jnp.int32, hit_f.shape, 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, hit_f.shape, 0)
        flat_target = jnp.where(hit_f & (pos_f < Kt),
                                row_iota * Kt + pos_f, rows * Kt)
        out = jnp.full((rows * Kt,), Kb, jnp.int32)
        out = out.at[flat_target.reshape(-1)].set(
            src.reshape(-1), mode="drop", unique_indices=True)
        return out

    def variant(which):
        def body(cd):
            hit = hit_tile_of(cd)
            if which == "sumonly":
                return jnp.sum(hit.astype(jnp.int32))
            if which == "full_topk":
                # scatter-free: k-th set bit == k-th smallest of
                # (hit ? index : BIG); values ARE the indices
                key = jnp.where(hit, jax.lax.broadcasted_iota(
                    jnp.int32, hit.shape, 1), jnp.int32(1 << 30))
                vals = -jax.lax.top_k(-key, Kt)[0]
                counts = jnp.sum(hit.astype(jnp.int32), axis=-1)
                k_iota = jnp.arange(Kt, dtype=jnp.int32)[None, :]
                out = jnp.where(k_iota < jnp.minimum(counts, Kt)[:, None],
                                vals, Kb)
                return jnp.sum(out)
            if which.endswith("_mm"):
                pos = (hit.astype(jnp.float32) @ tri.T).astype(jnp.int32)
            else:
                pos = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1
            if which.startswith("cumsum"):
                return jnp.sum(pos)
            return jnp.sum(scatter_from(hit, pos))

        return jax.jit(lambda: jax.lax.map(body, cams))

    import numpy as np

    rows_out = {}
    for name in ("sumonly", "cumsum", "cumsum_mm", "full", "full_mm",
                 "full_topk"):
        rows_out[name] = measure(variant(name))
        print(f"  {name:10s} {rows_out[name]:8.1f} ms")
    # exactness: the MXU accumulates bf16 products in f32, so the 0/1
    # matmul cumsum must reproduce the reduce-window cumsum bit-for-bit
    ref = np.asarray(variant("full")())
    for other in ("full_mm", "full_topk"):
        same = np.array_equal(ref, np.asarray(variant(other)()))
        print(f"  full == {other}: {same}")
        assert same, f"{other} diverged from the scatter compaction"
    out = {"rows": rows, "Kb": Kb, "Kt": Kt, "reps": REPS,
           "F": int(depths.shape[0]), "ms": rows_out}
    with open("/tmp/prepare_probe3.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
