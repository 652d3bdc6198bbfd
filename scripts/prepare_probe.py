#!/usr/bin/env python
"""Attribute optimize_prepare's measured time to its pipeline stages.

Context (ROOFLINE.json, round 5): after the binning-compaction scatter
was marked ``unique_indices`` the prepare byte model collapsed 44 -> 7.7
GB/call, but measured time stayed ~132 ms = 14x the HBM speed-of-light
at 7% utilization — prepare is LATENCY-bound, not bandwidth-bound, so
hlo_traffic byte ranking cannot attribute it.  This probe times jitted
prefixes of the local-mode per-frame body (projection -> +depth top_k ->
+binning -> +transmission blend == production) on the real captured bench
args, each under the production ``lax.map`` frame loop, plus a
``vmap``-over-frames A/B of the full body (the radix-sort scatter
expansion that forced lax.map is gone once the scatter declares unique
indices — re-test which frame loop wins).

Run (TPU):
  JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prepare_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

REPS = 9


def measure(fn, *args):
    import numpy as np

    def force(out):
        return [np.asarray(x) for x in (out if isinstance(out, tuple) else (out,))]

    force(fn(*args))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    import jax
    import jax.numpy as jnp

    from scripts.roofline import run_pipeline  # noqa: F401 (capture machinery)
    from rtgslam_tpu.models.optimize import stable_partition_order
    from rtgslam_tpu.models.gaussian_map import (
        activated_opacity, activated_scales, alive_mask, unstable_mask)
    from rtgslam_tpu.ops.rasterize import binning as binning_mod
    from rtgslam_tpu.ops.rasterize import blend as blend_mod
    from rtgslam_tpu.ops.rasterize.project import project_geometry
    from rtgslam_tpu.ops import preprocess
    from rtgslam_tpu.utils.geometry import normalize

    specs, reals = {}, {}
    print("[prepare_probe] capturing real args (8-frame pipeline)...")
    run_pipeline(int(os.environ.get("BENCH_H", 170)),
                 int(os.environ.get("BENCH_W", 300)), 8, specs, reals)
    a, k = reals["optimize_prepare"]
    (state, colors, depths, normals, w2cs, Ks, camposes) = a
    settings = k["settings"]
    assert k["mode"] == "local", f"captured mode={k['mode']} (want local)"
    L = k["row_limit"] or state.capacity
    H, W = settings.height, settings.width

    pool = alive_mask(state)[:L]
    mask_pool = unstable_mask(state)[:L].astype(jnp.float32)
    xyz = state.xyz[:L]
    scales = activated_scales(state.scaling[:L])
    rots = normalize(state.rotation[:L])
    opa = activated_opacity(state.opacity[:L]).reshape(-1)
    cams = {"w2c": w2cs, "K": Ks, "campos": camposes}

    # --- the production per-frame body, split at stage boundaries ---------
    def proj_only(cam, depth):
        geo = project_geometry(xyz, scales, rots, pool, cam["w2c"], cam["K"],
                               W, H, settings.scale_modifier)
        return geo.mean2d, geo.depth, geo.visible

    def plus_topk(cam, depth):
        geo = project_geometry(xyz, scales, rots, pool, cam["w2c"], cam["K"],
                               W, H, settings.scale_modifier)
        keys = jnp.where(geo.visible, geo.depth, jnp.inf)
        V = min(settings.max_visible, L)
        order = jax.lax.top_k(-keys, V)[1].astype(jnp.int32)
        return order

    def plus_bins(cam, depth):
        geo = project_geometry(xyz, scales, rots, pool, cam["w2c"], cam["K"],
                               W, H, settings.scale_modifier)
        bins = binning_mod.bin_gaussians(
            geo, H, W, settings.block_capacity, settings.tile_capacity,
            min(settings.max_visible, L), tile_mask=None)
        return bins.tile_lists, bins.tile_counts, bins.order

    def full_body(cam, depth):
        geo = project_geometry(xyz, scales, rots, pool, cam["w2c"], cam["K"],
                               W, H, settings.scale_modifier)
        bins = binning_mod.bin_gaussians(
            geo, H, W, settings.block_capacity, settings.tile_capacity,
            min(settings.max_visible, L), tile_mask=None)
        order = bins.order
        zero = jnp.zeros((1,), jnp.float32)
        cols = tuple(
            jnp.concatenate([col, zero])[bins.tile_lists]
            for col in (geo.mean2d[order, 0], geo.mean2d[order, 1],
                        geo.conic[order, 0], geo.conic[order, 1],
                        geo.conic[order, 2], opa[order] * mask_pool[order]))
        T = blend_mod.blend_transmission_blocked(
            cols, bins.tile_counts, binning_mod.tile_origins(H, W),
            T_threshold=settings.T_threshold)
        T_map = binning_mod.scatter_tiles(
            T.reshape(T.shape[0], blend_mod.TILE * blend_mod.TILE, 1), H, W)
        rmask = T_map[..., 0] != 1.0
        tile = preprocess.transmission_to_tilemask(rmask, 16, 0.5)
        counts = jnp.where(
            binning_mod.tile_mask_flat(tile, H, W) > 0, bins.tile_counts, 0)
        rmask = rmask & (depth > 0)
        order_pad = jnp.concatenate(
            [order, jnp.array([state.capacity], jnp.int32)])
        return rmask, tile, order_pad[bins.tile_lists], counts

    def over_frames(body, loop):
        if loop == "map":
            return jax.jit(lambda: jax.lax.map(
                lambda cd: body(cd[0], cd[1]), (cams, depths)))
        return jax.jit(lambda: jax.vmap(body)(cams, depths))

    rows = {}
    for name, body in (("proj", proj_only), ("proj+topk", plus_topk),
                       ("proj+bins", plus_bins), ("full_body", full_body)):
        rows[f"{name}/map"] = measure(over_frames(body, "map"))
        print(f"  {name:12s} lax.map  {rows[f'{name}/map']:8.1f} ms")
    for name, body in (("proj+bins", plus_bins), ("full_body", full_body)):
        rows[f"{name}/vmap"] = measure(over_frames(body, "vmap"))
        print(f"  {name:12s} vmap     {rows[f'{name}/vmap']:8.1f} ms")

    # tail stages outside the frame loop (tile_order/n_live scalars)
    from rtgslam_tpu.models.optimize import optimize_prepare
    rows["optimize_prepare"] = measure(
        lambda: optimize_prepare(state, colors, depths, normals, w2cs, Ks,
                                 camposes, **k))
    print(f"  {'FULL prepare':12s}          {rows['optimize_prepare']:8.1f} ms")
    out = {"H": H, "W": W, "F": int(depths.shape[0]), "L": int(L),
           "reps": REPS, "ms": rows}
    with open("/tmp/prepare_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
