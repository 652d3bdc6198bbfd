#!/usr/bin/env python
"""Payoff probe for the round-4 optimize-loop restructure (PERF.md).

OPT_ITER_PROBE.json decomposed the frozen-binning iteration (13.6 ms at the
bench point).  Structural observations at that operating point:

  * max per-tile count is 94 but tile lists carry Kt=512 entries — the
    per-tile gather and the backward's per-tile gradient block move ~4-5x
    the live data;
  * only ~2.8k gaussians are alive out of P=32768 capacity, yet projection,
    SH shade, the gather source rows and Adam run over ALL P rows (or the
    [V]=P sorted order) every iteration.

This script SIMULATES the restructured iteration — params compacted to the
valid sorted prefix (static bucket V'), tile lists cropped to a Kt' bucket —
and measures its in-loop slope next to the current frozen iteration, before
committing to the production rewrite.  Writes OPT_COMPACT_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

N_LO, N_HI = 6, 26
REPS = 5


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import run_pipeline
    from opt_iter_probe import slope_ms, _force  # noqa: F401

    import opt_iter_probe
    opt_iter_probe.jax = jax

    from rtgslam_tpu.models import optimize as O
    from rtgslam_tpu.models.gaussian_map import (
        activated_opacity, activated_scales, alive_mask, derived_normal,
        render_inputs, shs_from_features, unstable_mask)
    from rtgslam_tpu.models.map_ops import capture_history
    from rtgslam_tpu.ops.rasterize import binning as binning_mod
    from rtgslam_tpu.ops.rasterize import blend
    from rtgslam_tpu.ops.rasterize.project import project_geometry, shade_cols
    from rtgslam_tpu.utils.geometry import normalize

    H = int(os.environ.get("BENCH_H", 170))
    W = int(os.environ.get("BENCH_W", 300))
    specs, reals = {}, {}
    print(f"[compact_probe] capturing real args at {H}x{W} on "
          f"{jax.devices()[0].platform}...")
    run_pipeline(H, W, 14, specs, reals)
    a, k = reals["optimize_chain"]
    (state, colors, depths, normals, w2cs, Ks, camposes,
     frame_seq, n_iters, lrs, weights, settings) = a

    P = state.xyz.shape[0]
    hist = capture_history(state)
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                 hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])
    aux = {"render_alive": alive_mask(state), "update_mask": unstable_mask(state)}
    frame = {"color": colors[0], "depth": depths[0], "normal": normals[0],
             "w2c": w2cs[0], "K": Ks[0], "campos": camposes[0],
             "render_mask": jnp.ones((H, W), bool),
             "tile_mask": jnp.ones(((H + 15) // 16, (W + 15) // 16), jnp.int32)}
    params0 = state.params()

    gauss0 = render_inputs(state, aux["render_alive"])
    geo0 = project_geometry(
        gauss0["xyz"], gauss0["scales"], gauss0["rotations"], gauss0["alive"],
        frame["w2c"], frame["K"], W, H, settings.scale_modifier)
    bins0 = binning_mod.bin_gaussians(
        geo0, H, W, settings.block_capacity, settings.tile_capacity,
        settings.max_visible, tile_mask=None)
    n_valid = int(np.asarray(jnp.sum(jnp.where(geo0.visible, 1, 0))))
    max_count = int(np.asarray(jnp.max(bins0.tile_counts)))

    def bucket(n):
        b = 64
        while b < n:
            b *= 2
        return b

    Vc = bucket(n_valid)
    Ktc = min(bucket(max_count), bins0.tile_lists.shape[1])
    T = bins0.tile_lists.shape[0]
    print(f"[compact_probe] P={P} n_valid={n_valid} -> V'={Vc}; "
          f"max_count={max_count} -> Kt'={Ktc} (from Kt={bins0.tile_lists.shape[1]})")

    # ---- compacted inputs (what the production chain would build once) ----
    order_c = bins0.order[:Vc]                       # sorted->original, prefix
    params_c = {kk: v[order_c] for kk, v in params0.items()}
    hist_c = {"hist_opacity": hyper["hist_opacity"][order_c],
              "hist_scaling": hyper["hist_scaling"][order_c],
              "hist_xyz": hyper["hist_xyz"][order_c],
              "hist_rotation_raw": hyper["hist_rotation_raw"][order_c]}
    hyper_c = dict(weights)
    hyper_c.update(hist_c)
    # sorted-space lists crop; entries >= Vc (incl. sentinel) -> sentinel Vc
    tl = bins0.tile_lists[:, :Ktc]
    tl = jnp.where(tl > Vc, Vc, tl).astype(jnp.int32)
    counts_c = jnp.minimum(bins0.tile_counts, Ktc)
    update_c = aux["update_mask"][order_c] & (jnp.arange(Vc) < n_valid)
    origins = binning_mod.tile_origins(H, W)
    valid_c = jnp.arange(Vc) < n_valid

    def compact_loss(p_c, fr):
        """Loss over the compacted working set: projection/shade over [Vc],
        pre-cropped tile lists, same image losses + attach anchor."""
        geo = project_geometry(
            p_c["xyz"], activated_scales(p_c["scaling"]),
            normalize(p_c["rotation"]), valid_c,
            fr["w2c"], fr["K"], W, H, settings.scale_modifier)
        shs = shs_from_features(p_c["features_dc"], p_c["features_rest"])
        nrm = derived_normal(p_c["scaling"], p_c["rotation"])
        r, g, b, elig = shade_cols(
            p_c["xyz"], shs.reshape(Vc, -1), nrm, fr["campos"],
            settings.sh_degree, settings.normal_threshold)
        feat = blend._pack_features((
            geo.mean2d[:, 0], geo.mean2d[:, 1],
            geo.conic[:, 0], geo.conic[:, 1], geo.conic[:, 2],
            geo.depth, r, g, b,
            activated_opacity(p_c["opacity"]).reshape(-1),
            elig.astype(jnp.float32)))
        order_pad = jnp.concatenate(
            [order_c, jnp.array([-1], jnp.int32)])
        tiles = blend.blend_tiles_fused(
            feat.gather(tl), order_pad[tl], counts_c, origins,
            settings.opaque_threshold, settings.T_threshold, False, False)
        from rtgslam_tpu.ops.rasterize.api import _assemble_outputs
        out = _assemble_outputs(tiles, nrm, jnp.int32(0), H, W)

        from rtgslam_tpu.models.losses import masked_mean
        rmask = fr["render_mask"]
        color_loss = masked_mean(
            jnp.sum(jnp.abs(out["render"] - fr["color"]), axis=-1) / 3.0,
            rmask)
        depth = out["depth"][..., 0]
        derr = depth - fr["depth"]
        dmask = (out["depth_index_map"] >= 0) & (fr["depth"] > 0) \
            & (derr < hyper_c["add_depth_thres"]) & rmask
        depth_loss = masked_mean(jnp.abs(derr), dmask)
        gt_n = fr["normal"]
        cos = jnp.sum(out["normal"] * gt_n, axis=-1) / (
            jnp.linalg.norm(out["normal"], axis=-1)
            * jnp.linalg.norm(gt_n, axis=-1) + 1e-8)
        nmask = rmask & (out["depth_index_map"] >= 0) \
            & jnp.any(gt_n != 0, axis=-1)
        normal_loss = masked_mean(1.0 - cos, nmask)
        attach_rows = (activated_opacity(
            hyper_c["hist_opacity"])[:, 0] < 0.9) & update_c

        def row_l2(x, y):
            per_row = jnp.mean((x - y).reshape(x.shape[0], -1) ** 2, axis=-1)
            return masked_mean(per_row, attach_rows)

        attach = 1000.0 * (
            row_l2(p_c["scaling"], hyper_c["hist_scaling"])
            + row_l2(p_c["xyz"], hyper_c["hist_xyz"])
            + row_l2(p_c["rotation"], hyper_c["hist_rotation_raw"]))
        total = (hyper_c["color_weight"] * color_loss
                 + hyper_c["depth_weight"] * depth_loss
                 + hyper_c["normal_weight"] * normal_loss)
        return total + attach

    def build_compact(n):
        @jax.jit
        def run(p_c):
            zeros = {kk: jnp.zeros_like(v) for kk, v in p_c.items()}

            def body(i, carry):
                p, m, v = carry
                g = jax.grad(compact_loss)(p, frame)
                return O._adam_step(p, g, m, v, i, lrs, update_c)
            p, _, _ = jax.lax.fori_loop(0, n, body, (p_c, zeros, dict(zeros)))
            return p["xyz"][0]
        return run, (params_c,)

    # reference: current frozen iteration (from opt_iter_probe, re-measured
    # here for an apples-to-apples session)
    frozen = {"bin_order": bins0.order, "bin_tile_lists": bins0.tile_lists,
              "bin_tile_counts": bins0.tile_counts}

    def build_frozen(n):
        @jax.jit
        def run(params):
            zeros = {kk: jnp.zeros_like(v) for kk, v in params.items()}
            fr = dict(frame)
            fr.update(frozen)

            def body(i, carry):
                p, m, v = carry
                (_, rep), g = jax.value_and_grad(O._loss_fn, has_aux=True)(
                    p, aux, fr, settings, hyper)
                return O._adam_step(p, g, m, v, i, lrs, aux["update_mask"])
            p, _, _ = jax.lax.fori_loop(0, n, body, (params, zeros, dict(zeros)))
            return p["xyz"][0]
        return run, (params0,)

    # Kt-crop only (no row compaction): isolates the two effects
    tl_kt = bins0.tile_lists[:, :Ktc]
    counts_kt = jnp.minimum(bins0.tile_counts, Ktc)
    frozen_kt = {"bin_order": bins0.order, "bin_tile_lists": tl_kt,
                 "bin_tile_counts": counts_kt}

    def build_frozen_ktcrop(n):
        @jax.jit
        def run(params):
            zeros = {kk: jnp.zeros_like(v) for kk, v in params.items()}
            fr = dict(frame)
            fr.update(frozen_kt)

            def body(i, carry):
                p, m, v = carry
                (_, rep), g = jax.value_and_grad(O._loss_fn, has_aux=True)(
                    p, aux, fr, settings, hyper)
                return O._adam_step(p, g, m, v, i, lrs, aux["update_mask"])
            p, _, _ = jax.lax.fori_loop(0, n, body, (params, zeros, dict(zeros)))
            return p["xyz"][0]
        return run, (params0,)

    results = {"H": H, "W": W, "P": int(P), "n_valid": n_valid,
               "V_compact": Vc, "Kt_compact": Ktc, "tiles": int(T)}
    for name, build in (("iter_frozen", build_frozen),
                        ("iter_frozen_ktcrop", build_frozen_ktcrop),
                        ("iter_compact", build_compact)):
        s, lo, hi = slope_ms(build)
        print(f"[slope] {name:20s} {s:7.2f} ms/trip  "
              f"(n={N_LO}: {lo:.1f}, n={N_HI}: {hi:.1f})")
        results[name] = {"ms_per_trip": round(s, 2),
                         "lo_ms": round(lo, 1), "hi_ms": round(hi, 1)}

    out = os.path.join(ROOT, "OPT_COMPACT_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
