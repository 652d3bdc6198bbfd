#!/usr/bin/env python
"""In-loop slope attribution for ONE optimize iteration (PERF.md round 4).

opt_decompose.py measured the real per-iteration cost of the optimize loop
by varying n_iters (plain 25.0 ms, freeze_binning 14.6 ms at the 170x300
bench point).  Single-dispatch component probes can't decompose that — each
carries the ~27 ms tunnel dispatch floor.  This script instead wraps each
sub-piece in its own `lax.fori_loop`, measures at two trip counts, and
reports the SLOPE: the true marginal cost of that piece inside a compiled
loop (exactly how run_optimize executes it).

Bodies thread the carry through the piece's inputs (a + 1e-30*acc nudge)
so XLA cannot hoist the loop body.

Pieces:
  iter_fresh    grad(loss over _render_impl) + Adam      == run_optimize body
  iter_frozen   grad(loss over render_fixed_binning) + Adam
  fwd_frozen    loss forward only (frozen bins)
  projsortbin   projection + [P]-key top_k + binning (fwd)
  shade_gather  SH shade + per-tile feature gather (fwd, frozen order)
  blend_vjp     blend_tiles_fused fwd+bwd from fixed pre-gathered tiles
  adam          masked Adam over the [P, *] params alone

Writes OPT_ITER_PROBE.json.
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


def slope_ms(build, n_lo=N_LO, n_hi=N_HI, reps=REPS):
    """build(n) -> zero-arg jitted callable running n trips; returns
    (per-trip ms, lo ms, hi ms)."""
    import numpy as np

    out = {}
    for n in (n_lo, n_hi):
        fn, args = build(n)
        r = fn(*args)
        jax.tree_util.tree_map(
            lambda l: np.asarray(l) if hasattr(l, "shape") and l.size < 10
            else None, r)
        _force(r)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _force(fn(*args))
            times.append(time.perf_counter() - t0)
        out[n] = float(np.median(times) * 1e3)
    return (out[n_hi] - out[n_lo]) / (n_hi - n_lo), out[n_lo], out[n_hi]


def _force(out):
    import numpy as np
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "shape")]
    smallest = min(leaves, key=lambda l: int(np.prod(l.shape)) if l.shape else 1)
    np.asarray(smallest)


def main():
    global jax
    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import run_pipeline

    from rtgslam_tpu.models import optimize as O
    from rtgslam_tpu.models.gaussian_map import (
        activated_opacity, activated_scales, alive_mask, derived_normal,
        render_inputs, shs_from_features, unstable_mask)
    from rtgslam_tpu.models.map_ops import capture_history
    from rtgslam_tpu.ops.rasterize import binning as binning_mod
    from rtgslam_tpu.ops.rasterize import blend
    from rtgslam_tpu.ops.rasterize.api import render_fixed_binning
    from rtgslam_tpu.ops.rasterize.project import project_geometry, shade_cols
    from rtgslam_tpu.utils.geometry import normalize

    H = int(os.environ.get("BENCH_H", 170))
    W = int(os.environ.get("BENCH_W", 300))
    specs, reals = {}, {}
    print(f"[iter_probe] capturing real args at {H}x{W} on "
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

    # frozen bins from the initial params (what freeze_binning does)
    gauss0 = render_inputs(state, aux["render_alive"])
    geo0 = project_geometry(
        gauss0["xyz"], gauss0["scales"], gauss0["rotations"], gauss0["alive"],
        frame["w2c"], frame["K"], W, H, settings.scale_modifier)
    bins0 = binning_mod.bin_gaussians(
        geo0, H, W, settings.block_capacity, settings.tile_capacity,
        settings.max_visible, tile_mask=None)
    frozen = {"bin_order": bins0.order, "bin_tile_lists": bins0.tile_lists,
              "bin_tile_counts": bins0.tile_counts}
    print(f"[iter_probe] P={P} tiles={bins0.tile_lists.shape[0]} "
          f"Kt={bins0.tile_lists.shape[1]} "
          f"max_count={int(np.asarray(jnp.max(bins0.tile_counts)))}")

    results = {"H": H, "W": W, "P": int(P),
               "tiles": int(bins0.tile_lists.shape[0]),
               "Kt": int(bins0.tile_lists.shape[1]),
               "max_tile_count": int(np.asarray(jnp.max(bins0.tile_counts)))}

    def nudge(params, acc):
        eps = acc * 1e-30
        return {kk: v + eps for kk, v in params.items()}

    # --- full iteration bodies ---------------------------------------------
    def build_iter(frozen_bins):
        def mk(n):
            @partial(jax.jit, static_argnames=())
            def run(params):
                zeros = {kk: jnp.zeros_like(v) for kk, v in params.items()}
                fr = dict(frame)
                if frozen_bins:
                    fr.update(frozen)

                def body(i, carry):
                    p, m, v = carry
                    (_, rep), g = jax.value_and_grad(O._loss_fn, has_aux=True)(
                        p, aux, fr, settings, hyper)
                    return O._adam_step(p, g, m, v, i, lrs, aux["update_mask"])

                p, _, _ = jax.lax.fori_loop(0, n, body,
                                            (params, zeros, dict(zeros)))
                return p["xyz"][0]
            return run, (params0,)
        return mk

    # --- forward-only -------------------------------------------------------
    def build_fwd(n):
        @jax.jit
        def run(params):
            fr = dict(frame)
            fr.update(frozen)

            def body(i, acc):
                loss, _ = O._loss_fn(nudge(params, acc), aux, fr, settings,
                                     hyper)
                return acc + loss
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run, (params0,)

    # --- projection + sort + binning (what freeze removes) ------------------
    def build_projsortbin(n):
        @jax.jit
        def run(params):
            def body(i, acc):
                p = nudge(params, acc)
                geo = project_geometry(
                    p["xyz"], activated_scales(p["scaling"]),
                    normalize(p["rotation"]), aux["render_alive"],
                    frame["w2c"], frame["K"], W, H, settings.scale_modifier)
                bins = binning_mod.bin_gaussians(
                    geo, H, W, settings.block_capacity, settings.tile_capacity,
                    settings.max_visible, tile_mask=None)
                return acc + jnp.sum(bins.tile_counts).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run, (params0,)

    # --- shade + gather (fwd, frozen order) ----------------------------------
    def build_shade_gather(n):
        order = frozen["bin_order"]
        tl = frozen["bin_tile_lists"]

        @jax.jit
        def run(params):
            def body(i, acc):
                p = nudge(params, acc)
                geo = project_geometry(
                    p["xyz"], activated_scales(p["scaling"]),
                    normalize(p["rotation"]), aux["render_alive"],
                    frame["w2c"], frame["K"], W, H, settings.scale_modifier)
                shs = shs_from_features(p["features_dc"], p["features_rest"])
                nrm = derived_normal(p["scaling"], p["rotation"])
                r, g, b, elig = shade_cols(
                    p["xyz"][order], shs.reshape(P, -1)[order], nrm[order],
                    frame["campos"], settings.sh_degree,
                    settings.normal_threshold)
                feat = blend._pack_features((
                    geo.mean2d[order, 0], geo.mean2d[order, 1],
                    geo.conic[order, 0], geo.conic[order, 1],
                    geo.conic[order, 2], geo.depth[order], r, g, b,
                    activated_opacity(p["opacity"]).reshape(-1)[order],
                    elig.astype(jnp.float32)))
                tf = feat.gather(tl)
                return acc + tf.mean_x[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return run, (params0,)

    # --- blend fwd+bwd from fixed pre-gathered tiles --------------------------
    gauss_now = render_inputs(state, aux["render_alive"])
    rr, gg, bb, elig0 = shade_cols(
        gauss_now["xyz"][bins0.order],
        gauss_now["shs"].reshape(P, -1)[bins0.order],
        gauss_now["normal"][bins0.order], frame["campos"],
        settings.sh_degree, settings.normal_threshold)
    feat0 = blend._pack_features((
        geo0.mean2d[bins0.order, 0], geo0.mean2d[bins0.order, 1],
        geo0.conic[bins0.order, 0], geo0.conic[bins0.order, 1],
        geo0.conic[bins0.order, 2], geo0.depth[bins0.order], rr, gg, bb,
        gauss_now["opacity"].reshape(-1)[bins0.order],
        elig0.astype(jnp.float32)))
    tile_feat0 = feat0.gather(bins0.tile_lists)
    order_pad = jnp.concatenate([bins0.order, jnp.array([-1], jnp.int32)])
    tile_gidx0 = order_pad[bins0.tile_lists]
    origins = binning_mod.tile_origins(H, W)

    def build_blend_vjp(n):
        @jax.jit
        def run(tile_feat):
            def loss(tf):
                out = blend.blend_tiles_fused(
                    tf, tile_gidx0, frozen["bin_tile_counts"], origins,
                    settings.opaque_threshold, settings.T_threshold,
                    False, False)
                return jnp.sum(out.color) + jnp.sum(out.depth)

            def body(i, carry):
                acc, tf = carry
                g = jax.grad(loss)(
                    blend.FeatCols(*(c + acc * 1e-30 for c in tf)))
                return acc + g.mean_x[0, 0], tf
            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), tile_feat))
            return acc
        return run, (tile_feat0,)

    # --- Adam alone ----------------------------------------------------------
    def build_adam(n):
        g0 = {kk: jnp.full_like(v, 1e-9) for kk, v in params0.items()}

        @jax.jit
        def run(params):
            zeros = {kk: jnp.zeros_like(v) for kk, v in params.items()}

            def body(i, carry):
                p, m, v = carry
                return O._adam_step(p, g0, m, v, i, lrs, aux["update_mask"])
            p, _, _ = jax.lax.fori_loop(0, n, body, (params, zeros, dict(zeros)))
            return p["xyz"][0]
        return run, (params0,)

    pieces = [
        ("iter_fresh", build_iter(False)),
        ("iter_frozen", build_iter(True)),
        ("fwd_frozen", build_fwd),
        ("projsortbin", build_projsortbin),
        ("shade_gather", build_shade_gather),
        ("blend_vjp", build_blend_vjp),
        ("adam", build_adam),
    ]
    for name, build in pieces:
        s, lo, hi = slope_ms(build)
        print(f"[slope] {name:14s} {s:7.2f} ms/trip  "
              f"(n={N_LO}: {lo:.1f} ms, n={N_HI}: {hi:.1f} ms)")
        results[name] = {"ms_per_trip": round(s, 2),
                         "lo_ms": round(lo, 1), "hi_ms": round(hi, 1)}

    out = os.path.join(ROOT, "OPT_ITER_PROBE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
