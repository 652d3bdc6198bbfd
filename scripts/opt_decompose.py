#!/usr/bin/env python
"""Decompose the optimize-frame cost (VERDICT r3 #1).

The round-3 evidence had an apparent 10x contradiction: ROOFLINE.json's
byte model said 27 GB / optimize iteration (SOL ~34 ms/iter) while PERF.md's
measured blend slope said 3.4 ms/iter.  The resolution (this script): both
are right — the BLEND is 3.4 ms/iter, but the blend is only ~1/8 of an
iteration.  The rest is the fixed per-iteration machinery: [P]-row
projection fwd+bwd, [P]-key top_k sort, binning, per-tile feature gathers
fwd (+ scatter-add bwd), SH shade fwd+bwd, loss image math, and masked Adam
over [P, 60] f32 x 3 states.

Experiments (all on the REAL captured optimize_chain args at the bench
operating point, warm cache):

  A. n_iters slope: optimize_chain with n_iters in {10, 30, 50} — n_iters
     is a traced scalar, so all three share ONE executable.  Linear fit
     gives the true per-iteration cost and the fixed intercept (the 5 mask
     renders + history snapshot/merge + frozen-binning pass if any).
  B. freeze_binning A/B: same fit with freeze_binning=True.  Slope delta =
     per-iteration sort+bin cost; intercept delta = the one-time batched
     binning pass.
  C. component probes, each its own jit, measured by smallest-leaf fetch:
       render fwd only | render fwd + grad | fwd + grad + Adam
     Deltas isolate the backward and the optimizer traffic.

Writes OPT_DECOMPOSE.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

REPS = 5


def measure(fn, *args, reps=REPS, **kwargs):
    import numpy as np
    from roofline import _force  # noqa: F401  (same directory)

    _force(fn(*args, **kwargs))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from roofline import run_pipeline, _force

    from rtgslam_tpu.models import optimize as O

    H = int(os.environ.get("BENCH_H", 170))
    W = int(os.environ.get("BENCH_W", 300))
    specs, reals = {}, {}
    print(f"[decompose] capturing real args at {H}x{W} on "
          f"{jax.devices()[0].platform}...")
    run_pipeline(H, W, 14, specs, reals)
    a, k = reals["optimize_chain"]
    (state, colors, depths, normals, w2cs, Ks, camposes,
     frame_seq, n_iters, lrs, weights, settings) = a
    print(f"[decompose] n_iters={n_iters}, F={colors.shape[0]}, "
          f"P={state.xyz.shape[0]}, kwargs={ {kk: vv for kk, vv in k.items()} }")

    results = {"H": H, "W": W, "P": int(state.xyz.shape[0]),
               "F": int(colors.shape[0]), "kwargs": {
                   kk: (vv if isinstance(vv, (str, int, float, bool))
                        else str(vv)) for kk, vv in k.items()
                   if kk != "settings"}}

    def chain_ms(n, freeze):
        kk = dict(k)
        kk["freeze_binning"] = freeze
        args2 = (state, colors, depths, normals, w2cs, Ks, camposes,
                 frame_seq, jnp.int32(n), lrs, weights, settings)
        return measure(O.optimize_chain, *args2, **kk)

    # --- A/B: n_iters slope, plain vs frozen binning -----------------------
    for freeze in (False, True):
        label = "freeze" if freeze else "plain"
        pts = []
        for n in (10, 30, 50):
            ms = chain_ms(n, freeze)
            pts.append((n, ms))
            print(f"[slope/{label}] n_iters={n}: {ms:.1f} ms")
        ns = np.array([p[0] for p in pts], float)
        ms = np.array([p[1] for p in pts], float)
        slope, intercept = np.polyfit(ns, ms, 1)
        print(f"[slope/{label}] per-iter {slope:.2f} ms, fixed {intercept:.1f} ms")
        results[label] = {"points": pts, "ms_per_iter": round(slope, 2),
                          "fixed_ms": round(intercept, 1)}

    # --- C: component probes ------------------------------------------------
    from functools import partial
    from rtgslam_tpu.models.gaussian_map import alive_mask, unstable_mask
    from rtgslam_tpu.models.map_ops import capture_history
    from rtgslam_tpu.ops.rasterize.api import _render_impl
    from rtgslam_tpu.ops.rasterize.project import project_geometry
    from rtgslam_tpu.ops.rasterize import binning as binning_mod

    hist = jax.tree_util.tree_map(jnp.asarray, capture_history(state))
    hyper = dict(weights)
    hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                 hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])
    aux = {"render_alive": alive_mask(state), "update_mask": unstable_mask(state)}
    frame = {"color": colors[0], "depth": depths[0], "normal": normals[0],
             "w2c": w2cs[0], "K": Ks[0], "campos": camposes[0],
             "render_mask": jnp.ones((H, W), bool),
             "tile_mask": jnp.ones(((H + 15) // 16, (W + 15) // 16), jnp.int32)}
    params = state.params()

    @partial(jax.jit, static_argnames=("settings",))
    def f_fwd(params, aux, frame, hyper, settings):
        return O._loss_fn(params, aux, frame, settings, hyper)[0]

    @partial(jax.jit, static_argnames=("settings",))
    def f_grad(params, aux, frame, hyper, settings):
        (_, rep), g = jax.value_and_grad(O._loss_fn, has_aux=True)(
            params, aux, frame, settings, hyper)
        return g

    @partial(jax.jit, static_argnames=("settings",))
    def f_iter(params, aux, frame, hyper, lrs, settings):
        (_, rep), g = jax.value_and_grad(O._loss_fn, has_aux=True)(
            params, aux, frame, settings, hyper)
        zeros = {kk: jnp.zeros_like(v) for kk, v in params.items()}
        return O._adam_step(params, g, zeros, dict(zeros), jnp.int32(0),
                            lrs, aux["update_mask"])[0]

    @partial(jax.jit, static_argnames=("settings",))
    def f_projsort(params, aux, settings):
        from rtgslam_tpu.models.gaussian_map import (
            activated_opacity, activated_scales)
        from rtgslam_tpu.utils.geometry import normalize
        geo = project_geometry(
            params["xyz"], activated_scales(params["scaling"]),
            normalize(params["rotation"]), aux["render_alive"],
            frame["w2c"], frame["K"], W, H, settings.scale_modifier)
        bins = binning_mod.bin_gaussians(
            geo, H, W, settings.block_capacity, settings.tile_capacity,
            settings.max_visible, tile_mask=None)
        return bins.order, bins.tile_counts

    @partial(jax.jit, static_argnames=("settings",))
    def f_infer(params, aux, frame, settings):
        from rtgslam_tpu.models.gaussian_map import (
            activated_opacity, activated_scales, derived_normal,
            shs_from_features)
        from rtgslam_tpu.utils.geometry import normalize
        gauss = {
            "xyz": params["xyz"],
            "scales": activated_scales(params["scaling"]),
            "rotations": normalize(params["rotation"]),
            "opacity": activated_opacity(params["opacity"]),
            "shs": shs_from_features(params["features_dc"],
                                     params["features_rest"]),
            "normal": derived_normal(params["scaling"], params["rotation"]),
            "alive": aux["render_alive"],
        }
        return _render_impl.__wrapped__(
            gauss, frame["w2c"], frame["K"], frame["campos"],
            frame["tile_mask"], settings, False, True)

    comp = {}
    comp["proj_sort_bin"] = measure(f_projsort, params, aux, settings=settings)
    comp["render_infer"] = measure(f_infer, params, aux, frame,
                                   settings=settings)
    comp["loss_fwd"] = measure(f_fwd, params, aux, frame, hyper,
                               settings=settings)
    comp["loss_fwd_bwd"] = measure(f_grad, params, aux, frame, hyper,
                                   settings=settings)
    comp["full_iter_adam"] = measure(f_iter, params, aux, frame, hyper, lrs,
                                     settings=settings)
    for kk, vv in comp.items():
        print(f"[component] {kk}: {vv:.1f} ms")
    results["components_ms"] = {kk: round(vv, 1) for kk, vv in comp.items()}

    # dispatch floor for reference
    floor = measure(jax.jit(lambda x: x + 1.0), jnp.zeros((8,)))
    results["dispatch_floor_ms"] = round(floor, 1)
    print(f"[floor] {floor:.1f} ms")

    out = os.path.join(ROOT, "OPT_DECOMPOSE.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
