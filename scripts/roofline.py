#!/usr/bin/env python
"""Roofline / MFU evidence for the three hot executables (PERF.md).

The point (VERDICT r2 #1/#6): replace throttle arithmetic with numbers.
For each hot executable — `fused_icp_track_step` (tracking),
`map_ops.frame_chain` (per-frame mapping), `optimize.optimize_chain`
(the 50-iteration local optimization) — this script produces:

  * FLOPs and HBM bytes from XLA's `compiled.cost_analysis()`, CORRECTED
    for loop trip counts (XLA costs every while/scan body exactly once —
    verified in-environment; the corrections and their multipliers are
    printed so the accounting is auditable);
  * measured wall time per dispatch on the available device (median over
    reps, completion forced by fetching the smallest output — CLAUDE.md:
    `block_until_ready` is a no-op on the axon tunnel);
  * arithmetic intensity, the v5e roofline verdict (VPU-compute-bound vs
    HBM-bound), speed-of-light stage time on v5e, and the implied MFU of
    the measured run;
  * with --fullres: the same executables lowered AND compiled for the TPU
    target at Replica-native 680x1200 (arg shapes captured by a CPU-backend
    subprocess that aborts before executing the heavy chains), plus the HBM
    footprint from `compiled.memory_analysis()` — the full-resolution
    compile proof.

Peaks (TPU v5e, single chip):
  MXU  197 TFLOP/s bf16 (4x 128x128 MACs @ ~1.5 GHz).
  VPU  ~12.3 TFLOP/s f32 ceiling (8x128 lanes x 4 ALUs x FMA @ 1.5 GHz);
       non-FMA elementwise runs at half that.  The blend's alpha math is
       elementwise f32, so the VPU ceiling — not the MXU headline — is the
       relevant compute roof for the render stages.
  HBM  819 GB/s.

Outputs: ROOFLINE.json (+ markdown table on stdout).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

MXU_PEAK_BF16 = 197e12
VPU_PEAK_F32 = 12.3e12          # FMA ceiling; see module docstring
HBM_BW = 819e9

FULLRES = (680, 1200)           # Replica native (BASELINE.md)
SPEC_PICKLE = "/tmp/roofline_fullres_specs.pkl"


# ---------------------------------------------------------------------------
# capture machinery
# ---------------------------------------------------------------------------

class _CaptureAbort(Exception):
    pass


def _spec_of(tree):
    import jax
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if isinstance(x, (jax.Array, np.ndarray)) else x, tree)


def _copy_arrays(tree):
    """Deep-copy device arrays so captured args survive donation."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.array(x) if isinstance(x, jax.Array) else x, tree)


def install_capture(specs, reals=None, abort_keys=()):
    """Wrap the three hot executables with arg capture; returns the jitted
    ORIGINALS (the wrappers shadow the module attributes)."""
    import rtgslam_tpu.models.map_ops as map_ops
    import rtgslam_tpu.models.optimize as optmod
    import rtgslam_tpu.slam.tracker as trmod

    originals = {}

    def wrap(mod, name, key):
        orig = getattr(mod, name)
        originals[key] = orig

        def wrapped(*a, **k):
            specs[key] = (_spec_of(a), _spec_of(k))
            if reals is not None:
                reals[key] = (_copy_arrays(a), dict(k))
            if key in abort_keys:
                raise _CaptureAbort(key)
            return orig(*a, **k)

        setattr(mod, name, wrapped)

    wrap(map_ops, "frame_chain_donated", "frame_chain")
    wrap(optmod, "optimize_chain_donated", "optimize_chain")
    # compact two-stage path (the production default, optimize_compact):
    # prepare executes for real (the mapper needs its occupancy scalars to
    # pick the execute buckets); execute's static bucket kwargs ride the
    # captured kwargs dict
    wrap(optmod, "optimize_prepare", "optimize_prepare")
    wrap(optmod, "optimize_execute_donated", "optimize_execute")
    wrap(trmod, "fused_icp_track_step", "icp_track")
    return originals


def run_pipeline(H, W, n_frames, specs, reals=None, abort_keys=()):
    """Run the bench pipeline with capture installed.  With abort_keys the
    captured calls raise before executing (shape capture without compute)."""
    from bench import make_args
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Mapper, Tracker

    originals = install_capture(specs, reals, abort_keys)
    args, opt = make_args(H, W, env_overrides=False)
    cams = make_cameras(n_frames=n_frames, H=H, W=W)
    tracker, mapper = Tracker(args), Mapper(args)
    for i, cam in enumerate(cams):
        try:
            fm = tracker.map_preprocess(cam, i)
            tracker.tracking(cam, fm)
            mapper.mapping(cam, fm, i, opt)
            mapper.get_render_output(cam)
            tracker.update_last_status(
                cam, mapper.model_map["render_depth"],
                mapper.frame_map["depth_map"],
                mapper.model_map["render_normal"],
                mapper.frame_map["normal_map_w"])
        except _CaptureAbort:
            pass
        mapper.time += 1
    return args, opt, tracker, mapper, originals


# ---------------------------------------------------------------------------
# cost probes (single-trip bodies of the multi-trip loops)
# ---------------------------------------------------------------------------

def _cost(fn, *args, **kwargs):
    """lower -> compile -> (flops, bytes accessed, memory_analysis).
    `fn` must already be jitted (has .lower)."""
    c = fn.lower(*args, **kwargs).compile()
    ca = c.cost_analysis()
    ma = c.memory_analysis()
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes": float(ca.get("bytes accessed", 0.0)),
        "hbm_args_mb": ma.argument_size_in_bytes / 1e6,
        "hbm_out_mb": ma.output_size_in_bytes / 1e6,
        "hbm_temp_mb": ma.temp_size_in_bytes / 1e6,
    }


def probe_render(state_spec, w2c, K, campos, settings):
    """One full inference render (the unit of frame_chain's 3 renders and
    optimize_chain's per-frame mask renders)."""
    import jax
    from functools import partial

    from rtgslam_tpu.models.gaussian_map import alive_mask, render_inputs
    from rtgslam_tpu.ops.rasterize.api import _render_impl

    @partial(jax.jit, static_argnames=("settings",))
    def f(state, w2c, K, campos, settings):
        return _render_impl.__wrapped__(
            render_inputs(state, alive_mask(state)), w2c, K, campos, None,
            settings, False, False)

    return _cost(f, state_spec, w2c, K, campos, settings=settings)


def probe_opt_iter(state_spec, frame_specs, lrs, weights, settings):
    """One optimize iteration: differentiable render fwd+bwd + masked Adam —
    the body `run_optimize` executes n_iters times."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rtgslam_tpu.models import optimize as O
    from rtgslam_tpu.models.gaussian_map import alive_mask, unstable_mask
    from rtgslam_tpu.models.map_ops import capture_history

    @partial(jax.jit, static_argnames=("settings",))
    def f(state, color, depth, normal, w2c, K, campos, lrs, weights, settings):
        H, W = settings.height, settings.width
        params = state.params()
        hist = capture_history(state)
        hyper = dict(weights)
        hyper.update(hist_opacity=hist["opacity"], hist_scaling=hist["scaling"],
                     hist_xyz=hist["xyz"], hist_rotation_raw=hist["rotation_raw"])
        aux = {"render_alive": alive_mask(state),
               "update_mask": unstable_mask(state)}
        frame = {"color": color, "depth": depth, "normal": normal,
                 "w2c": w2c, "K": K, "campos": campos,
                 "render_mask": jnp.ones((H, W), bool),
                 "tile_mask": jnp.ones(((H + 15) // 16, (W + 15) // 16),
                                       jnp.int32)}
        (_, report), grads = jax.value_and_grad(O._loss_fn, has_aux=True)(
            params, aux, frame, settings, hyper)
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        new_params, m, v = O._adam_step(
            params, grads, zeros, dict(zeros), jnp.int32(0), lrs,
            aux["update_mask"])
        return new_params, report

    color, depth, normal, w2c, K, campos = frame_specs
    return _cost(f, state_spec, color, depth, normal, w2c, K, campos,
                 lrs, weights, settings=settings)


def probe_opt_iter_compact(execute_args, execute_kwargs):
    """One POOL-COMPACT optimize iteration (the body optimize_execute's
    fori_loop runs n_iters times): render_compact fwd+bwd + compact masked
    Adam at the captured (Ac, Ktc) buckets."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rtgslam_tpu.models import optimize as O

    (state, colors, depths, normals, w2cs, Ks, camposes,
     rmasks, lists_orig, counts, pool_rows, n_pool, tile_rows,
     seq, n_iters, lrs, weights) = execute_args
    settings = execute_kwargs["settings"]
    Ac, Ktc = execute_kwargs["Ac"], execute_kwargs["Ktc"]
    # tile-compact axis: the iteration renders only the live-tile prefix
    T = execute_kwargs.get("Tc") or tile_rows.shape[-1]
    T_full = lists_orig.shape[1]
    H, W = settings.height, settings.width
    sd = jax.ShapeDtypeStruct
    params_c = {k: sd((Ac,) + v.shape[1:], v.dtype)
                for k, v in state.params().items()}

    @partial(jax.jit, static_argnames=("settings",))
    def f(params_c, hist_c, color, depth, normal, w2c, K, campos, rmask,
          lists_c, counts_c, trows, torig, lrs, weights, settings):
        hyper = dict(weights)
        hyper.update(hist_c)
        aux = {"update_mask": jnp.ones((Ac,), bool),
               "row_valid": jnp.ones((Ac,), bool)}
        frame = {"color": color, "depth": depth, "normal": normal,
                 "w2c": w2c, "K": K, "campos": campos,
                 "render_mask": rmask,
                 "tile_lists_c": lists_c, "tile_counts_c": counts_c,
                 "tile_rows": trows, "tile_origins": torig,
                 "n_tiles_full": T_full}
        (_, report), grads = jax.value_and_grad(
            O._loss_fn_compact, has_aux=True)(
            params_c, aux, frame, settings, hyper)
        zeros = {k: jnp.zeros_like(v) for k, v in params_c.items()}
        new_params, m, v = O._adam_step(
            params_c, grads, zeros, dict(zeros), jnp.int32(0), lrs,
            aux["update_mask"])
        return new_params, report

    hist_c = {"hist_opacity": params_c["opacity"],
              "hist_scaling": params_c["scaling"],
              "hist_xyz": params_c["xyz"],
              "hist_rotation_raw": params_c["rotation"]}
    return _cost(
        f, params_c, hist_c,
        sd((H, W, 3), jnp.float32), sd((H, W), jnp.float32),
        sd((H, W, 3), jnp.float32), sd((4, 4), jnp.float32),
        sd((3, 3), jnp.float32), sd((3,), jnp.float32),
        sd((H, W), jnp.bool_),
        sd((T, Ktc), jnp.int32), sd((T,), jnp.int32),
        sd((T,), jnp.int32), sd((T, 2), jnp.float32),
        lrs, weights, settings=settings)


def probe_icp_iter(level_shape, association, damping,
                   distance_threshold, normal_threshold):
    """One Gauss-Newton iteration at one pyramid level — the body each
    level's fori_loop executes `iters[level]` times."""
    import jax
    import jax.numpy as jnp

    from rtgslam_tpu.ops.icp import gn_iteration, pack_target

    h, w = level_shape

    def f(v0, v1, n0, n1, pose, K):
        with jax.default_matmul_precision("highest"):
            fv, fn = v0.reshape(-1, 3), n0.reshape(-1, 3)
            src = (fv[:, 0], fv[:, 1], fv[:, 2],
                   fn[:, 0], fn[:, 1], fn[:, 2])
            return gn_iteration(
                pose, src, pack_target(v1, n1), h, w, K, damping,
                distance_threshold, normal_threshold, association)

    s3 = jax.ShapeDtypeStruct((h, w, 3), jnp.float32)
    p = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    k = jax.ShapeDtypeStruct((3, 3), jnp.float32)
    return _cost(jax.jit(f), s3, s3, s3, s3, p, k)


# ---------------------------------------------------------------------------
# stage accounting: aggregate cost + trip-count corrections
# ---------------------------------------------------------------------------

def stage_costs(specs, icp_fn, memory_length, n_iters, originals=None):
    """Corrected (flops, bytes) per stage + the audit trail of corrections.

    XLA cost analysis counts each while/scan body ONCE (verified: scan of a
    matmul body reports identical flops at length 1/10/20).  Corrections:

      icp_track      agg + sum_level (iters_l - 1) x GN-iteration(level)
                     [agg already contains one iteration per level]
      frame_chain    agg as-is.  Its loops: 3 blend while-loops (measured
                     per-tile occupancy <= 105 < 128 => 1 active chunk, the
                     single-trip cost IS the real cost) and the KNN ref scan
                     (undercounted; bounded by 2*Q*R*3 flops ~ 1e8 at bench
                     shapes — two orders below the renders; noted, not
                     corrected).
      optimize_chain memory_length x inference render   [mask lax.map body]
                   + n_iters x (render fwd+bwd + Adam)  [fori body]
                   + history merge (elementwise over capacity, ~1e7; noted).
    """
    import jax

    from rtgslam_tpu.models import map_ops, optimize

    out = {}

    # --- tracking ---------------------------------------------------------
    a, k = specs["icp_track"]
    agg = _cost(icp_fn, *a, **k)
    iters = list(k["iters"])
    level_iters = []
    depth_spec = a[0]
    H, W = depth_spec.shape[:2]
    levels = k["levels"]
    per_level = []
    for lvl in range(levels):
        sc = 1 << (levels - 1 - lvl)
        pi = probe_icp_iter((H // sc, W // sc), k["association"],
                            k["damping"], k["distance_threshold"],
                            k["normal_threshold"])
        per_level.append(pi)
        level_iters.append(iters[lvl])
    flops = agg["flops"] + sum((n - 1) * p["flops"]
                               for n, p in zip(level_iters, per_level))
    bytes_ = agg["bytes"] + sum((n - 1) * p["bytes"]
                                for n, p in zip(level_iters, per_level))
    out["icp_track"] = {
        "flops": flops, "bytes": bytes_, "agg": agg,
        "correction": f"+{sum(n - 1 for n in level_iters)} GN iters "
                      f"(levels x {level_iters})",
        "mem": agg,
    }

    # --- frame_chain ------------------------------------------------------
    a, k = specs["frame_chain"]
    agg = _cost(map_ops.frame_chain, *a, **k)
    out["frame_chain"] = {
        "flops": agg["flops"], "bytes": agg["bytes"], "agg": agg,
        "correction": "none (blend while-loops single-trip at measured "
                      "occupancy; KNN scan undercount ~1e8 flops ignored)",
        "mem": agg,
    }

    # --- optimize: compact two-stage path (production default) ------------
    if "optimize_execute" in specs:
        # install_capture shadows the optimize_prepare module attr itself —
        # cost the jitted original
        prepare_fn = (originals or {}).get(
            "optimize_prepare", optimize.optimize_prepare)
        a, k = specs["optimize_prepare"]
        agg_p = _cost(prepare_fn, *a, **k)
        out["optimize_prepare"] = {
            "flops": agg_p["flops"], "bytes": agg_p["bytes"], "agg": agg_p,
            "correction": "none (vmapped mask renders + binning, "
                          "single-trip while bodies at measured occupancy)",
            "mem": agg_p,
        }
        a, k = specs["optimize_execute"]
        it = probe_opt_iter_compact(a, k)
        agg_e = _cost(optimize.optimize_execute, *a, **k)
        flops = agg_e["flops"] + (n_iters - 1) * it["flops"]
        bytes_ = agg_e["bytes"] + (n_iters - 1) * it["bytes"]
        out["optimize_execute"] = {
            "flops": flops, "bytes": bytes_, "agg": agg_e,
            "iter_probe": it,
            "correction": f"+{n_iters - 1} x compact fwd/bwd iter at "
                          f"Ac={k['Ac']} Ktc={k['Ktc']} (agg counts the "
                          "fori body once; history merge ignored)",
            "mem": agg_e,
        }
        return out

    # --- optimize_chain (plain / freeze_binning path) ---------------------
    a, k = specs["optimize_chain"]
    (state, colors, depths, normals, w2cs, Ks, camposes,
     seq, n_it, lrs, weights, settings) = a
    frame_specs = tuple(jax.ShapeDtypeStruct(s.shape[1:], s.dtype)
                        for s in (colors, depths, normals, w2cs, Ks, camposes))
    render = probe_render(state, *frame_specs[3:], settings)
    it = probe_opt_iter(state, frame_specs, lrs, weights, settings)
    agg = _cost(optimize.optimize_chain, *a, **k)
    flops = memory_length * render["flops"] + n_iters * it["flops"]
    bytes_ = memory_length * render["bytes"] + n_iters * it["bytes"]
    out["optimize_chain"] = {
        "flops": flops, "bytes": bytes_, "agg": agg,
        "render_probe": render, "iter_probe": it,
        "correction": f"{memory_length} x mask render + {n_iters} x fwd/bwd "
                      "iter (agg counts each body once; history merge ~1e7 "
                      "flops ignored)",
        "mem": agg,
    }
    return out


# ---------------------------------------------------------------------------
# measurement
# ---------------------------------------------------------------------------

def _force(out):
    """Fetch the smallest leaf — completion of one output implies the whole
    executable retired (single fused kernel program)."""
    import numpy as np
    import jax

    leaves = [l for l in jax.tree_util.tree_leaves(out)
              if hasattr(l, "shape")]
    smallest = min(leaves, key=lambda l: int(np.prod(l.shape)) if l.shape else 1)
    np.asarray(smallest)


def measure(fn, args, kwargs, reps):
    import numpy as np

    _force(fn(*args, **kwargs))          # warm (compile)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3), [round(t * 1e3, 1) for t in times]


def dispatch_floor(reps=15):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    return measure(f, (x,), {}, reps)[0]


# ---------------------------------------------------------------------------
# analysis
# ---------------------------------------------------------------------------

def analyze(name, flops, bytes_, measured_ms=None):
    ai = flops / max(bytes_, 1.0)
    t_vpu = flops / VPU_PEAK_F32
    t_bw = bytes_ / HBM_BW
    sol_s = max(t_vpu, t_bw)
    bound = "VPU-compute" if t_vpu >= t_bw else "HBM-bandwidth"
    row = {
        "stage": name,
        "gflops": round(flops / 1e9, 3),
        "mbytes": round(bytes_ / 1e6, 2),
        "arith_intensity": round(ai, 2),
        "bound": bound,
        "sol_ms_v5e": round(sol_s * 1e3, 3),
    }
    if measured_ms is not None:
        row["measured_ms"] = round(measured_ms, 1)
        row["mfu_vpu_pct"] = round(100 * flops / (measured_ms / 1e3)
                                   / VPU_PEAK_F32, 3)
        row["hbm_util_pct"] = round(100 * bytes_ / (measured_ms / 1e3)
                                    / HBM_BW, 3)
        row["throttle_vs_sol"] = round((measured_ms / 1e3) / sol_s, 1)
    return row


def print_table(rows, title):
    cols = ["stage", "gflops", "mbytes", "arith_intensity", "bound",
            "sol_ms_v5e", "measured_ms", "mfu_vpu_pct", "hbm_util_pct",
            "throttle_vs_sol"]
    cols = [c for c in cols if any(c in r for r in rows)]
    print(f"\n## {title}\n")
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |")


# ---------------------------------------------------------------------------
# full-resolution spec capture (CPU subprocess) + TPU-target compile proof
# ---------------------------------------------------------------------------

def capture_fullres_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"     # axon plugin ignores JAX_PLATFORMS
    env["PYTHONPATH"] = ROOT + ":" + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.abspath(__file__), "--capture-fullres"]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                          timeout=3600)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-3000:] + "\n")
        raise RuntimeError("fullres capture subprocess failed")
    return SPEC_PICKLE


def capture_fullres_main():
    """Runs under the CPU backend: capture 680x1200 arg specs.  Frame 0 is
    an optimize frame (spawn executes — first-frame spawn has no renders —
    then optimize_chain is captured and aborted); frame 1 runs ICP for real
    and captures+aborts frame_chain.  Nothing render-sized ever executes."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    specs = {}
    H, W = FULLRES
    # the compact path's prepare stage EXECUTES (the mapper needs its
    # occupancy scalars to pick the execute buckets); everything heavier
    # aborts after spec capture
    run_pipeline(H, W, 2, specs,
                 abort_keys=("optimize_chain", "optimize_execute",
                             "frame_chain"))
    missing = {"icp_track", "frame_chain"} - set(specs)
    if not ({"optimize_chain", "optimize_execute"} & set(specs)):
        missing.add("optimize_chain|optimize_execute")
    if missing:
        raise RuntimeError(f"fullres capture missed {missing}")

    # realism patches: the capture runs 2 frames, a real Replica run has a
    # populated map — bump the KNN scan bound (static ref_limit, last-but-one
    # positional arg) and force the stable render on (has_stable)
    a, k = specs["frame_chain"]
    a = list(a)
    a[-2] = 131072              # ref_limit: measured-occupancy class bucket
    a[-3] = True                # has_stable
    specs["frame_chain"] = (tuple(a), k)
    if "optimize_execute" in specs:
        # two-frame capture yields first-frames buckets; a steady-state
        # Replica map optimizes a far larger live set — compile at the
        # occupancy-model class (~131k live of the 524k-slot map,
        # dense-tile class 512)
        a, k = specs["optimize_execute"]
        k = dict(k)
        import jax as _jax
        a = list(a)
        Ac = 131072
        a[10] = _jax.ShapeDtypeStruct((Ac,), a[10].dtype)  # pool_rows [Ac]
        k["Ac"] = Ac
        k["Ktc"] = min(512, a[8].shape[-1])      # lists_orig [F, T, Kt]
        # live-tile class at full res: half the grid (steady-state local
        # masks measured 15-55% live at bench scale)
        T_full = a[9].shape[-1]                  # counts [F, T]
        Tc = max(32, T_full // 2)
        a[12] = _jax.ShapeDtypeStruct((a[12].shape[0], Tc), a[12].dtype)
        k["Tc"] = Tc
        specs["optimize_execute"] = (tuple(a), k)
    with open(SPEC_PICKLE, "wb") as f:
        pickle.dump(specs, f)
    print(f"[capture] wrote {SPEC_PICKLE}")


def fullres_compile_proof(specs, icp_fn, originals=None):
    """Lower + compile the three executables for the TPU target at 680x1200;
    returns cost/memory rows (compile is host-side — no device execution)."""
    rows, mem = [], {}
    from bench import make_args

    args, _ = make_args(*FULLRES, env_overrides=False)
    costs = stage_costs(specs, icp_fn, memory_length=args.memory_length,
                        n_iters=args.gaussian_update_iter,
                        originals=originals)
    for name, c in costs.items():
        rows.append(analyze(name, c["flops"], c["bytes"]))
        mem[name] = {k: round(v, 1) for k, v in c["mem"].items()
                     if k.startswith("hbm")}
    return rows, mem, costs


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capture-fullres", action="store_true",
                    help="(internal) CPU-backend spec capture at 680x1200")
    ap.add_argument("--fullres", action="store_true",
                    help="add the 680x1200 TPU-target compile proof")
    ap.add_argument("--no-measure", action="store_true",
                    help="skip device timing (cost analysis only)")
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--platform", default=None,
                    help="in-process backend override (e.g. cpu, for spec "
                         "capture while the TPU tunnel is down; implies "
                         "--no-measure since CPU timings are meaningless)")
    args = ap.parse_args()

    if args.capture_fullres:
        capture_fullres_main()
        return

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        args.no_measure = True

    from bench import make_args

    H = int(os.environ.get("BENCH_H", 170))
    W = int(os.environ.get("BENCH_W", 300))
    specs, reals = {}, {}
    print(f"[roofline] capturing args over {args.frames} frames at {H}x{W} "
          f"on {jax.devices()[0].platform}...")
    bench_args, _, tracker, mapper, originals = run_pipeline(
        H, W, args.frames, specs, reals)
    with open("/tmp/roofline_bench_specs.pkl", "wb") as f:
        pickle.dump(specs, f)   # reused by scripts/hlo_traffic.py

    costs = stage_costs(specs, originals["icp_track"],
                        memory_length=bench_args.memory_length,
                        n_iters=bench_args.gaussian_update_iter,
                        originals=originals)

    from rtgslam_tpu.models import map_ops, optimize

    fns = {"icp_track": originals["icp_track"],
           "frame_chain": map_ops.frame_chain,
           "optimize_chain": optimize.optimize_chain,
           "optimize_prepare": originals["optimize_prepare"],
           "optimize_execute": optimize.optimize_execute}

    floor_ms = None
    rows = []
    for name, c in costs.items():
        measured = None
        if not args.no_measure:
            if floor_ms is None:
                floor_ms = dispatch_floor()
            a, k = reals[name]
            reps = (3 if name in ("optimize_chain", "optimize_execute")
                    else args.reps)
            measured, trace = measure(fns[name], a, k, reps)
            print(f"[measure] {name}: median {measured:.1f} ms "
                  f"(reps {trace})")
        rows.append(analyze(name, c["flops"], c["bytes"], measured))

    # per-frame amortized model at the Replica operating point
    opt_keys = (["optimize_prepare", "optimize_execute"]
                if "optimize_execute" in costs else ["optimize_chain"])
    per_frame = {}
    for key in ("flops", "bytes"):
        per_frame[key] = (costs["icp_track"][key] + costs["frame_chain"][key]
                          + sum(costs[o][key] for o in opt_keys)
                          / bench_args.gaussian_update_frame)
    frame_row = analyze("per_frame_amortized", per_frame["flops"],
                        per_frame["bytes"])
    sol_fps = 1e3 / frame_row["sol_ms_v5e"]
    rows.append(frame_row)

    probes = {}
    if "optimize_execute" in costs:
        probes["optimize_iter_compact"] = costs["optimize_execute"]["iter_probe"]
    else:
        probes["render_inference"] = costs["optimize_chain"]["render_probe"]
        probes["optimize_iter_fwd_bwd_adam"] = costs["optimize_chain"]["iter_probe"]

    result = {
        "resolution": [H, W],
        "peaks": {"mxu_bf16": MXU_PEAK_BF16, "vpu_f32_fma": VPU_PEAK_F32,
                  "hbm_Bps": HBM_BW},
        "dispatch_floor_ms": floor_ms,
        "stages": rows,
        "corrections": {k: v["correction"] for k, v in costs.items()},
        "probes": probes,
        "speed_of_light_fps_v5e": round(sol_fps, 1),
    }

    print_table(rows, f"Roofline @ {H}x{W} (v5e single chip)")
    print(f"\nspeed-of-light amortized fps @ {H}x{W}: {sol_fps:.0f}")
    if floor_ms is not None:
        print(f"dispatch floor on this link: {floor_ms:.1f} ms")

    if args.fullres:
        if not os.path.exists(SPEC_PICKLE):
            print("[roofline] capturing fullres specs (CPU subprocess)...")
            capture_fullres_subprocess()
        with open(SPEC_PICKLE, "rb") as f:
            fspecs = pickle.load(f)
        print("[roofline] compiling 680x1200 executables for the TPU "
              "target (host-side)...")
        frows, fmem, fcosts = fullres_compile_proof(
            fspecs, originals["icp_track"], originals=originals)
        fopt = (["optimize_prepare", "optimize_execute"]
                if "optimize_execute" in fcosts else ["optimize_chain"])
        fr = {k: None for k in ("flops", "bytes")}
        for key in fr:
            fr[key] = (fcosts["icp_track"][key] + fcosts["frame_chain"][key]
                       + sum(fcosts[o][key] for o in fopt) / 6)
        ffr = analyze("per_frame_amortized", fr["flops"], fr["bytes"])
        frows.append(ffr)
        print_table(frows, "Roofline @ 680x1200 Replica-native "
                           "(TPU-target compile proof)")
        print("\nHBM footprints (arguments/outputs/temps, MB):")
        for k, v in fmem.items():
            print(f"  {k}: {v}")
        print(f"\nspeed-of-light amortized fps @ 680x1200: "
              f"{1e3 / ffr['sol_ms_v5e']:.0f}")
        result["fullres"] = {"stages": frows, "hbm_mb": fmem,
                             "speed_of_light_fps_v5e":
                                 round(1e3 / ffr["sol_ms_v5e"], 1)}

    # a non-TPU backend produces CPU-layout byte counts that are NOT
    # comparable with the committed TPU cost model — keep them out of the
    # canonical ROOFLINE.json (this run is for spec capture / quick deltas)
    name = ("ROOFLINE.json" if not args.platform
            else f"ROOFLINE_{args.platform}.json")
    out = (os.path.join(ROOT, name) if not args.platform
           else os.path.join("/tmp", name))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
