#!/usr/bin/env python
"""Benchmark: online tracking+mapping FPS on a synthetic Replica-class scene.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N}

FPS accounting follows the reference rule ``fps = 1 / mean(mapping time)``
(``utils/monitor.py:22-24``, ``slam.py:142``); the baseline is the driver's
north star of 30 FPS online tracking+mapping (BASELINE.md).  The scene is
procedural (no datasets ship in this environment) at a Replica-like aspect;
resolution/frames are tunable via env:

  BENCH_H/BENCH_W   frame size     (default 170 x 300: quarter Replica —
                    the tunneled TPU worker in this environment crashes on
                    larger frames; raise on real hardware)
  BENCH_FRAMES      frames         (default 40)
  BENCH_WARMUP      frames excluded from timing (default 12, covers jit)
  BENCH_REPS        full fresh-state passes (default 3); headline = median
                    rep's wedge-filtered reference-rule fps, spread published

Quality floors (psnr >= 27.5, ate_cm <= 0.5, bin_overflow == 0) fail the
bench with exit 2 so approximation levers cannot silently trade quality for
speed.  `device_mapping_ms` = median stage wall minus the measured dispatch
floor (one tunnel round trip per stage; see dispatch_floor_ms).

The measurement runs in a subprocess and retries after TPU-worker crashes
(the axon tunnel restarts its worker sporadically).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def make_args(H, W, env_overrides=True):
    """Benchmark configuration at the Replica operating point, sized to
    (H, W).  Shared with scripts/roofline.py so the roofline's executables
    are EXACTLY the bench executables."""
    from rtgslam_tpu.config import read_config, OptimizationParams

    repo = os.path.dirname(os.path.abspath(__file__))
    args = read_config(os.path.join(repo, "configs", "base.yaml"))
    # Replica operating point (configs/replica_base.yaml): 50 iters every
    # 6 frames, memory 5, ICP frame-to-model
    args.memory_length = 5
    args.gaussian_update_iter = 50
    args.gaussian_update_frame = 6
    args.stable_confidence_thres = 100
    args.unstable_time_window = 120
    args.uniform_sample_num = int(40800 * (H * W) / (680 * 1200))
    args.use_gt_pose = False
    args.icp_use_model_depth = True
    args.max_depth = 8.0
    args.save_step = 10 ** 9
    args.save_path = "/tmp/bench_run"
    # static capacities sized to the benchmark workload: every projection /
    # KNN / binning pass scales with these, and the defaults provision for
    # full-Replica runs (~20x this pixel count)
    scale = (H * W) / (680 * 1200)
    args.map_capacity = max(16384, 1 << int(np.ceil(np.log2(400_000 * scale))))
    args.temp_capacity = max(4096, 1 << int(np.ceil(np.log2(65_000 * scale))))
    # per-tile capacity must cover the densest tile; undersizing silently
    # drops far gaussians (watch detail.bin_overflow — must stay 0).
    # 512 measured: bin_overflow 0 across the 220-frame stretch run AND
    # ~17 ms/render cheaper than 2048 on this device (the blend's eager
    # per-tile gather + batched-while trip count scale with this capacity;
    # see PERF.md attribution table)
    args.block_capacity = 4096     # same measurement: 0 overflow, -8 ms/render vs 8192
    args.tile_capacity = 512
    # stretch-envelope overrides (e.g. BENCH_MAP_CAPACITY=131072 for the
    # >=128k-slot validation run; see README scale table)
    if env_overrides:
        for attr, env in (("map_capacity", "BENCH_MAP_CAPACITY"),
                          ("temp_capacity", "BENCH_TEMP_CAPACITY"),
                          ("tile_capacity", "BENCH_TILE_CAPACITY"),
                          ("block_capacity", "BENCH_BLOCK_CAPACITY")):
            if env in os.environ:
                setattr(args, attr, int(os.environ[env]))
    args.max_visible = args.map_capacity // 2
    # approximation lever A/B (PERF.md): sort/bin once per optimize call
    args.optimize_freeze_binning = bool(
        int(os.environ.get("BENCH_FREEZE_BINNING", "0")))
    opt = OptimizationParams().extract(args)
    return args, opt


WEDGE_S = 10.0


def dispatch_floor_ms(reps: int = 7) -> float:
    """Median round-trip of a tiny dispatch+fetch — the tunnel's per-call
    latency (29-34 ms here, ~us on local silicon).  `block_until_ready` is a
    no-op on axon, so completion is forced by np.asarray (CLAUDE.md); the
    per-frame stage walls below each include exactly one such round trip."""
    import jax.numpy as jnp

    x = jnp.ones((8,), jnp.float32)
    np.asarray(x + 1)   # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(x + 1.0)
        ts.append(time.time() - t0)
    return float(np.median(ts) * 1e3)


def run_rep(args, opt, cams, warmup):
    """One full tracking+mapping pass over the sequence with fresh state.
    Returns (track_times, map_times, tracker, mapper)."""
    from rtgslam_tpu.slam import Mapper, Tracker

    tracker = Tracker(args)
    mapper = Mapper(args)
    track_times, map_times = [], []
    for i, cam in enumerate(cams):
        t0 = time.time()
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        t1 = time.time()
        mapper.mapping(cam, fm, i, opt)
        mapper.get_render_output(cam)
        tracker.update_last_status(
            cam, mapper.model_map["render_depth"], mapper.frame_map["depth_map"],
            mapper.model_map["render_normal"], mapper.frame_map["normal_map_w"])
        mapper.time += 1
        mapper.drain()   # charge mapping compute to the mapping stage
        t2 = time.time()
        if i >= warmup:
            track_times.append(t1 - t0)
            map_times.append(t2 - t1)
    return track_times, map_times, tracker, mapper


def main():
    if os.environ.get("BENCH_PLATFORM"):
        # smoke-test backend override (e.g. cpu while the tunnel is down);
        # env JAX_PLATFORMS is ignored by the axon plugin — only the
        # in-process config update works (CLAUDE.md)
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    H = int(os.environ.get("BENCH_H", 170))
    W = int(os.environ.get("BENCH_W", 300))
    n_frames = int(os.environ.get("BENCH_FRAMES", 40))
    warmup = int(os.environ.get("BENCH_WARMUP", 12))
    n_reps = int(os.environ.get("BENCH_REPS", 3))

    from rtgslam_tpu.data.synthetic import make_cameras

    args, opt = make_args(H, W)
    cams = make_cameras(n_frames=n_frames, H=H, W=W)

    floor_ms = dispatch_floor_ms()

    # >=3 reps with fresh map state (executables stay warm after rep 1);
    # the published spread separates tunnel noise from real regressions
    # (VERDICT r4 weak #2: a single rep's reference-rule mean was
    # tunnel-noise-dominated).
    rep_fps, rep_map_med, rep_track_med = [], [], []
    map_times = track_times = None
    tracker = mapper = None
    for _ in range(max(1, n_reps)):
        track_times, map_times, tracker, mapper = run_rep(
            args, opt, cams, warmup)
        kept_r = [t for t in map_times if t < WEDGE_S]
        rep_fps.append(1.0 / float(np.mean(kept_r)) if kept_r else 0.0)
        rep_map_med.append(float(np.median(map_times)) * 1e3)
        rep_track_med.append(float(np.median(track_times)) * 1e3)

    mean_mapping = float(np.mean(map_times))
    mean_tracking = float(np.mean(track_times))
    med_mapping = float(np.median(rep_map_med)) / 1e3
    med_tracking = float(np.median(rep_track_med)) / 1e3
    # Headline fps follows the reference rule fps = 1 / mean(mapping time)
    # (monitor.py:22-24), with TWO documented adjustments: (a) frames that
    # hit a tunnel wedge (the axon worker parks for 30-60 s, CLAUDE.md) are
    # dropped before the mean — the 10 s threshold is unambiguous (no real
    # mapping frame at this size is within 10x of it), and on hardware
    # without wedges zero frames are dropped; (b) the headline is the MEDIAN
    # across reps, so one wedge-scarred rep cannot swing it.  The unfiltered
    # single-rep mean-rule figure is reported alongside in `detail`.
    kept = [t for t in map_times if t < WEDGE_S]
    n_wedged = len(map_times) - len(kept)
    fps = float(np.median(rep_fps))
    ate = tracker.eval_ate()

    from rtgslam_tpu.slam.eval import eval_frame

    metrics = eval_frame(mapper, cams[-1])
    # run-wide high-water mark, not just the eval frame's render
    overflow = max(int(mapper.max_overflow), int(metrics.get("bin_overflow", 0)))

    # device-time estimate: each stage wall includes exactly ONE dispatch
    # round trip (2 dispatches + 1 fetch per steady-state frame, PERF.md),
    # so median wall minus the measured floor bounds device execution from
    # above.  Reported next to the reference rule, not instead of it.
    dev_map_ms = max(0.0, med_mapping * 1e3 - floor_ms)
    dev_track_ms = max(0.0, med_tracking * 1e3 - floor_ms)

    result = {
        "metric": "synthetic_room_online_mapping_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "detail": {
            "H": H, "W": W, "frames": n_frames, "reps": max(1, n_reps),
            "rep_fps": [round(f, 3) for f in rep_fps],
            "rep_median_mapping_ms": [round(m, 2) for m in rep_map_med],
            "mean_tracking_ms": round(mean_tracking * 1e3, 2),
            "mean_mapping_ms": round(mean_mapping * 1e3, 2),
            "median_tracking_ms": round(med_tracking * 1e3, 2),
            "median_mapping_ms": round(med_mapping * 1e3, 2),
            "dispatch_floor_ms": round(floor_ms, 2),
            "device_mapping_ms": round(dev_map_ms, 2),
            "device_tracking_ms": round(dev_track_ms, 2),
            "device_fps": round(1e3 / dev_map_ms, 3) if dev_map_ms > 0 else 0.0,
            "fps_reference_mean_rule": round(
                1.0 / mean_mapping if mean_mapping > 0 else 0.0, 3),
            "fps_median_rule": round(
                1.0 / med_mapping if med_mapping > 0 else 0.0, 3),
            "wedge_frames_dropped": n_wedged,
            "e2e_fps": round(1.0 / (med_tracking + med_mapping), 3),
            "ate_cm": round(float(ate), 4),
            "psnr": round(float(metrics["psnr"]), 3),
            "depth_l1_cm": round(float(metrics["depth_l1_cm"]), 4),
            "gaussians": mapper.get_unstable_num + mapper.get_stable_num,
            "bin_overflow": overflow,
        },
    }
    from rtgslam_tpu.utils import perf

    if perf.ENABLED:
        result["detail"]["perf"] = perf.report()
    print(json.dumps(result))
    # Quality floors (VERDICT r4 weak #5): approximation levers must not
    # silently trade quality for speed.  Deterministic failures -> exit 2
    # (the retry wrapper aborts instead of retrying).
    gates = []
    if overflow:
        gates.append(f"bin_overflow={overflow} != 0 (undersized tile/block "
                     "capacity — numbers not trustworthy)")
    # psnr/ate floors are calibrated at the default operating point; env
    # overrides (exploratory sizes) keep only the overflow gate
    at_default = (H, W, n_frames) == (170, 300, 40)
    if at_default and float(metrics["psnr"]) < 27.5:
        gates.append(f"psnr={float(metrics['psnr']):.2f} < 27.5")
    if at_default and float(ate) > 0.5:
        gates.append(f"ate_cm={float(ate):.3f} > 0.5")
    if gates:
        sys.stderr.write("[bench] FATAL quality gate: " + "; ".join(gates) + "\n")
        sys.exit(2)


def main_with_retries(attempts: int = 3, cooldown_s: int = 240) -> int:
    """Run the measurement in a child process; retry after worker crashes."""
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True)
        out = proc.stdout.strip().splitlines()
        json_lines = [l for l in out if l.startswith("{")]
        if proc.returncode == 0 and json_lines:
            print(json_lines[-1])
            return 0
        if proc.returncode == 2 and json_lines:
            # deterministic capacity failure — retrying cannot fix it
            print(json_lines[-1])
            sys.stderr.write((proc.stderr or "").splitlines()[-1] + "\n")
            return 2
        sys.stderr.write(
            f"[bench] attempt {attempt + 1} failed "
            f"(rc={proc.returncode}); tail:\n"
            + "\n".join((proc.stderr or "").splitlines()[-4:]) + "\n")
        if attempt + 1 < attempts:
            time.sleep(cooldown_s)  # let the TPU worker restart
    print(json.dumps({
        "metric": "synthetic_room_online_mapping_fps",
        "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
        "detail": {"error": "TPU worker unavailable after retries"},
    }))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        from rtgslam_tpu.utils import perf

        with perf.device_trace():   # RTG_TRACE=<dir> -> jax.profiler trace
            main()
    else:
        sys.exit(main_with_retries())
