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

    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Mapper, Tracker

    args, opt = make_args(H, W)
    cams = make_cameras(n_frames=n_frames, H=H, W=W)
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

    mean_mapping = float(np.mean(map_times))
    mean_tracking = float(np.mean(track_times))
    med_mapping = float(np.median(map_times))
    med_tracking = float(np.median(track_times))
    # Headline fps follows the reference rule fps = 1 / mean(mapping time)
    # (monitor.py:22-24), with ONE documented adjustment: frames that hit a
    # tunnel wedge (the axon worker parks for 30-60 s, CLAUDE.md) are
    # dropped before the mean.  The 10 s threshold is unambiguous — no real
    # mapping frame at this size is within 10x of it (optimize frames are
    # ~0.5 s) — and on hardware without wedges zero frames are dropped, so
    # the headline IS the reference rule there by construction.  The
    # unfiltered mean-rule figure is reported alongside in `detail`.
    WEDGE_S = 10.0
    kept = [t for t in map_times if t < WEDGE_S]
    n_wedged = len(map_times) - len(kept)
    mean_mapping_kept = float(np.mean(kept)) if kept else mean_mapping
    fps = 1.0 / mean_mapping_kept if mean_mapping_kept > 0 else 0.0
    ate = tracker.eval_ate()

    from rtgslam_tpu.slam.eval import eval_frame

    metrics = eval_frame(mapper, cams[-1])
    # run-wide high-water mark, not just the eval frame's render
    overflow = max(int(mapper.max_overflow), int(metrics.get("bin_overflow", 0)))

    result = {
        "metric": "synthetic_room_online_mapping_fps",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "detail": {
            "H": H, "W": W, "frames": n_frames,
            "mean_tracking_ms": round(mean_tracking * 1e3, 2),
            "mean_mapping_ms": round(mean_mapping * 1e3, 2),
            "median_tracking_ms": round(med_tracking * 1e3, 2),
            "median_mapping_ms": round(med_mapping * 1e3, 2),
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
    if overflow:
        # Overflow means the static tile/block capacities silently dropped
        # gaussians: the numbers above are not trustworthy.  Fail loudly
        # (deterministic — the retry wrapper aborts instead of retrying).
        sys.stderr.write(f"[bench] FATAL: bin_overflow={overflow} != 0 — "
                         "undersized tile/block capacity\n")
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
