#!/usr/bin/env python
"""Long-orbit loop-closure A/B probe (VERDICT r2 #5 "done" criterion).

Runs the bench operating point (``bench.make_args``) through the
``slam.py`` frame loop — including the pose-feedback edge
``mapper.update_poses(tracker.get_new_poses())`` that carries relaxed
pose-graph history into the map (reference analog:
/root/reference/SLAM/multiprocess/mapper.py:134-141) — TWICE: with and
without ``loop_closure_pure_icp``.  Prints one JSON line with ATE for
both arms.  The synthetic orbit revisits its start every lap, so pure-ICP
drift accumulated over the laps is exactly what closure should remove.

The default bench orbit NEVER revisits a view (one revolution = 900
frames, and the view direction rotates 1.33x faster than the position, so
at a position revisit the view differs by ~119 deg — outside any
place-recognition gate).  The probe therefore runs a REVISITING variant:
``--laps 2`` splits the frame budget into two full laps with
``look_mult=1.0`` (same positions AND view directions on lap 2), which is
the trajectory class loop closure exists for.

Usage (real TPU, the round-2 660-frame envelope point, 2 laps):
    python scripts/closure_probe.py --frames 660
CPU sanity (small):
    python scripts/closure_probe.py --frames 120 --height 120 --width 160 --platform cpu
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def run_arm(H, W, n_frames, use_closure, map_capacity, tile_capacity, laps):
    import numpy as np
    from bench import make_args
    from rtgslam_tpu.data.synthetic import make_cameras
    from rtgslam_tpu.slam import Mapper, Tracker

    args, opt = make_args(H, W)
    args.map_capacity = map_capacity
    args.tile_capacity = tile_capacity
    args.use_loop_closure = True
    args.loop_closure_pure_icp = bool(use_closure)

    cams = make_cameras(n_frames=n_frames, H=H, W=W,
                        frames_per_rev=max(1, n_frames // laps),
                        look_mult=1.0)
    tracker = Tracker(args)
    mapper = Mapper(args)

    t0 = time.time()
    closures = 0
    for i, cam in enumerate(cams):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
        new_poses = tracker.get_new_poses()
        if new_poses is not None:
            closures += 1
        mapper.update_poses(new_poses)
        mapper.mapping(cam, fm, i, opt)
        mapper.get_render_output(cam)
        tracker.update_last_status(
            cam, mapper.model_map["render_depth"], mapper.frame_map["depth_map"],
            mapper.model_map["render_normal"], mapper.frame_map["normal_map_w"])
        mapper.time += 1
        mapper.drain()
        if (i + 1) % 100 == 0:
            print(f"[probe closure={use_closure}] frame {i+1}/{n_frames} "
                  f"ate={tracker.eval_ate():.3f}cm", file=sys.stderr)
    ate = float(tracker.eval_ate())
    return {
        "ate_cm": round(ate, 4),
        "pose_graph_relaxations": closures,
        "gaussians": mapper.get_unstable_num + mapper.get_stable_num,
        "bin_overflow": int(mapper.max_overflow),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=660)
    ap.add_argument("--height", type=int, default=170)
    ap.add_argument("--width", type=int, default=300)
    ap.add_argument("--map_capacity", type=int, default=131072)
    ap.add_argument("--tile_capacity", type=int, default=1024)
    ap.add_argument("--laps", type=int, default=2,
                    help="full orbit revolutions within --frames (>=2 so "
                         "the trajectory revisits earlier views)")
    ap.add_argument("--platform", type=str, default=None,
                    help="in-process backend override (the axon plugin "
                         "ignores JAX_PLATFORMS env)")
    ap.add_argument("--arm", choices=["both", "on", "off"], default="both",
                    help="run one arm only (lets the two arms be separate "
                         "TPU processes — never two at once)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    out = {"frames": args.frames, "H": args.height, "W": args.width,
           "laps": args.laps}
    if args.arm in ("both", "off"):
        out["no_closure"] = run_arm(args.height, args.width, args.frames,
                                    False, args.map_capacity,
                                    args.tile_capacity, args.laps)
    if args.arm in ("both", "on"):
        out["with_closure"] = run_arm(args.height, args.width, args.frames,
                                      True, args.map_capacity,
                                      args.tile_capacity, args.laps)
    if "no_closure" in out and "with_closure" in out:
        out["closure_wins"] = bool(
            out["with_closure"]["ate_cm"] < out["no_closure"]["ate_cm"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
