#!/usr/bin/env python
"""Generate a synthetic RGBD scene in the "ours" directory layout."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtgslam_tpu.data.synthetic import write_scene

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data/synthetic/room")
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=320)
    a = p.parse_args()
    write_scene(a.out, a.frames, a.height, a.width)
    print(f"wrote {a.frames} frames to {a.out}")
