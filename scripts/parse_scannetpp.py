#!/usr/bin/env python
"""Convert a ScanNet++ DSLR capture to the framework's directory layout.

Behavioral contract from the reference ``scripts/parse_scannetpp.py``:
reads ``<data_base>/dslr/undistorted_images``, ``undistorted_depths`` and
``nerfstudio/transforms_undistorted.json`` and writes

    <output>/<scene>/{color,depth,pose,intrinsic}[ + *_eval splits]

with OpenGL->CV pose conversion (flip y/z), intrinsics from the nerfstudio
json, and the scene mesh copied alongside.

    python scripts/parse_scannetpp.py --data_base <scene_dir> --output_path data/scannetpp
"""

import json
import os
import shutil
from argparse import ArgumentParser

import numpy as np


def convert_split(frames, img_src, depth_src, out, suffix=""):
    import cv2

    os.makedirs(os.path.join(out, "color" + suffix), exist_ok=True)
    os.makedirs(os.path.join(out, "depth" + suffix), exist_ok=True)
    os.makedirs(os.path.join(out, "pose" + suffix), exist_ok=True)
    for i, frame in enumerate(frames):
        name = os.path.basename(frame["file_path"])
        stem = os.path.splitext(name)[0]
        img = cv2.imread(os.path.join(img_src, name), cv2.IMREAD_UNCHANGED)
        if img is None:
            continue
        cv2.imwrite(os.path.join(out, "color" + suffix, f"{i}.jpg"), img)
        depth = cv2.imread(os.path.join(depth_src, stem + ".png"),
                           cv2.IMREAD_UNCHANGED)
        if depth is not None:
            cv2.imwrite(os.path.join(out, "depth" + suffix, f"{i}.png"), depth)
        c2w = np.array(frame["transform_matrix"])
        c2w[:3, 1:3] *= -1  # OpenGL -> CV camera axes
        np.savetxt(os.path.join(out, "pose" + suffix, f"{i}.txt"), c2w)


def main():
    parser = ArgumentParser()
    parser.add_argument("--data_base", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    args = parser.parse_args()

    data_path = os.path.join(args.data_base, "dslr")
    mesh_path = os.path.join(args.data_base, "scans")
    scene_name = os.path.basename(os.path.normpath(args.data_base))
    save_path = os.path.join(args.output_path, scene_name)
    os.makedirs(os.path.join(save_path, "intrinsic"), exist_ok=True)

    with open(os.path.join(data_path, "nerfstudio",
                           "transforms_undistorted.json")) as f:
        meta = json.load(f)
    K = np.array([[meta["fl_x"], 0, meta["cx"]],
                  [0, meta["fl_y"], meta["cy"]],
                  [0, 0, 1.0]])
    K4 = np.block([[K, np.zeros((3, 1))], [np.zeros((1, 3)), np.ones((1, 1))]])
    np.savetxt(os.path.join(save_path, "intrinsic", "intrinsic_depth.txt"), K4)

    img_src = os.path.join(data_path, "undistorted_images")
    depth_src = os.path.join(data_path, "undistorted_depths")
    convert_split(sorted(meta["frames"], key=lambda x: x["file_path"]),
                  img_src, depth_src, save_path)
    if "test_frames" in meta:
        convert_split(sorted(meta["test_frames"], key=lambda x: x["file_path"]),
                      img_src, depth_src, save_path, suffix="_eval")

    if os.path.isdir(mesh_path):
        for ply in os.listdir(mesh_path):
            if ply.endswith(".ply"):
                shutil.copy(os.path.join(mesh_path, ply),
                            os.path.join(save_path, ply))
    print(f"wrote {save_path}")


if __name__ == "__main__":
    main()
