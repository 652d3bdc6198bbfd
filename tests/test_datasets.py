"""Dataset reader tests over generated fixtures for each supported layout."""

import json
import os

import numpy as np
import pytest

from rtgslam_tpu.data import Dataset, load_camera
from rtgslam_tpu.data.synthetic import write_scene
from rtgslam_tpu.config import GroupParams


def make_args(path, dtype):
    a = GroupParams()
    a.type = dtype
    a.source_path = path
    a.eval = False
    a.eval_llff = 8
    a.frame_start = 0
    a.frame_num = -1
    a.frame_step = 0
    a.resolution = 1
    return a


def test_ours_layout_roundtrip(tmp_path):
    scene_dir = str(tmp_path / "scene")
    write_scene(scene_dir, n_frames=4, H=48, W=64)
    ds = Dataset(make_args(scene_dir, "Ours"))
    assert len(ds) == 4
    cam = load_camera(make_args(scene_dir, "Ours"), 0,
                      ds.scene_info.train_cameras[0])
    assert cam.image.shape == (48, 64, 3)
    assert cam.depth.shape == (48, 64, 1)
    assert cam.depth.max() > 0.5  # metres, not mm
    # poses normalized to first frame
    assert np.allclose(ds.scene_info.train_cameras[0].pose_gt, np.eye(4), atol=1e-8)


def test_replica_layout(tmp_path):
    import cv2

    root = tmp_path / "Replica"
    scene = root / "room_test"
    (scene / "results").mkdir(parents=True)
    H, W = 32, 48
    poses = []
    for i in range(3):
        img = np.full((H, W, 3), 100 + i, np.uint8)
        cv2.imwrite(str(scene / "results" / f"frame{i:06d}.jpg"), img)
        cv2.imwrite(str(scene / "results" / f"depth{i:06d}.png"),
                    np.full((H, W), 2000, np.uint16))
        pose = np.eye(4)
        pose[0, 3] = i * 0.1
        poses.append(pose)
    with open(scene / "traj.txt", "w") as f:
        for p in poses:
            f.write(" ".join(map(str, p.reshape(-1))) + "\n")
    with open(root / "cam_params.json", "w") as f:
        json.dump({"camera": {"fx": 40.0, "cx": W / 2, "cy": H / 2,
                              "scale": 1000.0, "h": H, "w": W}}, f)
    ds = Dataset(make_args(str(scene), "Replica"))
    assert len(ds) == 3
    cam = load_camera(make_args(str(scene), "Replica"), 1,
                      ds.scene_info.train_cameras[1])
    assert np.isclose(cam.depth.mean(), 2.0, atol=1e-3)
    # first-pose normalization: frame 1 sits 0.1m from frame 0
    assert np.isclose(np.linalg.norm(ds.scene_info.train_cameras[1].pose_gt[:3, 3]),
                      0.1, atol=1e-6)


def test_tum_layout(tmp_path):
    import cv2
    import yaml

    d = tmp_path / "tum_seq"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    H, W = 32, 48
    rgb_lines, depth_lines, gt_lines = [], [], ["# header"]
    for i in range(3):
        t = i * 0.5
        cv2.imwrite(str(d / "rgb" / f"{t:.6f}.png"), np.zeros((H, W, 3), np.uint8))
        cv2.imwrite(str(d / "depth" / f"{t:.6f}.png"),
                    np.full((H, W), 5000, np.uint16))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} {i*0.01} 0 0 0 0 0 1")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(depth_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt_lines))
    (d / "config.yaml").write_text(yaml.safe_dump({
        "fx": 40.0, "fy": 40.0, "cx": W / 2, "cy": H / 2,
        "crop_edge": 0, "depth_scale": 5000.0}))
    ds = Dataset(make_args(str(d), "TUM"))
    assert len(ds) == 3
    cam = load_camera(make_args(str(d), "TUM"), 0, ds.scene_info.train_cameras[0])
    assert np.isclose(cam.depth.mean(), 1.0, atol=1e-3)


def test_blender_layout(tmp_path):
    import cv2

    d = tmp_path / "lego"
    (d / "train").mkdir(parents=True)
    frames = []
    for i in range(2):
        cv2.imwrite(str(d / "train" / f"r_{i}.png"), np.zeros((32, 32, 3), np.uint8))
        pose = np.eye(4)
        pose[2, 3] = 2.0 + i
        frames.append({"file_path": f"train/r_{i}", "transform_matrix": pose.tolist()})
    (d / "transforms_train.json").write_text(json.dumps(
        {"camera_angle_x": 0.7, "frames": frames}))
    ds = Dataset(make_args(str(d), "Blender"))
    assert len(ds) == 2


def test_colmap_layout(tmp_path):
    import cv2

    d = tmp_path / "colmap_scene"
    (d / "sparse" / "0").mkdir(parents=True)
    (d / "images").mkdir()
    cv2.imwrite(str(d / "images" / "img0.jpg"), np.zeros((32, 32, 3), np.uint8))
    (d / "sparse" / "0" / "cameras.txt").write_text(
        "# cameras\n1 PINHOLE 32 32 40.0 40.0 16.0 16.0\n")
    (d / "sparse" / "0" / "images.txt").write_text(
        "# images\n1 1 0 0 0 0.1 0.2 0.3 1 img0.jpg\n0 0 0\n")
    ds = Dataset(make_args(str(d), "Colmap"))
    assert len(ds) == 1
    info = ds.scene_info.train_cameras[0]
    assert np.allclose(info.T, [0.1, 0.2, 0.3])


def test_colmap_binary_layout(tmp_path):
    """cameras.bin/images.bin parse to the same scene as the text model
    (format: colmap WriteCamerasBinary/WriteImagesBinary; reference
    scene/colmap_loader.py:212-289)."""
    import struct

    import cv2

    d = tmp_path / "colmap_bin"
    (d / "sparse" / "0").mkdir(parents=True)
    (d / "images").mkdir()
    cv2.imwrite(str(d / "images" / "img0.jpg"), np.zeros((32, 32, 3), np.uint8))
    # one SIMPLE_PINHOLE camera: id=1, model 0, 32x32, f=40 cx=cy=16
    with open(d / "sparse" / "0" / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 0, 32, 32))
        f.write(struct.pack("<3d", 40.0, 16.0, 16.0))
    # one image: identity quat, t=(0.1,0.2,0.3), 2 skipped 2D points
    with open(d / "sparse" / "0" / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<7d", 1, 0, 0, 0, 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"img0.jpg\x00")
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ddq", 1.0, 2.0, -1) * 2)
    ds = Dataset(make_args(str(d), "Colmap"))
    assert len(ds) == 1
    info = ds.scene_info.train_cameras[0]
    assert np.allclose(info.T, [0.1, 0.2, 0.3])
    assert info.width == 32 and np.isclose(info.cx, 16.0)


def test_tum_association_tolerance(tmp_path):
    """TUM association: rgb frames keep the nearest depth/pose stamps within
    0.08 s and are dropped outside it; near-duplicate stamps are thinned to
    ~32 fps (reference scene/dataset_readers.py:553-571).  Timestamps are
    authentic fr1_desk-style epoch values."""
    import cv2
    import yaml

    d = tmp_path / "fr1_desk"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    H, W = 32, 48
    # authentic-format TUM stamps: rgb at ~30 Hz, depth offset by ~25 ms,
    # one rgb frame (idx 2) with no depth partner within 80 ms.
    rgb_ts = [1305031452.791720, 1305031452.823674, 1305031452.859642,
              1305031452.891726]
    dep_ts = [1305031452.816237, 1305031452.849269, None, 1305031452.915980]
    gt = ["# ground truth trajectory",
          "1305031452.7916 1.2334 -0.0113 1.6941 0.7907 0.4393 -0.1770 -0.3879",
          "1305031452.8234 1.2335 -0.0114 1.6939 0.7908 0.4392 -0.1770 -0.3879",
          "1305031452.8596 1.2336 -0.0115 1.6937 0.7909 0.4391 -0.1771 -0.3878",
          "1305031452.8918 1.2337 -0.0116 1.6935 0.7910 0.4390 -0.1771 -0.3878"]
    rgb_lines, dep_lines = ["# color images"], ["# depth images"]
    for i, t in enumerate(rgb_ts):
        cv2.imwrite(str(d / "rgb" / f"{t:.6f}.png"),
                    np.zeros((H, W, 3), np.uint8))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
    for t in dep_ts:
        if t is None:
            continue
        cv2.imwrite(str(d / "depth" / f"{t:.6f}.png"),
                    np.full((H, W), 5000, np.uint16))
        dep_lines.append(f"{t:.6f} depth/{t:.6f}.png")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(dep_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt))
    (d / "config.yaml").write_text(yaml.safe_dump({
        "fx": 517.3, "fy": 516.5, "cx": 318.6, "cy": 255.3,
        "crop_edge": 0, "depth_scale": 5000.0}))
    ds = Dataset(make_args(str(d), "TUM"))
    # frame 2's nearest depth stamp is 1305031452.849269 (10.4 ms away) so it
    # associates; every rgb frame has a depth+pose partner within 80 ms here
    # and stamps are > 1/32 s apart, so all 4 survive.
    assert len(ds) == 4
    stamps = [c.timestamp for c in ds.scene_info.train_cameras]
    assert stamps == sorted(stamps)
    # gt pose association picked the nearest row: frame 0 pairs with the
    # 1305031452.7916 line; pose_gt is first-frame-normalized so check the
    # *relative* translation between frames 0 and 3 (~0.73 mm).
    rel = np.linalg.norm(ds.scene_info.train_cameras[3].pose_gt[:3, 3])
    assert 0 < rel < 0.002


def test_tum_association_drops_unmatched(tmp_path):
    """An rgb frame whose nearest depth stamp is > 0.08 s away is dropped."""
    import cv2
    import yaml

    d = tmp_path / "tum_gap"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    H, W = 32, 48
    rgb_ts = [1305031453.000000, 1305031453.200000]
    dep_ts = [1305031453.010000]  # second rgb frame has no partner (190 ms)
    rgb_lines, dep_lines, gt = [], [], ["# gt"]
    for t in rgb_ts:
        cv2.imwrite(str(d / "rgb" / f"{t:.6f}.png"),
                    np.zeros((H, W, 3), np.uint8))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        gt.append(f"{t:.6f} 0 0 0 0 0 0 1")
    for t in dep_ts:
        cv2.imwrite(str(d / "depth" / f"{t:.6f}.png"),
                    np.full((H, W), 5000, np.uint16))
        dep_lines.append(f"{t:.6f} depth/{t:.6f}.png")
    (d / "rgb.txt").write_text("\n".join(rgb_lines))
    (d / "depth.txt").write_text("\n".join(dep_lines))
    (d / "groundtruth.txt").write_text("\n".join(gt))
    (d / "config.yaml").write_text(yaml.safe_dump({
        "fx": 517.3, "fy": 516.5, "cx": 318.6, "cy": 255.3,
        "crop_edge": 0, "depth_scale": 5000.0}))
    ds = Dataset(make_args(str(d), "TUM"))
    assert len(ds) == 1


def test_tum_crop_edge(tmp_path):
    """crop_edge=8 shrinks the decoded image by 16 px per axis and shifts
    the principal point (reference dataset_readers.py:600-612,
    utils/camera_utils.py crop handling)."""
    import cv2
    import yaml

    d = tmp_path / "tum_crop"
    (d / "rgb").mkdir(parents=True)
    (d / "depth").mkdir()
    H, W, crop = 48, 64, 8
    t = 1305031452.791720
    cv2.imwrite(str(d / "rgb" / f"{t:.6f}.png"), np.zeros((H, W, 3), np.uint8))
    cv2.imwrite(str(d / "depth" / f"{t:.6f}.png"),
                np.full((H, W), 5000, np.uint16))
    (d / "rgb.txt").write_text(f"{t:.6f} rgb/{t:.6f}.png")
    (d / "depth.txt").write_text(f"{t:.6f} depth/{t:.6f}.png")
    (d / "groundtruth.txt").write_text(f"# gt\n{t:.6f} 0 0 0 0 0 0 1")
    (d / "config.yaml").write_text(yaml.safe_dump({
        "fx": 40.0, "fy": 40.0, "cx": W / 2, "cy": H / 2,
        "crop_edge": crop, "depth_scale": 5000.0}))
    args = make_args(str(d), "TUM")
    ds = Dataset(args)
    info = ds.scene_info.train_cameras[0]
    assert np.isclose(info.cx, W / 2 - crop) and np.isclose(info.cy, H / 2 - crop)
    cam = load_camera(args, 0, info)
    assert cam.image.shape == (H - 2 * crop, W - 2 * crop, 3)
    assert cam.depth.shape == (H - 2 * crop, W - 2 * crop, 1)


def test_densify_export(tmp_path):
    from rtgslam_tpu.models.densify import save_densified_ply
    from rtgslam_tpu.utils.ply import read_ply

    xyz = np.array([[0, 0, 1.0]], np.float32)
    scaling = np.log(np.array([[0.05, 0.04, 0.004]], np.float32))
    rot = np.array([[1, 0, 0, 0]], np.float32)
    path = str(tmp_path / "dense.ply")
    n = save_densified_ply(path, xyz, scaling, rot, sigma=1, circle_num=8, levels=3)
    cols = read_ply(path)
    assert len(cols["x"]) == n == 24
    pts = np.stack([cols["x"], cols["y"], cols["z"]], 1)
    # all samples lie near the z=1 disc plane (z-axis is the smallest scale)
    assert np.abs(pts[:, 2] - 1.0).max() < 1e-5
    assert np.linalg.norm(pts[:, :2], axis=1).max() <= 0.06


def test_colmap_fov_camera_intrinsics():
    """FOV model params are (fx, fy, cx, cy, omega) — two focals, not one
    (regression: FOV was routed to the single-focal branch, shifting cx/cy)."""
    from rtgslam_tpu.data.dataset import _colmap_intrinsics

    fx, fy, cx, cy = _colmap_intrinsics(
        "FOV", [1000.0, 990.0, 960.0, 540.0, 0.9])
    assert (fx, fy, cx, cy) == (1000.0, 990.0, 960.0, 540.0)
    # single-focal families keep (f, cx, cy, ...)
    fx, fy, cx, cy = _colmap_intrinsics("SIMPLE_PINHOLE", [800.0, 320.0, 240.0])
    assert (fx, fy, cx, cy) == (800.0, 800.0, 320.0, 240.0)
    fx, fy, cx, cy = _colmap_intrinsics("RADIAL", [800.0, 320.0, 240.0, 0.01, 0.0])
    assert (fx, fy, cx, cy) == (800.0, 800.0, 320.0, 240.0)


def test_mixed_resolution_streams_not_cropped(tmp_path):
    """A capture whose color stream is higher-resolution than its depth
    stream (info dims probed from depth) must NOT trip the crop_edge
    recovery — the margins are a resolution mismatch, not a crop."""
    import cv2
    from rtgslam_tpu.data.camera import load_camera
    from rtgslam_tpu.data.dataset import CameraInfo

    cdir = tmp_path
    img = (np.random.default_rng(0).uniform(0, 255, (720, 1280, 3))).astype(np.uint8)
    dep = (np.full((576, 640), 1000, np.uint16))
    cv2.imwrite(str(cdir / "c.png"), img)
    cv2.imwrite(str(cdir / "d.png"), dep)
    info = CameraInfo(
        uid=0, R=np.eye(3), T=np.zeros(3), FovX=1.0, FovY=1.0,
        image_path=str(cdir / "c.png"), depth_path=str(cdir / "d.png"),
        image_name="c", width=640, height=576, cx=320.0, cy=288.0,
        timestamp=0.0, depth_scale=1000.0, pose_gt=np.eye(4))

    class A:
        resolution = 1

    cam = load_camera(A(), 0, info)
    assert cam.image.shape[:2] == (720, 1280)   # untouched
    assert cam.depth.shape[:2] == (576, 640)    # untouched
