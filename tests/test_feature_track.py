"""Native image-feature tracking (the reference's ORB fallback contract,
``track_with_orb_feature``, reference tracker.py:236-240).

The backend's tracker is Shi-Tomasi corners + ZNCC patch matching against
the last tracked frame + depth-lifted 3D-3D RANSAC with Horn (quaternion)
alignment (``native/pose_backend.cc::feature_track``).  These tests pin:

  * a known camera translation over a textured constant-depth plane is
    recovered from the images alone;
  * end-to-end: when ICP hard-fails on every frame (a planar wall is
    rank-deficient for point-to-plane ICP), the feature fallback carries
    the whole trajectory with bounded error — the contract the reference
    gets from ORB feature tracking.
"""

import copy
import os

import numpy as np
import pytest

LIB = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "native", "build", "libpose_backend.so")
needs_native = pytest.mark.skipif(not os.path.exists(LIB),
                                  reason="native backend not built")


def _texture(H, W, pad, seed=3):
    """Textured wall: coarse blocks (corner structure) + fine noise
    (patch discriminability)."""
    rng = np.random.default_rng(seed)
    hh, ww = (H + 2 * pad) // 4 + 2, (W + 2 * pad) // 4 + 2
    base = rng.uniform(0, 1, (hh, ww, 3))
    tex = np.kron(base, np.ones((4, 4, 1)))[: H + 2 * pad, : W + 2 * pad]
    tex = 0.7 * tex + 0.3 * rng.uniform(0, 1, tex.shape)
    return tex.astype(np.float32)


def _u8(img):
    return (img * 255).astype(np.uint8)


@needs_native
def test_native_feature_track_recovers_known_shift():
    """Two frames of a constant-depth textured plane, camera translated
    +x: track_with_orb_feature must recover the translation from images
    + depth alone (no odometry seed)."""
    from rtgslam_tpu.slam.native_backend import NativePoseBackend
    from rtgslam_tpu.slam.tracker import convert_poses

    H, W = 120, 160
    fx = fy = 100.0
    z = 2.0
    shift = 4                      # pixels
    tx = shift * z / fx            # 0.08 m
    pad = 16
    tex = _texture(H, W, pad)
    img0 = tex[pad:pad + H, pad:pad + W]
    img1 = tex[pad:pad + H, pad + shift:pad + shift + W]
    depth_u16 = np.full((H, W), int(z * 1000), np.uint16)
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]])

    be = NativePoseBackend(LIB)
    be.initialize(True)
    be.set_camera(K, W, H, 1000.0)
    be.process_image_rgbd(_u8(img0), depth_u16, 0.0)
    be.track_with_orb_feature(_u8(img1), depth_u16, 1.0)
    assert be.last_track_ok()
    assert be.last_track_inliers() >= 12

    poses, _ = convert_poses(be.get_trajectory_points())
    T = poses[-1]
    assert np.allclose(T[:3, :3], np.eye(3), atol=0.02)
    assert abs(T[0, 3] - tx) < 0.01, T[:3, 3]
    assert abs(T[1, 3]) < 0.01 and abs(T[2, 3]) < 0.02, T[:3, 3]


@needs_native
def test_native_feature_track_reports_failure_without_texture():
    """A featureless frame must refuse to produce a pose (and hold)."""
    from rtgslam_tpu.slam.native_backend import NativePoseBackend

    H, W = 96, 128
    flat = np.full((H, W, 3), 128, np.uint8)
    depth_u16 = np.full((H, W), 2000, np.uint16)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    be = NativePoseBackend(LIB)
    be.initialize(True)
    be.set_camera(K, W, H, 1000.0)
    be.process_image_rgbd(flat, depth_u16, 0.0)
    be.track_with_orb_feature(flat, depth_u16, 1.0)
    assert not be.last_track_ok()


def _wall_sequence(n, H=120, W=160, fx=100.0, z=2.0, step_px=2):
    """Cameras sliding +x along a textured constant-depth wall — the
    depth-degenerate case point-to-plane ICP cannot observe."""
    from rtgslam_tpu.data.camera import Camera
    from rtgslam_tpu.utils.geometry import focal2fov

    tx_step = step_px * z / fx
    pad = 8 + n * step_px
    tex = _texture(H, W, pad)
    cams = []
    for i in range(n):
        img = np.ascontiguousarray(
            tex[pad:pad + H, pad + i * step_px:pad + i * step_px + W])
        depth = np.full((H, W, 1), z, np.float32)
        pose = np.eye(4)
        pose[0, 3] = i * tx_step
        cam = Camera(uid=i, R=np.eye(3), T=np.zeros(3),
                     FoVx=focal2fov(fx, W), FoVy=focal2fov(fx, H),
                     image=img, depth=depth, timestamp=i / 30.0,
                     depth_scale=1000.0, pose_gt=pose)
        cams.append(cam)
    return cams, tx_step


@needs_native
def test_feature_fallback_carries_trajectory(base_args):
    """e2e (VERDICT r2 #3 contract): ICP hard-fails on every frame of a
    planar-wall sweep; the backend's feature tracking must carry the
    trajectory (bounded ATE) where a pose-hold would drift by the full
    travel distance."""
    from rtgslam_tpu.slam import Tracker
    from rtgslam_tpu.slam.native_backend import NativePoseBackend

    n = 8
    cams, tx_step = _wall_sequence(n)
    args = copy.deepcopy(base_args)
    args.use_gt_pose = False
    args.use_orb_backend = True
    args.orb_useicp = True
    args.use_loop_closure = False
    args.icp_use_model_depth = False
    tracker = Tracker(args, orb_backend=NativePoseBackend(LIB))
    tracker.orb_backend.initialize(True)
    # the planar wall: point-to-plane ICP is rank-deficient in-plane;
    # force the hard failure its gate would report
    tracker.icp.predict_pose = \
        lambda *a, **k: (np.eye(4, dtype=np.float32), False)
    for i, cam in enumerate(cams):
        fm = tracker.map_preprocess(cam, i)
        tracker.tracking(cam, fm)
    errs = [np.linalg.norm(tracker.pose_es[i][:3, 3]
                           - cams[i].pose_gt[:3, 3]) for i in range(n)]
    # pose-hold would end (n-1)*tx_step = 28 cm off; features must stay tight
    assert max(errs) < 0.015, errs
    assert tracker.orb_backend.last_track_ok()
