"""Native C++ pose backend tests (builds on demand via make)."""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "native", "build", "libpose_backend.so")


@pytest.fixture(scope="module")
def backend():
    if not os.path.exists(LIB):
        subprocess.run(["make"], cwd=os.path.join(REPO, "native"), check=True)
    from rtgslam_tpu.slam.native_backend import NativePoseBackend

    b = NativePoseBackend(LIB)
    b.initialize(True)
    return b


def _rel(t):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = t
    return T


def test_trajectory_integration(backend):
    backend.process_image_rgbd(None, None, 0.0)
    backend.track_with_icp_pose(None, None, _rel([0.01, 0, 0]), 1.0)
    backend.track_with_icp_pose(None, None, _rel([0.01, 0, 0]), 2.0)
    backend.track_with_orb_feature(None, None, 3.0)
    from rtgslam_tpu.slam.tracker import convert_poses

    poses, stamps = convert_poses(backend.get_trajectory_points())
    assert len(poses) == 4
    assert np.allclose(poses[2][:3, 3], [0.02, 0, 0], atol=1e-9)
    assert np.allclose(poses[3][:3, 3], poses[2][:3, 3])  # feature-track holds
    assert stamps == [0.0, 1.0, 2.0, 3.0]


def test_loop_closure_reduces_drift():
    if not os.path.exists(LIB):
        subprocess.run(["make"], cwd=os.path.join(REPO, "native"), check=True)
    from rtgslam_tpu.slam.native_backend import NativePoseBackend
    from rtgslam_tpu.slam.tracker import convert_poses

    b = NativePoseBackend(LIB)
    b.initialize(True)
    b.process_image_rgbd(None, None, 0.0)
    # odometry with a small systematic drift along x; true loop: end == start
    n = 20
    for i in range(1, n):
        b.track_with_icp_pose(None, None, _rel([0.1 + 0.01, 0, 0]), float(i))
    poses, _ = convert_poses(b.get_trajectory_points())
    drift_before = np.linalg.norm(poses[-1][:3, 3] - np.array([0.1 * (n - 1), 0, 0]))
    # loop constraint: frame n-1 truly sits at 1.9m from frame 0
    T_true = np.eye(4)
    T_true[:3, 3] = [0.1 * (n - 1), 0, 0]
    b.add_loop_constraint(0, n - 1, T_true, weight=20.0, iterations=200)
    poses2, _ = convert_poses(b.get_trajectory_points())
    drift_after = np.linalg.norm(poses2[-1][:3, 3] - np.array([0.1 * (n - 1), 0, 0]))
    assert drift_after < drift_before * 0.3
    # gauge fixed: first pose unchanged
    assert np.allclose(poses2[0], np.eye(4), atol=1e-9)
