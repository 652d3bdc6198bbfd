"""Host-side pose-refinement backend with the orbslam2 binding API.

The reference refines ICP poses with an ORB-SLAM2 C++ backend reached
through a Boost.Python binding (``thirdParty/ORB-SLAM2-PYBIND``, call sites
``SLAM/multiprocess/tracker.py:225-260``).  The binding API is:

    System(vocab_path, settings_path, sensor)
    .set_use_viewer(bool)
    .initialize(useicp)
    .process_image_rgbd(color_u8, depth_u16, timestamp)
    .track_with_icp_pose(color_u8, depth_u16, pose_t1_t0_f32, timestamp)
    .track_with_orb_feature(color_u8, depth_u16, timestamp)
    .get_trajectory_points() / .get_keyframe_points()
        -> rows (stamp, r00,r01,r02,t0, r10,r11,r12,t1, r20,r21,r22,t2)
    .shutdown()

This module provides:
  * :class:`FakePoseBackend` — an in-process implementation of the exact API
    that integrates the ICP relative poses it is fed (and holds the last
    pose on feature-track fallback).  It exists so the full ICP+backend code
    path is exercised without the C++ dependency, mirroring the fake-backend
    strategy recommended in SURVEY.md §4.
  * :func:`create_backend` — loads the native backend if the shared library
    built from ``native/pose_backend`` is present, else the fake.

A real TPU deployment keeps this backend on the host CPU exactly like the
reference does — poses are 4x4 matrices and cost nothing to transfer.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np


def _pose_to_row(stamp: float, pose: np.ndarray):
    r = pose[:3, :3]
    t = pose[:3, 3]
    return (stamp,
            r[0, 0], r[0, 1], r[0, 2], t[0],
            r[1, 0], r[1, 1], r[1, 2], t[1],
            r[2, 0], r[2, 1], r[2, 2], t[2])


class FakePoseBackend:
    """Drop-in orbslam2.System replacement that trusts the ICP odometry."""

    def __init__(self, vocab_path: str = "", settings_path: str = "", sensor=None):
        self._poses: List[np.ndarray] = []
        self._stamps: List[float] = []
        self._keyframe_every = 10
        self._use_icp = True
        self._running = False

    # -- lifecycle ---------------------------------------------------------
    def set_use_viewer(self, flag: bool) -> None:
        pass

    def initialize(self, useicp: bool) -> None:
        self._use_icp = useicp
        self._running = True

    def shutdown(self) -> None:
        self._running = False

    # -- tracking ----------------------------------------------------------
    def process_image_rgbd(self, color, depth, timestamp: float) -> None:
        self._poses.append(np.eye(4))
        self._stamps.append(timestamp)

    def track_with_icp_pose(self, color, depth, pose_t1_t0: np.ndarray,
                            timestamp: float) -> None:
        prev = self._poses[-1] if self._poses else np.eye(4)
        self._poses.append(prev @ np.asarray(pose_t1_t0, np.float64))
        self._stamps.append(timestamp)

    def track_with_orb_feature(self, color, depth, timestamp: float) -> None:
        prev = self._poses[-1] if self._poses else np.eye(4)
        self._poses.append(prev.copy())
        self._stamps.append(timestamp)

    # -- trajectory --------------------------------------------------------
    def get_trajectory_points(self):
        return [_pose_to_row(s, p) for s, p in zip(self._stamps, self._poses)]

    def get_keyframe_points(self):
        rows = list(zip(self._stamps, self._poses))
        return [_pose_to_row(s, p) for s, p in rows[:: self._keyframe_every]]


def create_backend(args):
    """Native backend if built, fake otherwise."""
    lib = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                       "build", "libpose_backend.so")
    if os.path.exists(lib):
        from .native_backend import NativePoseBackend

        backend = NativePoseBackend(lib, args.orb_vocab_path, args.orb_settings_path)
    else:
        backend = FakePoseBackend(args.orb_vocab_path, args.orb_settings_path)
    backend.set_use_viewer(False)
    backend.initialize(getattr(args, "orb_useicp", True))
    return backend
