"""ctypes binding for the native C++ pose backend (native/pose_backend.cc).

Presents the orbslam2-binding API surface (reference call sites
``SLAM/multiprocess/tracker.py:225-260``) over the C library, plus the
pose-graph loop-closure hook (``add_loop_constraint``) whose corrected
trajectory the mapper re-applies via ``update_poses``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np


class NativePoseBackend:
    def __init__(self, lib_path: str, vocab_path: str = "", settings_path: str = ""):
        self._lib = ctypes.CDLL(os.path.abspath(lib_path))
        self._lib.pb_create.restype = ctypes.c_void_p
        for name, argtypes in {
            "pb_destroy": [ctypes.c_void_p],
            "pb_initialize": [ctypes.c_void_p, ctypes.c_int],
            "pb_shutdown": [ctypes.c_void_p],
            "pb_set_camera": [ctypes.c_void_p, ctypes.c_double,
                              ctypes.c_double, ctypes.c_double,
                              ctypes.c_double, ctypes.c_int, ctypes.c_int,
                              ctypes.c_double],
            "pb_process_image_rgbd": [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_double],
            "pb_track_with_icp_pose": [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_double],
            "pb_track_with_orb_feature": [ctypes.c_void_p, ctypes.c_void_p,
                                          ctypes.c_void_p, ctypes.c_double],
            "pb_set_window_ba": [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                 ctypes.c_int, ctypes.c_int],
            "pb_add_loop_constraint": [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_double),
                                       ctypes.c_double, ctypes.c_int],
            "pb_get_trajectory": [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double)],
            "pb_get_keyframes": [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double)],
        }.items():
            getattr(self._lib, name).argtypes = argtypes
        self._lib.pb_trajectory_size.restype = ctypes.c_int
        self._lib.pb_trajectory_size.argtypes = [ctypes.c_void_p]
        self._lib.pb_last_track_ok.restype = ctypes.c_int
        self._lib.pb_last_track_ok.argtypes = [ctypes.c_void_p]
        self._lib.pb_last_track_inliers.restype = ctypes.c_int
        self._lib.pb_last_track_inliers.argtypes = [ctypes.c_void_p]
        self._lib.pb_keyframe_size.restype = ctypes.c_int
        self._lib.pb_keyframe_size.argtypes = [ctypes.c_void_p]
        self._h = self._lib.pb_create()

    def __del__(self):
        try:
            self._lib.pb_destroy(self._h)
        except Exception:
            pass

    # -- orbslam2 API -------------------------------------------------------
    def set_use_viewer(self, flag: bool) -> None:
        pass

    def initialize(self, useicp: bool) -> None:
        self._lib.pb_initialize(self._h, int(useicp))

    def shutdown(self) -> None:
        self._lib.pb_shutdown(self._h)

    def set_window_ba(self, enable: bool, window: int = -1,
                      every: int = -1, iters: int = -1) -> None:
        """Windowed refinement of recent poses over cross-frame feature
        tracks (the local-BA role of the reference backend, reference
        tracker.py:225-241; native/pose_backend.cc::window_refine).  Pass
        -1 to keep a knob's current value."""
        self._lib.pb_set_window_ba(self._h, int(enable), int(window),
                                   int(every), int(iters))

    def set_camera(self, K: np.ndarray, width: int, height: int,
                   depth_scale: float = 1000.0) -> None:
        """Intrinsics + raw-depth scale; required for real feature tracking
        (without it track_with_orb_feature degrades to pose-hold)."""
        K = np.asarray(K, np.float64)
        self._lib.pb_set_camera(self._h, float(K[0, 0]), float(K[1, 1]),
                                float(K[0, 2]), float(K[1, 2]),
                                int(width), int(height), float(depth_scale))

    @staticmethod
    def _img_ptrs(color, depth):
        """(color_u8 [H,W,3], depth_u16) -> C pointers; None -> null."""
        if color is None or depth is None:
            return None, None, ctypes.c_void_p(), ctypes.c_void_p()
        c = np.ascontiguousarray(color, dtype=np.uint8)
        d = np.ascontiguousarray(depth, dtype=np.uint16)
        return (c, d, ctypes.c_void_p(c.ctypes.data),
                ctypes.c_void_p(d.ctypes.data))

    def process_image_rgbd(self, color, depth, timestamp: float) -> None:
        c, d, cp, dp = self._img_ptrs(color, depth)
        self._lib.pb_process_image_rgbd(self._h, cp, dp, float(timestamp))

    def track_with_icp_pose(self, color, depth, pose_rel: np.ndarray,
                            timestamp: float) -> None:
        arr = np.ascontiguousarray(pose_rel, dtype=np.float32)
        c, d, cp, dp = self._img_ptrs(color, depth)
        self._lib.pb_track_with_icp_pose(
            self._h, cp, dp,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            float(timestamp))

    def track_with_orb_feature(self, color, depth, timestamp: float) -> None:
        c, d, cp, dp = self._img_ptrs(color, depth)
        self._lib.pb_track_with_orb_feature(self._h, cp, dp, float(timestamp))

    def last_track_ok(self) -> bool:
        return bool(self._lib.pb_last_track_ok(self._h))

    def last_track_inliers(self) -> int:
        return int(self._lib.pb_last_track_inliers(self._h))

    def add_loop_constraint(self, i: int, j: int, T_ij: np.ndarray,
                            weight: float = 1.0, iterations: int = 50) -> None:
        arr = np.ascontiguousarray(T_ij, dtype=np.float64)
        self._lib.pb_add_loop_constraint(
            self._h, int(i), int(j),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(weight), int(iterations))

    def _rows(self, size_fn, get_fn):
        n = size_fn(self._h)
        out = np.zeros((n, 13), np.float64)
        if n:
            get_fn(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return [tuple(row) for row in out]

    def get_trajectory_points(self):
        return self._rows(self._lib.pb_trajectory_size, self._lib.pb_get_trajectory)

    def get_keyframe_points(self):
        return self._rows(self._lib.pb_keyframe_size, self._lib.pb_get_keyframes)
