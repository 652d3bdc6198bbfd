"""Sub-frame (row-band) dispatch: run full-resolution frames through
executables compiled at a fraction of the frame size.

Why: the tunneled TPU worker in this environment crashes on any single
dispatch whose frame is >= ~340x600 (environmental — the same executables
compile clean for the TPU target, ROOFLINE.json ``fullres``).  The
reference never needs this (its CUDA rasterizer streams tiles from one
kernel launch), but a flaky-worker deployment needs full-res frames split
across SMALL dispatches with state carried between them.

The split is exact pinhole geometry, not an approximation: cropping rows
[r0, r0+bh) of an image is the SAME camera with the principal point
shifted (cy' = cy - r0) and the vertical FoV rescaled to the band height
(fy unchanged: FoVy' = focal2fov(fy, bh)).  A world point that lands on
pixel (u, v) of the full frame lands on (u, v - r0) of its band — so
mapping a frame band-by-band against the shared global map touches
exactly the pixels the full-frame dispatch would, in N pieces
(test_bands.py pins this projection identity).

Tracking runs once per frame on a stride-downsampled copy (integer
stride keeps FoV and metric depth; ICP at 1/s resolution is the bench
operating point), then every band maps with the tracked pose.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..utils import geometry
from .camera import Camera


def downsample_camera(cam: Camera, stride: int, uid: int | None = None) -> Camera:
    """Integer-stride downsample (same FoV, same metric depth — row/col
    subsampling, no averaging across depth edges)."""
    if stride == 1:
        return cam
    h, w = cam.image_height, cam.image_width
    cx = cam.cx if cam.cx is not None else w / 2
    cy = cam.cy if cam.cy is not None else h / 2
    return Camera(
        uid=cam.uid if uid is None else uid,
        R=cam.R, T=cam.T, FoVx=cam.FoVx, FoVy=cam.FoVy,
        image=np.ascontiguousarray(cam.image[::stride, ::stride]),
        depth=np.ascontiguousarray(cam.depth[::stride, ::stride]),
        image_name=cam.image_name, cx=cx / stride, cy=cy / stride,
        timestamp=cam.timestamp, depth_scale=cam.depth_scale,
        pose_gt=cam.pose_gt, znear=cam.znear, zfar=cam.zfar,
    )


def split_bands(cam: Camera, n_bands: int, rotate: int = 0) -> List[Camera]:
    """Split a frame into ``n_bands`` equal row bands (H % n_bands == 0),
    each an exact pinhole camera of the same pose.

    ``rotate`` cycles the band ORDER (band ``rotate % n`` first): the
    mapper's keyframe test passes at most one band per keyframe pose (the
    rest have zero pose delta), so rotating which band leads makes the
    keyframe store sample every band over time instead of always row 0.
    """
    if n_bands == 1:
        return [cam]
    h, w = cam.image_height, cam.image_width
    if h % n_bands:
        raise ValueError(f"H={h} not divisible by n_bands={n_bands}")
    bh = h // n_bands
    fy = geometry.fov2focal(cam.FoVy, h)
    cx = cam.cx if cam.cx is not None else w / 2
    cy = cam.cy if cam.cy is not None else h / 2
    bands = []
    for b in range(n_bands):
        r0 = b * bh
        band = Camera(
            uid=cam.uid, R=cam.R, T=cam.T,
            FoVx=cam.FoVx, FoVy=geometry.focal2fov(fy, bh),
            image=np.ascontiguousarray(cam.image[r0:r0 + bh]),
            depth=np.ascontiguousarray(cam.depth[r0:r0 + bh]),
            image_name=f"{cam.image_name}#band{b}",
            cx=cx, cy=cy - r0,
            timestamp=cam.timestamp, depth_scale=cam.depth_scale,
            pose_gt=cam.pose_gt, znear=cam.znear, zfar=cam.zfar,
        )
        bands.append(band)
    k = rotate % n_bands
    return bands[k:] + bands[:k]
