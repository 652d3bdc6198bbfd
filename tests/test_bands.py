"""Sub-frame (row-band) dispatch: geometry identity + banded e2e.

The band split (data/bands.py) exists so full-resolution frames can run
on a worker that crashes on large single dispatches (slam.py --bands N):
tracking once per frame on a stride-downsampled copy, mapping per band
with a shifted-principal-point camera against the shared map.
"""

import copy

import numpy as np
import pytest

from rtgslam_tpu.data.bands import downsample_camera, split_bands


def test_band_projection_identity(synthetic_cams):
    """A world point on full-frame pixel (u, v) lands on (u, v - r0) of
    the band containing row v — the split is exact pinhole geometry."""
    cam = synthetic_cams[0]
    H, W = cam.image_height, cam.image_width
    n = 4
    bands = split_bands(cam, n)
    assert [b.image_height for b in bands] == [H // n] * n

    # lift a grid of valid-depth pixels to world via the camera itself
    d = np.asarray(cam.depth[..., 0])
    vs, us = np.nonzero(d > 0.1)
    pick = slice(0, len(vs), max(1, len(vs) // 200))
    vs, us = vs[pick], us[pick]
    K = cam.intrinsic
    pts_c = np.stack([(us + 0.5 - K[0, 2]) / K[0, 0] * d[vs, us],
                      (vs + 0.5 - K[1, 2]) / K[1, 1] * d[vs, us],
                      d[vs, us]], axis=1)
    c2w = cam.c2w
    pts_w = pts_c @ c2w[:3, :3].T + c2w[:3, 3]

    uv_full = cam.get_uv(pts_w)
    bh = H // n
    for b, band in enumerate(bands):
        rows = (vs >= b * bh) & (vs < (b + 1) * bh)
        if not rows.any():
            continue
        uv_band = band.get_uv(pts_w[rows])
        assert np.array_equal(uv_band[:, 0], uv_full[rows][:, 0])
        assert np.array_equal(uv_band[:, 1], uv_full[rows][:, 1] - b * bh)


def test_downsample_keeps_rays(synthetic_cams):
    """Stride-downsampling preserves the pixel->ray mapping: pixel (u, v)
    of the strided camera sees the same ray as (s*u, s*v) of the full."""
    cam = synthetic_cams[0]
    s = 2
    small = downsample_camera(cam, s)
    assert small.image_height == cam.image_height // s
    d = np.asarray(cam.depth[::s, ::s, 0])
    vs, us = np.nonzero(d > 0.1)
    vs, us = vs[::37], us[::37]
    Ks, Kf = small.intrinsic, cam.intrinsic
    # ray dirs in camera frame (pixel centres differ by the stride shift,
    # use the corner convention: strided pixel u covers full pixel s*u)
    ray_s = np.stack([(us + 0.5 - Ks[0, 2]) / Ks[0, 0],
                      (vs + 0.5 - Ks[1, 2]) / Ks[1, 1]], axis=1)
    ray_f = np.stack([(s * us + 0.5 * s - Kf[0, 2]) / Kf[0, 0],
                      (s * vs + 0.5 * s - Kf[1, 2]) / Kf[1, 1]], axis=1)
    np.testing.assert_allclose(ray_s, ray_f, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(small.depth),
                                  np.asarray(cam.depth)[::s, ::s])


@pytest.mark.slow
def test_banded_e2e(base_args, synthetic_cams):
    """The slam.py --bands loop: track downsampled, map per band; the map
    covers the full view and tracking stays sub-centimetre."""
    import jax.numpy as jnp

    from rtgslam_tpu.config import OptimizationParams
    from rtgslam_tpu.ops.rasterize.api import RasterSettings
    from rtgslam_tpu.slam import Mapper, Tracker
    from rtgslam_tpu.slam.tracker import preprocess_and_lift

    args = copy.deepcopy(base_args)
    args.use_gt_pose = False
    args.icp_use_model_depth = True
    opt = OptimizationParams().extract(args)
    tracker = Tracker(args)
    mapper = Mapper(args)
    n_bands, stride = 2, 2
    track_settings = None
    for i, cam in enumerate(synthetic_cams):
        track_cam = downsample_camera(cam, stride)
        if track_settings is None:
            track_settings = RasterSettings.from_args(
                args, track_cam.image_height, track_cam.image_width)
        fm = tracker.map_preprocess(track_cam, i)
        tracker.tracking(track_cam, fm)
        cam.update(track_cam.R, track_cam.T)
        bands = split_bands(cam, n_bands, rotate=i)
        for bcam in bands:
            bfm = preprocess_and_lift(
                jnp.asarray(bcam.depth, jnp.float32),
                jnp.asarray(bcam.image, jnp.float32),
                jnp.asarray(bcam.intrinsic),
                jnp.asarray(bcam.c2w, jnp.float32),
                args.min_depth, args.max_depth,
                tracker.invalid_confidence_thresh, tracker.depth_filter)
            bfm["time"] = i
            mapper.mapping(bcam, bfm, i, opt)
            mapper.time += 1
        out = mapper._render(track_cam.device_dict(), "global",
                             settings=track_settings)
        mapper._set_model_map(out)
        tracker.update_last_status(
            track_cam, mapper.model_map["render_depth"], fm["depth_map"],
            mapper.model_map["render_normal"], fm["normal_map_w"])

    assert tracker.eval_ate() < 1.0
    assert mapper.get_unstable_num + mapper.get_stable_num > 500

    # the banded map must cover the FULL view: render the final full-res
    # camera (render-only, any size) and check coverage in BOTH halves
    full_settings = RasterSettings.from_args(
        args, synthetic_cams[-1].image_height, synthetic_cams[-1].image_width)
    out = mapper._render(synthetic_cams[-1].device_dict(), "global",
                         settings=full_settings)
    T = np.asarray(out["T_map"])[..., 0]
    H = T.shape[0]
    assert (T[: H // 2] < 0.3).mean() > 0.25, "top half uncovered"
    assert (T[H // 2:] < 0.3).mean() > 0.25, "bottom half uncovered"
