"""Projective point-to-plane ICP, fully jitted.

TPU-native reformulation of the reference tracker (``SLAM/icp.py``): the
per-level Gauss-Newton iteration runs inside ``lax.fori_loop`` with the 6x6
LM-damped system solved on device via ``jnp.linalg.solve`` (the reference
round-trips to CPU for the inverse, icp.py:313-325 — unnecessary on TPU).
Data association is nearest-neighbour projective warping with border clamp,
matching ``warp_features`` (icp.py:132-148, mode="nearest",
padding_mode="border", align_corners=True).

Twist convention [rot, trans] and the left-Jacobian exponential match
``exp_se3`` (icp.py:271-310) so poses are interchangeable with the reference.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import exp_se3
from . import preprocess


# ---------------------------------------------------------------------------
# planar (structure-of-planes) Gauss-Newton iteration
#
# TPU layout rationale (PERF.md round-3 table): any tensor whose trailing
# axis is 3 or 6 is lane-padded to 128 on materialization, so the original
# [H,W,3] formulation moved ~20-40x its logical bytes at every fusion
# boundary (8 per-corner gathers + the [HW,6] Jacobian per GN iteration).
# The rework: (a) the warped TARGET maps are packed ONCE per level into
# [HW, 8] rows (x,y,z,nx,ny,nz,0,0) so each bilinear corner is ONE row
# gather (row gathers vectorize across lanes; per-plane gathers would move
# one element per cycle); (b) all transform/projection/residual/Jacobian
# math runs on flat [N] planes (perfect lane utilization); (c) the damped
# normal equations come from ONE [7,N]x[N,7] MXU matmul (rows = 6 Jacobian
# planes + the residual), replacing the padded [HW,6] materializations.
# ---------------------------------------------------------------------------

_PACK = 8  # packed target row width (6 used + 2 sublane-friendly pad)


def pack_target(vertex: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] vertex + normal -> [H*W, 8] packed rows for row-gather warps."""
    N = vertex.shape[0] * vertex.shape[1]
    return jnp.concatenate(
        [vertex.reshape(N, 3), normal.reshape(N, 3),
         jnp.zeros((N, 2), vertex.dtype)], axis=1)


def _warp_packed(packed: jnp.ndarray, H: int, W: int,
                 u: jnp.ndarray, v: jnp.ndarray, association: str):
    """Sample the packed [HW, 8] target at real-valued pixel coords.

    Bilinear association (sub-pixel; divergence from the reference's nearest
    sampling, icp.py:132-148, whose ±0.5 px rounding puts a several-mm noise
    floor into the point-to-plane cost) with border clamp; any sample whose
    vertex (resp. normal) touches an invalid corner falls back to nearest
    for that part.  Returns six [N] planes (rx, ry, rz, rnx, rny, rnz)."""
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    near = jnp.take(packed, vi * W + ui, axis=0)       # [N, 8]
    if association != "bilinear":
        return tuple(near[:, c] for c in range(6))

    u = jnp.clip(u, 0.0, W - 1.0)
    v = jnp.clip(v, 0.0, H - 1.0)
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    du = u - u0
    dv = v - v0
    lin = v0 * W + u0
    f00 = jnp.take(packed, lin, axis=0)
    f01 = jnp.take(packed, lin + 1, axis=0)
    f10 = jnp.take(packed, lin + W, axis=0)
    f11 = jnp.take(packed, lin + W + 1, axis=0)
    w00 = (1 - dv) * (1 - du)
    w01 = (1 - dv) * du
    w10 = dv * (1 - du)
    w11 = dv * du

    def lerp(c):
        return (w00 * f00[:, c] + w01 * f01[:, c]
                + w10 * f10[:, c] + w11 * f11[:, c])

    # per-part corner validity (vertex: z channel; normal: nz channel),
    # matching the original per-map warp_bilinear fallbacks exactly
    vert_ok = ((f00[:, 2] != 0) & (f01[:, 2] != 0)
               & (f10[:, 2] != 0) & (f11[:, 2] != 0))
    norm_ok = ((f00[:, 5] != 0) & (f01[:, 5] != 0)
               & (f10[:, 5] != 0) & (f11[:, 5] != 0))
    rx, ry, rz = (jnp.where(vert_ok, lerp(c), near[:, c]) for c in (0, 1, 2))
    nx, ny, nz = (jnp.where(norm_ok, lerp(c), near[:, c]) for c in (3, 4, 5))
    # renormalize the interpolated normal (bilinear shortens it)
    inv = 1.0 / (jnp.sqrt(nx * nx + ny * ny + nz * nz) + 1e-8)
    return rx, ry, rz, nx * inv, ny * inv, nz * inv


def gn_iteration(pose10, src_planes, tgt_packed, H: int, W: int, K,
                 damping, distance_threshold, normal_threshold,
                 association: str, huber_delta: float = 0.02):
    """One damped Gauss-Newton step of projective point-to-plane ICP
    (reference icp.py:51-129 semantics; planar TPU formulation, see module
    banner).  ``src_planes`` = (x, y, z, nx, ny, nz) flat [N] planes of the
    source maps; ``tgt_packed`` = pack_target of the warped target maps.

    Residuals are Huber-weighted (w = min(1, δ/|r|), δ = 2 cm): point-to-
    plane residuals at association/occlusion boundaries are heavy-tailed,
    and an unweighted solve occasionally snaps into a wrong minimum (the
    reference's plain GN, icp.py:106-129, has the same failure mode)."""
    x0, y0, z0, nx0, ny0, nz0 = src_planes
    R, t = pose10[:3, :3], pose10[:3, 3]
    mask0 = z0 > 0.0

    # transform source points/normals into the target frame (flat FMAs)
    x = R[0, 0] * x0 + R[0, 1] * y0 + R[0, 2] * z0 + t[0]
    y = R[1, 0] * x0 + R[1, 1] * y0 + R[1, 2] * z0 + t[1]
    z = R[2, 0] * x0 + R[2, 1] * y0 + R[2, 2] * z0 + t[2]
    nx = R[0, 0] * nx0 + R[0, 1] * ny0 + R[0, 2] * nz0
    ny = R[1, 0] * nx0 + R[1, 1] * ny0 + R[1, 2] * nz0
    nz = R[2, 0] * nx0 + R[2, 1] * ny0 + R[2, 2] * nz0

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = (x / z_safe) * fx + cx
    v = (y / z_safe) * fy + cy
    inview = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1) & (z > 0)

    rx, ry, rz, rnx, rny, rnz = _warp_packed(tgt_packed, H, W, u, v,
                                             association)
    mask1 = rz > 0.0
    dx, dy, dz = x - rx, y - ry, z - rz
    normal_agree = (nx * rnx + ny * rny + nz * rnz) > normal_threshold
    res = rnx * dx + rny * dy + rnz * dz
    far = (dx * dx + dy * dy + dz * dz) > distance_threshold ** 2
    valid = (inview & ~far & mask0 & mask1 & normal_agree).astype(res.dtype)

    # J = [cross(p', n'), n'] (order [rot, trans], icp.py:51-104); the
    # normal equations JtJ/JtR come out of ONE [7,N]x[N,7] matmul over the
    # stacked J planes + residual row
    res = res * valid
    A = jnp.stack([
        (y * rnz - z * rny) * valid,
        (z * rnx - x * rnz) * valid,
        (x * rny - y * rnx) * valid,
        rnx * valid, rny * valid, rnz * valid,
        res,
    ])                                                  # [7, N]
    w = jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(res), 1e-12))
    M = (A * w[None, :]) @ A.T                          # [7, 7] via MXU
    JtJ = M[:6, :6]
    JtR = M[:6, 6]
    eye = jnp.eye(6, dtype=JtJ.dtype)
    Hm = JtJ + (jnp.trace(JtJ) * damping) * eye
    xi = -jnp.linalg.solve(Hm, JtR)
    return exp_se3(xi) @ pose10


@partial(jax.jit, static_argnames=("iters", "association"))
def icp_solve_all_levels(pose10, vertex1_pyr, vertex0_pyr, normal1_pyr,
                         normal0_pyr, K, downscales, iters,
                         damping: float, distance_threshold: float,
                         normal_threshold: float, association: str):
    """All pyramid levels + the failure metric in ONE executable.

    Each dispatch to the device costs a tunnel round trip in this
    environment (and real-hardware launch overhead), so the coarse-to-fine
    sweep (reference icp.py:429-441, one Python loop per level) is unrolled
    statically inside a single jit.  Returns (pose10, p2p_loss).
    """
    with jax.default_matmul_precision("highest"):
        for level, n_iter in enumerate(iters):
            Ks = K * downscales[level]
            Ks = Ks.at[2, 2].set(1.0)
            v1, v0 = vertex1_pyr[level], vertex0_pyr[level]
            n1, n0 = normal1_pyr[level], normal0_pyr[level]
            H, W = v1.shape[:2]
            # source planes + packed target, built once per level (loop-
            # invariant; hoisted out of the fori body by XLA)
            fv, fn = v1.reshape(-1, 3), n1.reshape(-1, 3)
            src = (fv[:, 0], fv[:, 1], fv[:, 2],
                   fn[:, 0], fn[:, 1], fn[:, 2])
            tgt = pack_target(v0, n0)

            def body(_, pose, src=src, tgt=tgt, H=H, W=W, Ks=Ks):
                return gn_iteration(
                    pose, src, tgt, H, W, Ks, damping,
                    distance_threshold, normal_threshold, association)

            pose10 = jax.lax.fori_loop(0, n_iter, body, pose10)

        p2p = point2plane_loss.__wrapped__(
            vertex0_pyr[-1],
            vertex1_pyr[-1] @ pose10[:3, :3].T + pose10[:3, 3],
            normal0_pyr[-1])
    return pose10, p2p


@jax.jit
def point2plane_loss(p_t0, p_t1, n_t0):
    """Mean squared point-to-plane distance (icp.py:7-13)."""
    d = jnp.sum((p_t1 - p_t0) * n_t0, axis=-1)
    return jnp.mean(d * d)


@partial(jax.jit, static_argnames=("levels",))
def build_icp_pyramids(depth: jnp.ndarray, K: jnp.ndarray, levels: int):
    """Depth -> per-level (vertex, normal) maps; max-pooled depth, intrinsics
    scaled per level (reference ``build_vertex_pyramid``, SLAM/utils.py:511-527)."""
    depths = preprocess.depth_pyramid(depth, levels, pool="max")
    vertex, normal = [], []
    for i, d in enumerate(depths):
        scale = 1.0 / (1 << (levels - 1 - i))
        Ks = K * scale
        Ks = Ks.at[2, 2].set(1.0)
        vm = preprocess.compute_vertex_map(d, Ks)
        vertex.append(vm)
        normal.append(preprocess.compute_normal_map(vm))
    return vertex, normal


class IcpTracker:
    """Pyramid ICP front-end holding the previous-frame (or model) pyramids.

    Mirrors the reference ``IcpTracker`` (icp.py:357-452): coarse-to-fine
    levels with per-level iteration counts, optional frame-to-model depth,
    and a point-to-plane loss based failure signal.
    """

    def __init__(self, args):
        self.downscales = list(args.icp_downscales)
        self.iters = list(args.icp_downscale_iters)
        self.levels = len(self.downscales)
        self.damping = float(args.icp_damping)
        self.distance_threshold = float(args.icp_distance_threshold)
        self.normal_threshold = float(np.cos(np.deg2rad(args.icp_normal_threshold)))
        self.sample_distance_threshold = float(args.icp_sample_distance_threshold)
        self.sample_normal_threshold = float(args.icp_sample_normal_threshold)
        self.fail_threshold = float(args.icp_fail_threshold)
        self.use_model_depth = bool(args.icp_use_model_depth)
        self.warmup_frames = int(args.icp_warmup_frames)
        self.association = str(getattr(args, "icp_association", "bilinear"))

        # constant-velocity prior: seed each solve with the previous relative
        # pose instead of identity (the reference starts at identity,
        # icp.py:428; a motion-model seed keeps coarse-level GN inside the
        # correct basin on low-texture geometry)
        self.use_motion_model = str(getattr(
            args, "icp_initializer", "constant_velocity")) == "constant_velocity"
        self.last_rel = np.eye(4, dtype=np.float32)

        self.K = None
        self.vertex_t0 = None
        self.normal_t0 = None
        self.vertex_t1 = None
        self.normal_t1 = None
        self.depth_t1 = None
        self.last_model_depth = None

    # -- per-frame state ----------------------------------------------------
    def update_curr_status(self, depth_t1: jnp.ndarray, K: jnp.ndarray) -> None:
        if self.K is None:
            self.K = jnp.asarray(K, jnp.float32)
        self.depth_t1 = depth_t1
        self.vertex_t1, self.normal_t1 = build_icp_pyramids(
            depth_t1, self.K, self.levels)

    def move_last_status(self) -> None:
        self.vertex_t0 = self.vertex_t1
        self.normal_t0 = self.normal_t1
        self.last_model_depth = self.depth_t1

    def update_last_status(self, render_depth, frame_depth, render_normal, frame_normal):
        """Fuse rendered model depth with the sensor depth for the next
        frame's target pyramid (reference icp.py:397-415)."""
        self.last_model_depth = fuse_model_depth(
            render_depth, frame_depth, render_normal, frame_normal,
            self.sample_distance_threshold, self.sample_normal_threshold)

    # -- pose estimation ----------------------------------------------------
    def predict_pose(self, depth_t1=None) -> Tuple[np.ndarray, bool]:
        """Estimate the relative pose T_{t0<-t1} and a success flag."""
        if self.vertex_t0 is None:
            return np.eye(4), True
        self.frame_count = getattr(self, "frame_count", 0) + 1
        if (self.use_model_depth and self.last_model_depth is not None
                and self.frame_count >= self.warmup_frames):
            self.vertex_t0, self.normal_t0 = build_icp_pyramids(
                self.last_model_depth, self.K, self.levels)

        pose10 = (jnp.asarray(self.last_rel) if self.use_motion_model
                  else jnp.eye(4, dtype=jnp.float32))
        pose10, p2p = icp_solve_all_levels(
            pose10, tuple(self.vertex_t1), tuple(self.vertex_t0),
            tuple(self.normal_t1), tuple(self.normal_t0),
            self.K, jnp.asarray(self.downscales, jnp.float32),
            tuple(self.iters), self.damping,
            self.distance_threshold, self.normal_threshold, self.association)
        success = bool(p2p <= self.fail_threshold)
        pose_np = np.asarray(pose10, np.float32)
        if not success and self.use_motion_model:
            # The residual metric is unmasked (reference icp.py:444-447) and
            # inflates near depth/occlusion edges, so treat it as a
            # *suspicion* signal rather than ground truth:
            #   * no trusted prior yet (first tracked frame) -> accept the
            #     solve and seed the prior (gating against a stale identity
            #     prior would otherwise coast forever on fast sequences);
            #   * solve stayed near the constant-velocity prediction ->
            #     accept it, the metric was just noisy;
            #   * solve jumped away from the prediction -> HARD failure:
            #     coast on the prediction and report False so the caller can
            #     relocalize / fall back to the feature backend (the
            #     reference keeps diverged poses, which offsets the whole
            #     remaining trajectory).
            if not getattr(self, "prior_valid", False):
                self.last_rel = pose_np
                self.prior_valid = True
                return pose_np, True
            delta = np.linalg.norm(pose_np[:3, 3] - self.last_rel[:3, 3])
            cosang = np.clip(
                (np.trace(pose_np[:3, :3].T @ self.last_rel[:3, :3]) - 1) / 2,
                -1, 1)
            ang = np.degrees(np.arccos(cosang))
            if delta > 0.01 or ang > 1.0:
                return np.asarray(self.last_rel), False
            self.last_rel = pose_np
            return pose_np, True
        if success:
            self.last_rel = pose_np
            self.prior_valid = True
        else:
            self.last_rel = np.eye(4, dtype=np.float32)
        return pose_np, success

    def reset_prior(self, rel: np.ndarray) -> None:
        """Re-seed the constant-velocity prior after an external pose fix
        (relocalization / backend correction)."""
        self.last_rel = np.asarray(rel, np.float32)
        self.prior_valid = True


@jax.jit
def fuse_model_depth(render_depth, frame_depth, render_normal, frame_normal,
                     sample_distance_threshold, sample_normal_threshold):
    """Fill model-rendered depth with sensor depth where the model disagrees
    or is empty (reference icp.py:397-415)."""
    rd = render_depth[..., 0] if render_depth.ndim == 3 else render_depth
    fd = frame_depth[..., 0] if frame_depth.ndim == 3 else frame_depth
    cos = jnp.sum(
        render_normal * frame_normal, axis=-1
    ) / (jnp.linalg.norm(render_normal, axis=-1) *
         jnp.linalg.norm(frame_normal, axis=-1) + 1e-8)
    normal_mask = (1.0 - cos) > sample_normal_threshold
    fill = ((jnp.abs(rd - fd) > sample_distance_threshold)
            | (rd == 0)
            | normal_mask) & (fd > 0)
    return jnp.where(fill, fd, rd)[..., None]
