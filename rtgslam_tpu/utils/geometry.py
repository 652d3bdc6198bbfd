"""Geometry primitives: quaternions, rotations, SE(3), camera matrices.

All functions are pure jnp and jit/vmap friendly.  Conventions follow the
reference implementation so saved artifacts interoperate:

* quaternions are (w, x, y, z), unnormalized storage, normalized on use
  (reference ``utils/general_utils.py`` ``build_rotation``);
* world-to-view and projection matrices follow the 3DGS GL-style transposed
  layout (reference ``utils/graphics_utils.py:54-90``);
* ``exp_se3`` matches the reference twist order [rot, trans]
  (reference ``SLAM/icp.py:271-310``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quaternions / rotations
# ---------------------------------------------------------------------------

def normalize(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Safe normalization: finite value AND finite gradient at v = 0
    (sqrt(sum + eps^2) instead of norm + eps, whose vjp is inf at zero)."""
    norm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps * eps)
    return v / norm


def quat_to_rotmat_cols(q: jnp.ndarray):
    """Batched unit-quaternion (w,x,y,z) -> the 9 rotation-matrix entries as
    separate [...] columns (row-major r00..r22).

    The stacked [..., 3, 3] form pads each 3-sized axis to a full TPU
    register tile ((8, 128) for f32), inflating every touch of the array
    ~14x; per-entry columns stay 1-D and fuse into their consumers."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Batched unit-quaternion (w,x,y,z) -> rotation matrix [..., 3, 3]."""
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """axis [..., 3] (unit), angle [..., 1] -> quaternion (w,x,y,z)."""
    half = angle * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)
    return jnp.concatenate([w, xyz], axis=-1)


def quat_align_z_to(normal: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating +z onto ``normal`` (reference
    ``SLAM/utils.py:216-221`` ``compute_rot``)."""
    z = jnp.zeros_like(normal).at[..., 2].set(1.0)
    axis = jnp.cross(z, normal)
    axis = normalize(axis)
    cosang = jnp.clip(jnp.sum(z * normal, axis=-1, keepdims=True), -1.0, 1.0)
    angle = jnp.arccos(cosang)
    q = quat_from_axis_angle(axis, angle)
    # Degenerate: normal ~ ±z -> identity (or 180° about x).
    near_parallel = jnp.linalg.norm(jnp.cross(z, normal), axis=-1, keepdims=True) < 1e-6
    flip = cosang < 0
    q_id = jnp.concatenate([jnp.ones_like(cosang), jnp.zeros_like(normal)], axis=-1)
    q_pi = jnp.concatenate(
        [jnp.zeros_like(cosang), jnp.ones_like(cosang), jnp.zeros_like(cosang), jnp.zeros_like(cosang)],
        axis=-1,
    )
    fallback = jnp.where(flip, q_pi, q_id)
    return jnp.where(near_parallel, fallback, q)


def build_covariance(scaling: jnp.ndarray, rotation_q: jnp.ndarray) -> jnp.ndarray:
    """3D covariance R S Sᵀ Rᵀ from per-gaussian scales [...,3] and quats [...,4]."""
    R = quat_to_rotmat(rotation_q)
    RS = R * scaling[..., None, :]
    return RS @ jnp.swapaxes(RS, -1, -2)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def skew(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    zero = jnp.zeros_like(w[..., 0])
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            jnp.stack([zero, -w2, w1], axis=-1),
            jnp.stack([w2, zero, -w0], axis=-1),
            jnp.stack([-w1, w0, zero], axis=-1),
        ],
        axis=-2,
    )


def exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist [rot(3), trans(3)] -> 4x4 transform.

    Matches reference ``SLAM/icp.py:271-310`` including the left-Jacobian
    applied to the translational part; the small-angle branch is handled with
    ``where`` so the function is jittable and NaN-free.
    """
    w = xi[:3]
    v = xi[3:6]
    theta = jnp.linalg.norm(w)
    w_hat = skew(w)
    w_hat2 = w_hat @ w_hat

    eps = 1e-8
    safe = jnp.maximum(theta, eps)
    sin_t, cos_t = jnp.sin(safe), jnp.cos(safe)
    A = sin_t / safe
    B = (1.0 - cos_t) / (safe * safe)
    C = (safe - sin_t) / (safe ** 3)

    eye = jnp.eye(3, dtype=xi.dtype)
    small = theta <= eps
    R = jnp.where(small, eye, eye + A * w_hat + B * w_hat2)
    J = jnp.where(small, eye, eye + B * w_hat + C * w_hat2)

    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(J @ v)
    return T


# ---------------------------------------------------------------------------
# Camera matrices (numpy, host side — poses are tiny)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.zeros(3), scale: float = 1.0) -> np.ndarray:
    """w2c 4x4 from colmap-style (R=c2w rotation, t=w2c translation); the
    optional recenter/scale matches reference ``getWorld2View2``."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
    return np.float32(np.linalg.inv(C2W))


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """GL-style perspective projection (reference ``getProjectionMatrix``)."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top, right = tan_y * znear, tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def rot_compare(prev_rot: np.ndarray, curr_rot: np.ndarray):
    """Angle (rad, deg) between two rotations (reference ``SLAM/utils.py:42-47``)."""
    rot_diff = prev_rot.T @ curr_rot
    cos_theta = np.clip((np.trace(rot_diff) - 1) / 2, -1.0, 1.0)
    rad = np.arccos(cos_theta)
    return rad, np.rad2deg(rad)


def trans_compare(prev_t: np.ndarray, curr_t: np.ndarray):
    diff = prev_t - curr_t
    return np.linalg.norm(diff, ord=1), np.linalg.norm(diff, ord=2)
