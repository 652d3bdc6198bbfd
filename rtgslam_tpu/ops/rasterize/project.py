"""EWA projection of 3D Gaussians to screen space.

Replaces the projection stage of the reference CUDA rasterizer
(``diff-gaussian-rasterization-depth``, interface at ``SLAM/render.py:60-128``)
with batched jnp: one fused pass computes view-space depth, pixel means, 2D
conics, radii, SH colors, and visibility/eligibility masks for the whole
fixed-capacity gaussian array.  Everything is differentiable by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...utils import sh as sh_utils
from ...utils.geometry import quat_to_rotmat

# Low-pass dilation added to 2D covariances (standard 3DGS EWA practice:
# guarantees a footprint of at least ~one pixel against aliasing).
COV2D_DILATION = 0.3
DEPTH_NEAR = 0.2


class Projected(NamedTuple):
    """Per-gaussian screen-space quantities, all [P] or [P, k]."""

    mean2d: jnp.ndarray   # [P, 2] pixel coordinates
    conic: jnp.ndarray    # [P, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # [P] view-space z
    radius: jnp.ndarray   # [P] screen-space 3-sigma radius (pixels)
    rgb: jnp.ndarray      # [P, 3] SH-evaluated color (clamped >= 0)
    opacity: jnp.ndarray  # [P]
    normal_elig: jnp.ndarray  # [P] bool: passes the opaque-normal gate
    visible: jnp.ndarray  # [P] bool


def project(
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    normal: jnp.ndarray,
    alive: jnp.ndarray,
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    campos: jnp.ndarray,
    width: int,
    height: int,
    sh_degree: int,
    normal_threshold: float,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project activated gaussians into screen space.

    ``scaling``/``opacity``/``rotation`` are already activated (exp/sigmoid/
    normalize), matching the data handed to the reference rasterizer by
    ``Mapping.global_params`` (mapper.py:1081-1108).
    """
    R, t = w2c[:3, :3], w2c[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # view transform in true f32: bf16 would put ~mm noise in rendered depth
    p_view = jnp.matmul(xyz, R.T, precision=jax.lax.Precision.HIGHEST) + t
    x, y, z = p_view[..., 0], p_view[..., 1], p_view[..., 2]
    in_front = z > DEPTH_NEAR
    z_safe = jnp.where(in_front, z, 1.0)

    mean2d = jnp.stack([fx * x / z_safe + cx, fy * y / z_safe + cy], axis=-1)

    # EWA: cov2d = J W cov3d Wᵀ Jᵀ with the standard frustum-clamped Jacobian.
    tan_x, tan_y = (width / 2) / fx, (height / 2) / fy
    tx = jnp.clip(x / z_safe, -1.3 * tan_x, 1.3 * tan_x) * z_safe
    ty = jnp.clip(y / z_safe, -1.3 * tan_y, 1.3 * tan_y) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(z)
    J = jnp.stack([
        jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
        jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
    ], axis=-2)                                   # [P, 2, 3]

    Rq = quat_to_rotmat(rotation)                  # [P, 3, 3]
    RS = Rq * (scaling * scale_modifier)[..., None, :]
    with jax.default_matmul_precision("highest"):
        M = (J @ R) @ RS                           # [P, 2, 3]
        cov2d = M @ jnp.swapaxes(M, -1, -2)        # [P, 2, 2]
    a = cov2d[..., 0, 0] + COV2D_DILATION
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + COV2D_DILATION

    det = a * c - b * b
    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # SH color along the actual viewing direction (grad-safe normalization:
    # dead rows can sit exactly at the camera origin).
    dirs = xyz - campos
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    rgb = jnp.maximum(sh_utils.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    # Opaque-depth eligibility: the paper's single-opaque-gaussian depth only
    # counts gaussians whose disc faces the camera within
    # renderer_normal_threshold degrees (settings normal_threshold = cos θ,
    # render.py:38-40,81).
    normal_elig = jnp.abs(jnp.sum(normal * dirs, axis=-1)) >= normal_threshold

    on_screen = (
        (mean2d[..., 0] + radius > 0)
        & (mean2d[..., 0] - radius < width)
        & (mean2d[..., 1] + radius > 0)
        & (mean2d[..., 1] - radius < height)
    )
    visible = alive & in_front & det_ok & (radius > 0) & on_screen

    return Projected(
        mean2d=mean2d,
        conic=conic,
        depth=z,
        radius=jnp.where(visible, radius, 0.0),
        rgb=rgb,
        opacity=opacity.reshape(-1),
        normal_elig=normal_elig,
        visible=visible,
    )
