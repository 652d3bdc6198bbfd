"""EWA projection of 3D Gaussians to screen space.

Replaces the projection stage of the reference CUDA rasterizer
(``diff-gaussian-rasterization-depth``, interface at ``SLAM/render.py:60-128``)
with batched jnp.  Split in two for performance:

* :func:`project_geometry` — the screen-space geometry every gaussian needs
  for binning (runs over the full fixed-capacity array);
* :func:`shade` — SH color + the opaque-normal gate, evaluated only on the
  depth-sorted *visible* subset (SH coefficients are the fattest per-gaussian
  payload; shading after compaction cuts that HBM traffic by the
  visible/capacity ratio).

Everything is differentiable by construction.
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
    """Per-gaussian screen-space geometry, all [P] or [P, k]."""

    mean2d: jnp.ndarray   # [P, 2] pixel coordinates
    conic: jnp.ndarray    # [P, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray    # [P] view-space z
    radius: jnp.ndarray   # [P] screen-space 3-sigma radius (pixels)
    visible: jnp.ndarray  # [P] bool


class FullProjection(NamedTuple):
    """Geometry + shading (compat surface for tests/tools)."""

    mean2d: jnp.ndarray
    conic: jnp.ndarray
    depth: jnp.ndarray
    radius: jnp.ndarray
    rgb: jnp.ndarray
    opacity: jnp.ndarray
    normal_elig: jnp.ndarray
    visible: jnp.ndarray


def project_geometry(
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    alive: jnp.ndarray,
    w2c: jnp.ndarray,
    K: jnp.ndarray,
    width: int,
    height: int,
    scale_modifier: float = 1.0,
) -> Projected:
    """Project activated gaussians into screen space (geometry only)."""
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
        visible=visible,
    )


def shade(
    xyz: jnp.ndarray,
    shs: jnp.ndarray,
    normal: jnp.ndarray,
    campos: jnp.ndarray,
    sh_degree: int,
    normal_threshold: float,
):
    """SH color + opaque-normal eligibility for a (sub)set of gaussians.

    The eligibility implements the paper's opaque-depth normal gate: only
    gaussians whose disc faces the camera within renderer_normal_threshold
    degrees can be the depth-defining hit (settings normal_threshold = cos θ,
    render.py:38-40,81).
    """
    # grad-safe normalization: dead rows can sit exactly at the camera origin
    dirs = xyz - campos
    dirs = dirs / jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    rgb = jnp.maximum(sh_utils.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)
    normal_elig = jnp.abs(jnp.sum(normal * dirs, axis=-1)) >= normal_threshold
    return rgb, normal_elig


def project(
    xyz, scaling, rotation, opacity, shs, normal, alive,
    w2c, K, campos, width, height, sh_degree, normal_threshold,
    scale_modifier: float = 1.0,
) -> FullProjection:
    """Full projection incl. shading over the whole array (compat surface;
    the production path shades post-compaction, see api.py)."""
    geo = project_geometry(xyz, scaling, rotation, alive, w2c, K,
                           width, height, scale_modifier)
    rgb, elig = shade(xyz, shs, normal, campos, sh_degree, normal_threshold)
    return FullProjection(
        mean2d=geo.mean2d, conic=geo.conic, depth=geo.depth, radius=geo.radius,
        rgb=rgb, opacity=opacity.reshape(-1), normal_elig=elig,
        visible=geo.visible,
    )
