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
from ...utils.geometry import quat_to_rotmat_cols

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
    """Project activated gaussians into screen space (geometry only).

    All per-gaussian math runs on scalar [P] COLUMNS, never on batched
    [P, 2, 3] / [P, 3, 3] matrices: TPU layout assignment pads every
    <8/<128-sized trailing axis to a full (8, 128) register tile, so the
    batched-matmul formulation materialized ~14-45x its logical bytes per
    intermediate (measured: ~700 MB/render of the 17 ms render budget —
    see PERF.md round-3 layout table).  Columns are exact f32 (no bf16
    matmul passes), so this also supersedes the HIGHEST-precision matmul
    the stacked version needed.
    """
    R, t = w2c[:3, :3], w2c[:3, 3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    X, Y, Z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    # view transform as explicit f32 FMAs (bf16-free by construction;
    # bf16 would put ~mm noise in rendered depth)
    x = R[0, 0] * X + R[0, 1] * Y + R[0, 2] * Z + t[0]
    y = R[1, 0] * X + R[1, 1] * Y + R[1, 2] * Z + t[1]
    z = R[2, 0] * X + R[2, 1] * Y + R[2, 2] * Z + t[2]
    in_front = z > DEPTH_NEAR
    z_safe = jnp.where(in_front, z, 1.0)

    mean_x = fx * x / z_safe + cx
    mean_y = fy * y / z_safe + cy

    # EWA: cov2d = J W cov3d Wᵀ Jᵀ with the standard frustum-clamped Jacobian.
    tan_x, tan_y = (width / 2) / fx, (height / 2) / fy
    tx = jnp.clip(x / z_safe, -1.3 * tan_x, 1.3 * tan_x) * z_safe
    ty = jnp.clip(y / z_safe, -1.3 * tan_y, 1.3 * tan_y) * z_safe
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    j00, j02 = fx * inv_z, -fx * tx * inv_z2       # J row 0: [j00, 0, j02]
    j11, j12 = fy * inv_z, -fy * ty * inv_z2       # J row 1: [0, j11, j12]

    q = quat_to_rotmat_cols(rotation)              # 9 [P] columns, row-major
    s0 = scaling[..., 0] * scale_modifier
    s1 = scaling[..., 1] * scale_modifier
    s2 = scaling[..., 2] * scale_modifier
    # A = W @ (Rq * s): A[i][j] = s_j * sum_k W[i,k] Rq[k,j]
    A = [[(R[i, 0] * q[j] + R[i, 1] * q[3 + j] + R[i, 2] * q[6 + j])
          * (s0, s1, s2)[j] for j in range(3)] for i in range(3)]
    # M = J @ A (J's zero pattern folded in): two rows of three columns
    M0 = [j00 * A[0][j] + j02 * A[2][j] for j in range(3)]
    M1 = [j11 * A[1][j] + j12 * A[2][j] for j in range(3)]
    a = M0[0] * M0[0] + M0[1] * M0[1] + M0[2] * M0[2] + COV2D_DILATION
    b = M0[0] * M1[0] + M0[1] * M1[1] + M0[2] * M1[2]
    c = M1[0] * M1[0] + M1[1] * M1[1] + M1[2] * M1[2] + COV2D_DILATION

    det = a * c - b * b
    det_ok = det > 0
    det_safe = jnp.where(det_ok, det, 1.0)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    on_screen = (
        (mean_x + radius > 0)
        & (mean_x - radius < width)
        & (mean_y + radius > 0)
        & (mean_y - radius < height)
    )
    visible = alive & in_front & det_ok & (radius > 0) & on_screen

    return Projected(
        mean2d=jnp.stack([mean_x, mean_y], axis=-1),
        conic=jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1),
        depth=z,
        radius=jnp.where(visible, radius, 0.0),
        visible=visible,
    )


def shade_cols(
    xyz: jnp.ndarray,
    shs_flat: jnp.ndarray,
    normal: jnp.ndarray,
    campos: jnp.ndarray,
    sh_degree: int,
    normal_threshold: float,
):
    """SH color + opaque-normal eligibility, column-SoA.

    ``shs_flat`` is [V, 3*K] (the row-major flattening of [V, K, 3]).
    Returns (r, g, b, normal_elig) as [V] columns — the form the blend's
    per-tile column gathers consume (see sh_basis_cols on why not [V, K, 3]).

    The eligibility implements the paper's opaque-depth normal gate: only
    gaussians whose disc faces the camera within renderer_normal_threshold
    degrees can be the depth-defining hit (settings normal_threshold = cos θ,
    render.py:38-40,81).
    """
    # grad-safe normalization: dead rows can sit exactly at the camera origin
    dx = xyz[..., 0] - campos[0]
    dy = xyz[..., 1] - campos[1]
    dz = xyz[..., 2] - campos[2]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-12)
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    r, g, b = sh_utils.eval_sh_flat(sh_degree, shs_flat, dx, dy, dz)
    r = jnp.maximum(r + 0.5, 0.0)
    g = jnp.maximum(g + 0.5, 0.0)
    b = jnp.maximum(b + 0.5, 0.0)
    ndot = normal[..., 0] * dx + normal[..., 1] * dy + normal[..., 2] * dz
    normal_elig = jnp.abs(ndot) >= normal_threshold
    return r, g, b, normal_elig


def shade(
    xyz: jnp.ndarray,
    shs: jnp.ndarray,
    normal: jnp.ndarray,
    campos: jnp.ndarray,
    sh_degree: int,
    normal_threshold: float,
):
    """Stacked-output twin of :func:`shade_cols` (compat surface)."""
    r, g, b, normal_elig = shade_cols(
        xyz, shs.reshape(shs.shape[0], -1), normal, campos,
        sh_degree, normal_threshold)
    return jnp.stack([r, g, b], axis=-1), normal_elig


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
