"""Frame preprocessing ops: vertex/normal/confidence maps, depth filtering,
pyramids, pooling, tile masks.  All pure jnp and jit-friendly.

Behavioral contracts come from the reference ``SLAM/utils.py``:
  compute_vertex_map      :65   pinhole back-projection
  compute_normal_map      :100  Sobel gradients, normal = dy x dx
  compute_confidence_map  :125  |cos(view ray, normal)|
  bilateralFilter_torch   :550  radius-bounded bilateral depth filter
  maxpool/meanpool        :655  stride pooling with padding
  pixelmask2tilemask      :681  any-pixel -> tile
  transmission2tilemask   :695  mean(mask) > ratio -> tile
  colorerror2tilemask     :708  top-k tiles by mean error
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TILE = 16  # rasterizer tile edge in pixels (reference render.py:101-108)


def transform_map(m: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 transform to an [H,W,3] map of points (or directions when
    the transform is rotation-only), reference ``SLAM/utils.py:56-63``.

    Full-f32 matmul: world coordinates feed ICP and spawning thresholds."""
    with jax.default_matmul_precision("highest"):
        return m @ transform[:3, :3].T + transform[:3, 3]


def compute_vertex_map(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project an [H,W] or [H,W,1] depth map into camera-space points."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    H, W = depth.shape
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = jnp.arange(W, dtype=depth.dtype)[None, :].repeat(H, axis=0)
    v = jnp.arange(H, dtype=depth.dtype)[:, None].repeat(W, axis=1)
    dirs = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    return dirs * depth[..., None]


def _sobel(img: jnp.ndarray):
    """Replicate-padded Sobel x/y gradients of an [H,W,C] map."""
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    # Separable Sobel: smooth [1,2,1] along one axis, diff [-1,0,1] along other.
    smooth_y = pad[:-2] + 2 * pad[1:-1] + pad[2:]           # [H, W+2, C]
    dx = smooth_y[:, 2:] - smooth_y[:, :-2]                 # [H, W, C]
    smooth_x = pad[:, :-2] + 2 * pad[:, 1:-1] + pad[:, 2:]  # [H+2, W, C]
    dy = smooth_x[2:] - smooth_x[:-2]                       # [H, W, C]
    return dx, dy


def compute_normal_map(vertex_map: jnp.ndarray) -> jnp.ndarray:
    """Normals from the vertex map via Sobel cross products.

    Matches reference semantics: normal = cross(dy, dx) normalized; pixels
    whose depth equals the per-image min (zeros) or max are zeroed.
    """
    dx, dy = _sobel(vertex_map)
    normal = jnp.cross(dy, dx)
    mag = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / (mag + 1e-8)
    depth = vertex_map[..., 2]
    invalid = (depth <= depth.min()) | (depth >= depth.max())
    return jnp.where(invalid[..., None], 0.0, normal)


def compute_confidence_map(normal_map: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel |cos| between the viewing ray and the normal, [H,W,1]."""
    H, W = normal_map.shape[:2]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u = jnp.arange(W, dtype=normal_map.dtype)[None, :].repeat(H, axis=0)
    v = jnp.arange(H, dtype=normal_map.dtype)[:, None].repeat(W, axis=1)
    ray = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    ray = ray / (jnp.linalg.norm(ray, axis=-1, keepdims=True) + 1e-8)
    n = normal_map / (jnp.linalg.norm(normal_map, axis=-1, keepdims=True) + 1e-8)
    return jnp.abs(jnp.sum(ray * n, axis=-1, keepdims=True))


@partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(depth: jnp.ndarray, radius: int = 5,
                     sigma_color: float = 2.0, sigma_space: float = 2.0) -> jnp.ndarray:
    """Bilateral depth filter over a disc of the given radius; zero-depth
    pixels are excluded from the support and zero-weight outputs stay zero.

    NOTE (reference parity, ``SLAM/utils.py:550-589``): only invalid
    NEIGHBORS are masked — a zero-depth CENTER with valid in-radius
    neighbors is inpainted from them, exactly as the reference does.  At
    occlusion boundaries this can synthesize depth in free space; kept
    because the downstream spawn/ICP thresholds were tuned against this
    behavior."""
    squeeze = depth.ndim == 3
    if squeeze:
        depth = depth[..., 0]
    pad = jnp.pad(depth, radius)
    H, W = depth.shape
    weight_sum = jnp.zeros_like(depth)
    pixel_sum = jnp.zeros_like(depth)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx > radius * radius:
                continue
            shifted = jax.lax.dynamic_slice(pad, (radius + dy, radius + dx), (H, W))
            sw = -(dy * dy + dx * dx) / (2 * sigma_space ** 2)
            cw = -((depth - shifted) ** 2) / (2 * sigma_color ** 2)
            w = jnp.exp(sw + cw) * (shifted != 0)
            weight_sum = weight_sum + w
            pixel_sum = pixel_sum + w * shifted
    out = jnp.where(weight_sum == 0, 0.0, pixel_sum / jnp.maximum(weight_sum, 1e-12))
    return out[..., None] if squeeze else out


def _pool(x: jnp.ndarray, stride: int, reducer, init) -> jnp.ndarray:
    """Stride-pool an [H,W] map, padding to a multiple of the stride."""
    H, W = x.shape[:2]
    ph = (-H) % stride
    pw = (-W) % stride
    x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=init)
    Hp, Wp = H + ph, W + pw
    x = x.reshape(Hp // stride, stride, Wp // stride, stride)
    return reducer(x, axis=(1, 3))


def maxpool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return _pool(x, stride, jnp.max, 0.0)


def meanpool(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    return _pool(x, stride, jnp.mean, 0.0)


def depth_pyramid(depth: jnp.ndarray, levels: int, pool: str = "max"):
    """Coarse-to-fine depth pyramid: level i is pooled by 2**(levels-1-i)
    (level ``levels-1`` is full resolution), matching the reference
    ``ImagePyramids`` ordering (icp.py:337-374)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    fn = maxpool if pool == "max" else meanpool
    out = []
    for i in range(levels):
        k = 1 << (levels - 1 - i)
        out.append(depth if k == 1 else fn(depth, k))
    return out


def pixelmask_to_tilemask(mask: jnp.ndarray, stride: int = TILE) -> jnp.ndarray:
    """Tile active iff any pixel in it is set."""
    return (_pool(mask.astype(jnp.float32), stride, jnp.max, 0.0) > 0).astype(jnp.int32)


def transmission_to_tilemask(mask: jnp.ndarray, stride: int = TILE,
                             ratio: float = 0.5) -> jnp.ndarray:
    """Tile active iff the mean of the pixel mask exceeds ``ratio``.

    Edge tiles of a non-multiple-of-``stride`` resolution average over the
    zero padding (diluting their mean) — reference parity: the reference
    zero-pads into ``avg_pool2d`` the same way (``SLAM/utils.py:695-705``,
    likewise ``colorerror2tilemask`` :708-734)."""
    return (_pool(mask.astype(jnp.float32), stride, jnp.mean, 0.0) > ratio).astype(jnp.int32)


def colorerror_to_tilemask(error: jnp.ndarray, stride: int = TILE,
                           top_ratio: float = 0.4) -> jnp.ndarray:
    """Select the top ``top_ratio`` fraction of tiles by mean error."""
    down = _pool(error, stride, jnp.mean, 0.0)
    k = max(int(down.size * top_ratio), 1)
    flat = down.reshape(-1)
    thresh = jax.lax.top_k(flat, k)[0][-1]
    return (down >= jnp.maximum(thresh, 1e-12)).astype(jnp.int32)


def tilemask_to_pixelmask(tile_mask: jnp.ndarray, H: int, W: int,
                          stride: int = TILE) -> jnp.ndarray:
    """Nearest-upsample a tile mask back to pixel resolution."""
    up = jnp.repeat(jnp.repeat(tile_mask, stride, axis=0), stride, axis=1)
    return up[:H, :W].astype(bool)
