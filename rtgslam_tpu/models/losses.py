"""Photometric / geometric losses and image metrics (jnp).

Contracts from the reference ``utils/loss_utils.py``: ``l1``/``l2`` plain
means, ``ssim`` with an 11x11 gaussian window (sigma 1.5) and the standard
stability constants, ``psnr`` per-image.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean over masked entries; 0 when the mask is empty (keeps the fused
    optimize loop NaN-free with static shapes)."""
    mask = mask.astype(values.dtype)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(values * mask) / jnp.maximum(denom, 1.0), 0.0)


def psnr(img: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img: jnp.ndarray, gt: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM over [H, W, C] images in [0, 1]."""
    w = _gaussian_window(window_size)[None, None]       # [1,1,k,k]
    C = img.shape[-1]
    kernel = jnp.tile(w, (C, 1, 1, 1))                  # depthwise

    def filt(x):
        x = x.transpose(2, 0, 1)[None]                  # [1,C,H,W]
        # TPU convs default to bf16 passes; the sigma estimates are small
        # differences of large filtered moments, so bf16 noise flips the
        # denominator sign and SSIM escapes [−1, 1] (seen: mean 1.13)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME", feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)
        return y[0].transpose(1, 2, 0)

    mu1, mu2 = filt(img), filt(gt)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1 = filt(img * img) - mu1_sq
    sigma2 = filt(gt * gt) - mu2_sq
    sigma12 = filt(img * gt) - mu12
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu12 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1 + sigma2 + C2))
    return jnp.mean(s)


def ms_ssim(img: jnp.ndarray, gt: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM (power weights of Wang et al.), used by eval."""
    weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])[:levels]

    def down(x):
        H, W, C = x.shape
        H2, W2 = H // 2 * 2, W // 2 * 2
        x = x[:H2, :W2]
        return x.reshape(H2 // 2, 2, W2 // 2, 2, C).mean(axis=(1, 3))

    vals = []
    a, b = img, gt
    for _ in range(levels):
        vals.append(jnp.clip(ssim(a, b), 0.0, 1.0))
        a, b = down(a), down(b)
    vals = jnp.stack(vals)
    return jnp.prod(vals ** weights)


def cosine_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - cos similarity along the last axis."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
    return 1.0 - num / den
