"""LPIPS (AlexNet variant) in pure JAX.

The reference scores LPIPS-alex per frame (``SLAM/eval.py:38-147``).  The
metric needs pretrained AlexNet features + per-layer linear heads; this
environment has no network egress and no cached weights, so the metric is
*gated*: point ``LPIPS_WEIGHTS`` at an ``.npz`` with the arrays below and
:func:`lpips` computes the real value, otherwise it returns ``None`` and the
eval outputs drop the column.  This gate is THE contract (permanent): no
weights -> no number, never NaN.

Expected npz keys (export once from the `lpips` pip package on a connected
machine with ``scripts/export_lpips_weights.py``):
  conv0_w conv0_b ... conv4_w conv4_b   AlexNet feature convs (OIHW)
  lin0 ... lin4                         1x1 linear head weights [C]
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature extractor config: (out_ch, kernel, stride, pad)
_CONVS = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
          (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}          # maxpool(3, stride2) after these conv indices
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])

_weights_cache: Optional[Dict[str, np.ndarray]] = None


def load_weights(path: Optional[str] = None) -> Optional[Dict[str, np.ndarray]]:
    global _weights_cache
    if _weights_cache is not None:
        return _weights_cache
    path = path or os.environ.get("LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        return None
    _weights_cache = dict(np.load(path))
    return _weights_cache


def _features(x: jnp.ndarray, w: Dict[str, np.ndarray]):
    """x: [N, 3, H, W] in [-1, 1] -> list of 5 normalized feature maps."""
    x = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
    feats = []
    for i, (_, k, s, p) in enumerate(_CONVS):
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(w[f"conv{i}_w"]), (s, s), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + jnp.asarray(w[f"conv{i}_b"])[None, :, None, None]
        x = jax.nn.relu(x)
        norm = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True) + 1e-10)
        feats.append(x / norm)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
    return feats


@partial(jax.jit, static_argnames=())
def _lpips_jit(a, b, w_arrays):
    fa = _features(a, w_arrays)
    fb = _features(b, w_arrays)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        diff = (xa - xb) ** 2
        lin = jnp.asarray(w_arrays[f"lin{i}"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=1))
    return total


def lpips(img: np.ndarray, gt: np.ndarray,
          weights_path: Optional[str] = None) -> Optional[float]:
    """LPIPS between [H, W, 3] images in [0, 1]; None if weights unavailable."""
    w = load_weights(weights_path)
    if w is None:
        return None
    a = jnp.asarray(img.transpose(2, 0, 1))[None] * 2.0 - 1.0
    b = jnp.asarray(gt.transpose(2, 0, 1))[None] * 2.0 - 1.0
    return float(_lpips_jit(a, b, {k: jnp.asarray(v) for k, v in w.items()}))
