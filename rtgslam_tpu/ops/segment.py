"""Per-gaussian error accumulation from per-pixel error maps.

TPU-native replacement for the CUDA ``cuda_utils._C.accumulate_gaussian_error``
kernel (call site ``SLAM/multiprocess/mapper.py:541-559``): pixels scatter
their color / depth / normal errors onto the gaussian indexed by the render's
``color_index_map`` / ``depth_index_map``.  One ``segment_sum`` per quantity —
XLA lowers this to an efficient on-device scatter-add — followed by a count
normalization, giving the *mean* error per hit gaussian, which is what gets
compared against 2x spawn thresholds to drive the error counters
(mapper.py:561-591).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_gaussians",))
def accumulate_gaussian_error(
    color_error: jnp.ndarray,   # [H, W] or [H, W, 1]
    depth_error: jnp.ndarray,
    normal_error: jnp.ndarray,
    color_index: jnp.ndarray,   # [H, W] int32, -1 = no gaussian
    depth_index: jnp.ndarray,
    num_gaussians: int,
):
    """Mean per-gaussian color/depth/normal errors.

    Color errors scatter along ``color_index``; depth and normal errors along
    ``depth_index`` (matching the reference kernel's argument pairing).
    Returns three [P] arrays (zero where a gaussian was never hit).
    """
    def flat(x):
        return x.reshape(-1)

    def segment_mean(err, idx):
        err = flat(err.astype(jnp.float32))
        idx = flat(idx)
        valid = idx >= 0
        seg = jnp.where(valid, idx, num_gaussians)  # overflow row for invalid
        total = jax.ops.segment_sum(
            jnp.where(valid, err, 0.0), seg, num_segments=num_gaussians + 1)
        count = jax.ops.segment_sum(
            valid.astype(jnp.float32), seg, num_segments=num_gaussians + 1)
        return (total[:num_gaussians]
                / jnp.maximum(count[:num_gaussians], 1.0))

    g_color = segment_mean(color_error, color_index)
    g_depth = segment_mean(depth_error, depth_index)
    g_normal = segment_mean(normal_error, depth_index)
    return g_color, g_depth, g_normal


def stable_partition_order(mask: jnp.ndarray) -> jnp.ndarray:
    """Permutation putting ``mask``-true rows first, original order kept
    within each side — i.e. ``jnp.argsort(~mask, stable=True)``, but via two
    cumsums and one scatter of iota instead of a full key sort.  A binary
    stable partition is the hot reordering of both the spawn pack
    (map_ops.insert_temp) and the optimize pool basis (optimize_prepare);
    XLA lowers argsort to an O(log^2 n) multi-pass bitonic network whose
    materialized key+index passes cost ~20x the three linear passes here.
    """
    n = mask.shape[0]
    n_true = jnp.sum(mask)
    pos = jnp.where(mask, jnp.cumsum(mask) - 1,
                    n_true + jnp.cumsum(~mask) - 1)      # destination of row i
    return (jnp.zeros(n, jnp.int32)
            .at[pos].set(jnp.arange(n, dtype=jnp.int32), mode="drop"))
