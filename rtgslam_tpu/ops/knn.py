"""K-nearest-neighbour search over point sets — tiled matmul formulation.

TPU-native replacement for the reference's CUDA KNN kernels:
  * ``simple_knn._C.distCUDA2`` (forked: 3-NN indices + mean sq distance,
    call site ``SLAM/gaussian_pointcloud.py:366-405``);
  * ``pytorch3d.ops.knn_points`` (temp-point dedup ``mapper.py:812-819``,
    isolation test ``mapper.py:903-909``).

Pairwise distances are computed chunk-by-chunk as
``|q|^2 + |r|^2 - 2 q.rᵀ`` — the cross term is a [Q, C] x [C, 3]ᵀ matmul that
rides the MXU — while a running top-k merge keeps memory at O(Q * (k + C))
regardless of reference-set size.  Invalid reference rows are masked with
+inf before the merge, so fixed-capacity (padded) point sets work directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHUNK = 4096


@partial(jax.jit, static_argnames=("k", "chunk"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
        k: int = 3, chunk: int = CHUNK):
    """k nearest references for each query point.

    Args:
      query: [Q, 3]; ref: [R, 3]; ref_valid: [R] bool.
      k: neighbours to keep (static).
    Returns:
      (dist2 [Q, k], idx [Q, k]) — squared distances ascending; idx is -1 /
      dist inf where fewer than k valid references exist.
    """
    assert chunk % 128 == 0, "chunk must be a multiple of the 128-lane segment"
    Q = query.shape[0]
    R = ref.shape[0]
    n_chunks = -(-R // chunk)
    pad = n_chunks * chunk - R
    ref_p = jnp.pad(ref, ((0, pad), (0, 0)))
    valid_p = jnp.pad(ref_valid, (0, pad))

    q_norm = jnp.sum(query * query, axis=-1, keepdims=True)      # [Q, 1]

    def body(carry, c):
        best_d, best_i = carry
        r = jax.lax.dynamic_slice(ref_p, (c * chunk, 0), (chunk, 3))
        v = jax.lax.dynamic_slice(valid_p, (c * chunk,), (chunk,))
        r_norm = jnp.sum(r * r, axis=-1)                          # [C]
        # full-f32 MXU passes: the default bf16 matmul loses ~1e-1 absolute
        # on metre-scale coordinates, which breaks centimetre thresholds
        cross = jnp.dot(query, r.T, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        d2 = q_norm + r_norm[None, :] - 2.0 * cross               # [Q, C]
        d2 = jnp.where(v[None, :], jnp.maximum(d2, 0.0), jnp.inf)

        # Chunk-local k-smallest via a two-level segment tournament.  NOT
        # top_k over the [Q, k+chunk] concat (XLA lowers that to an
        # O(log^2) multi-pass sort, ~10 GB/chunk in the optimized HLO) and
        # NOT k iterative min-extraction sweeps either: each sweep re-read
        # and rewrote the whole [Q, chunk] block (~15 full-block passes for
        # k=4 — the round-3 formulation; hlo_traffic measured it as the #1
        # byte consumer of the whole frame_chain).  Here the [Q, chunk]
        # block has exactly ONE consumer — an argmin pass over [Q, S, 128]
        # lane segments, into which the d2 elementwise chain fuses — so the
        # block costs one write + one read (or nothing, if the reduce fuses
        # over the dot output).  Everything downstream (segment-min values,
        # the k extraction rescans) is RECOMPUTED from the [chunk, 3] ref
        # points via tiny gathers rather than read back out of d2: a second
        # d2 consumer would make XLA duplicate the whole elementwise chain
        # into each consumer's fusion (measured: 5 full-block recomputes),
        # and optimization_barrier is stripped by some backends.  All
        # value comparisons after the argmin happen among recomputed
        # values, so the two rounding regimes never mix.
        L = 128                                # lane-width segments
        S = chunk // L
        seg_arg = jnp.argmin(d2.reshape(Q, S, L), axis=2)         # [Q, S]

        def dist_at(idx):
            """Recompute masked d2 at in-chunk ref indices [Q, ...]."""
            rs = r[idx]                                           # [..., 3]
            dv = (q_norm.reshape((Q,) + (1,) * (idx.ndim - 1))
                  + jnp.sum(rs * rs, axis=-1)
                  - 2.0 * jnp.einsum("qc,q...c->q...", query, rs,
                                     precision=jax.lax.Precision.HIGHEST))
            return jnp.where(v[idx], jnp.maximum(dv, 0.0), jnp.inf)

        scol = jnp.arange(S)
        lane = jnp.arange(L)
        seg_min = dist_at(scol[None, :] * L + seg_arg)            # [Q, S]

        cand_d, cand_i, winners = [], [], []
        for _ in range(k):
            s_star = jnp.argmin(seg_min, axis=1)                  # [Q]
            m = jnp.take_along_axis(seg_min, s_star[:, None], 1)[:, 0]
            l_star = jnp.take_along_axis(seg_arg, s_star[:, None], 1)[:, 0]
            cand_d.append(m)
            cand_i.append(c * chunk + s_star * L + l_star)
            winners.append((s_star, l_star))
            # rescan the winning segment with every winner extracted so
            # far masked out (two top-k entries may share a segment), and
            # patch the [Q, S] tables at that one column
            row = dist_at(s_star[:, None] * L + lane[None, :])    # [Q, L]
            for ps, pl in winners:
                row = jnp.where((ps == s_star)[:, None]
                                & (lane[None, :] == pl[:, None]),
                                jnp.inf, row)
            new_arg = jnp.argmin(row, axis=1)                     # [Q]
            new_min = jnp.take_along_axis(row, new_arg[:, None], 1)[:, 0]
            at = scol[None, :] == s_star[:, None]                 # [Q, S]
            seg_min = jnp.where(at, new_min[:, None], seg_min)
            seg_arg = jnp.where(at, new_arg[:, None], seg_arg)
        cd = jnp.stack(cand_d, axis=1)                            # [Q, k]
        ci = jnp.stack(cand_i, axis=1).astype(jnp.int32)

        # merge with the carried best: tiny [Q, 2k] top_k (earlier chunks
        # listed first, so stable tie-breaks preserve ascending index order)
        cat_d = jnp.concatenate([best_d, cd], axis=1)
        cat_i = jnp.concatenate([best_i, ci], axis=1)
        neg_top, pos = jax.lax.top_k(-cat_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_d, new_i), None

    init = (jnp.full((Q, k), jnp.inf), jnp.full((Q, k), -1, jnp.int32))
    (dist2, idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    idx = jnp.where(jnp.isinf(dist2), -1, idx)
    return dist2, idx


@partial(jax.jit, static_argnames=("k",))
def knn_self(points: jnp.ndarray, valid: jnp.ndarray, k: int = 3):
    """k nearest *other* points for each point (self-match excluded), the
    ``distCUDA2`` fork contract: returns (mean sq dist over k, idx [N, k])."""
    d2, idx = knn(points, points, valid, k=k + 1)
    # drop the self column (distance ~0, first entry for valid points)
    d2, idx = d2[:, 1:], idx[:, 1:]
    finite = jnp.where(jnp.isinf(d2), 0.0, d2)
    count = jnp.maximum(jnp.sum(~jnp.isinf(d2), axis=1), 1)
    return jnp.sum(finite, axis=1) / count, idx
