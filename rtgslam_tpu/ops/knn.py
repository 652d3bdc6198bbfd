"""K-nearest-neighbour search over point sets — tiled matmul formulation.

TPU-native replacement for the reference's CUDA KNN kernels:
  * ``simple_knn._C.distCUDA2`` (forked: 3-NN indices + mean sq distance,
    call site ``SLAM/gaussian_pointcloud.py:366-405``);
  * ``pytorch3d.ops.knn_points`` (temp-point dedup ``mapper.py:812-819``,
    isolation test ``mapper.py:903-909``).

Pairwise distances are computed block-by-block as
``|q|^2 + |r|^2 - 2 q.rᵀ`` — the cross term is a [Qb, C] x [C, 3]ᵀ matmul that
rides the MXU — while a running top-k merge keeps memory at O(Qb * (k + C))
regardless of reference-set size.  Invalid reference rows are masked with
+inf before the merge, so fixed-capacity (padded) point sets work directly.

Traffic scales with the LIVE point counts, not the static capacities: the
query axis is processed in ``q_block``-row blocks inside a ``while_loop``
whose trip count is ``ceil(query_count / q_block)`` and the reference axis in
``chunk``-row chunks bounded by ``ceil(ref_count / chunk)`` — both counts are
runtime scalars, so a spawn frame with ~300 live temp points against a ~4k
map touches ONE [512, 4096] distance block instead of the full
[temp_capacity, ref_capacity] grid (hlo_traffic attributed the padded-grid
formulation as frame_chain's #1 HBM consumer).  Callers compact live rows to
a prefix first (``ops.segment.stable_partition_order``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

CHUNK = 4096
Q_BLOCK = 512


@partial(jax.jit, static_argnames=("k", "chunk", "q_block"))
def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_valid: jnp.ndarray,
        k: int = 3, chunk: int = CHUNK,
        query_count=None, ref_count=None, q_block: int | None = None):
    """k nearest references for each query point.

    Args:
      query: [Q, 3]; ref: [R, 3]; ref_valid: [R] bool.
      k: neighbours to keep (static).
      query_count: optional runtime scalar — query blocks past
        ``ceil(query_count / q_block)`` are skipped.  Rows past the last
        processed block stay at the (inf, -1) init; stragglers inside the
        final partial block still carry real results.  Callers must not
        rely on results for any row ``>= query_count``.
      ref_count: optional runtime scalar — reference chunks past
        ``ceil(ref_count / chunk)`` are skipped.  Every ref row at index
        ``>= ref_count`` must already be ``ref_valid == False`` (the caller
        contract; live-prefix layouts satisfy it by construction).
      q_block: query rows per block (static; default = whole query set when
        ``query_count`` is None, else ``Q_BLOCK``).
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

    if q_block is None:
        q_block = Q if query_count is None else min(Q_BLOCK, Q)
    n_qb = -(-Q // q_block)
    qpad = n_qb * q_block - Q
    query_p = jnp.pad(query, ((0, qpad), (0, 0)))

    ref_trips = (jnp.int32(n_chunks) if ref_count is None
                 else jnp.minimum(n_chunks, -(-ref_count // chunk)).astype(jnp.int32))
    q_trips = (jnp.int32(n_qb) if query_count is None
               else jnp.minimum(n_qb, -(-query_count // q_block)).astype(jnp.int32))

    def block_knn(qs):
        """(dist2 [q_block, k], idx [q_block, k]) for one query block."""
        q_norm = jnp.sum(qs * qs, axis=-1, keepdims=True)         # [Qb, 1]

        def body(state):
            c, best_d, best_i = state
            r = jax.lax.dynamic_slice(ref_p, (c * chunk, 0), (chunk, 3))
            v = jax.lax.dynamic_slice(valid_p, (c * chunk,), (chunk,))
            r_norm = jnp.sum(r * r, axis=-1)                      # [C]
            # full-f32 MXU passes: the default bf16 matmul loses ~1e-1
            # absolute on metre-scale coordinates, which breaks centimetre
            # thresholds
            cross = jnp.dot(qs, r.T, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
            d2 = q_norm + r_norm[None, :] - 2.0 * cross           # [Qb, C]
            d2 = jnp.where(v[None, :], jnp.maximum(d2, 0.0), jnp.inf)

            # Chunk-local k-smallest via a two-level segment tournament.
            # NOT top_k over the [Qb, k+chunk] concat (XLA lowers that to an
            # O(log^2) multi-pass sort, ~10 GB/chunk in the optimized HLO)
            # and NOT k iterative min-extraction sweeps either: each sweep
            # re-read and rewrote the whole [Qb, chunk] block (~15
            # full-block passes for k=4 — the round-3 formulation;
            # hlo_traffic measured it as the #1 byte consumer of the whole
            # frame_chain).  Here the [Qb, chunk] block has exactly ONE
            # consumer — an argmin pass over [Qb, S, 128] lane segments,
            # into which the d2 elementwise chain fuses — so the block costs
            # one write + one read (or nothing, if the reduce fuses over the
            # dot output).  Everything downstream (segment-min values, the k
            # extraction rescans) is RECOMPUTED from the [chunk, 3] ref
            # points via tiny gathers rather than read back out of d2: a
            # second d2 consumer would make XLA duplicate the whole
            # elementwise chain into each consumer's fusion (measured: 5
            # full-block recomputes), and optimization_barrier is stripped
            # by some backends.  All value comparisons after the argmin
            # happen among recomputed values, so the two rounding regimes
            # never mix.
            Qb = qs.shape[0]
            L = 128                            # lane-width segments
            S = chunk // L
            seg_arg = jnp.argmin(d2.reshape(Qb, S, L), axis=2)    # [Qb, S]

            def dist_at(idx):
                """Recompute masked d2 at in-chunk ref indices [Qb, ...]."""
                rs = r[idx]                                       # [..., 3]
                dv = (q_norm.reshape((Qb,) + (1,) * (idx.ndim - 1))
                      + jnp.sum(rs * rs, axis=-1)
                      - 2.0 * jnp.einsum("qc,q...c->q...", qs, rs,
                                         precision=jax.lax.Precision.HIGHEST))
                return jnp.where(v[idx], jnp.maximum(dv, 0.0), jnp.inf)

            scol = jnp.arange(S)
            lane = jnp.arange(L)
            seg_min = dist_at(scol[None, :] * L + seg_arg)        # [Qb, S]

            cand_d, cand_i, winners = [], [], []
            for _ in range(k):
                s_star = jnp.argmin(seg_min, axis=1)              # [Qb]
                m = jnp.take_along_axis(seg_min, s_star[:, None], 1)[:, 0]
                l_star = jnp.take_along_axis(seg_arg, s_star[:, None], 1)[:, 0]
                cand_d.append(m)
                cand_i.append(c * chunk + s_star * L + l_star)
                winners.append((s_star, l_star))
                # rescan the winning segment with every winner extracted so
                # far masked out (two top-k entries may share a segment),
                # and patch the [Qb, S] tables at that one column
                row = dist_at(s_star[:, None] * L + lane[None, :])  # [Qb, L]
                for ps, pl in winners:
                    row = jnp.where((ps == s_star)[:, None]
                                    & (lane[None, :] == pl[:, None]),
                                    jnp.inf, row)
                new_arg = jnp.argmin(row, axis=1)                 # [Qb]
                new_min = jnp.take_along_axis(row, new_arg[:, None], 1)[:, 0]
                at = scol[None, :] == s_star[:, None]             # [Qb, S]
                seg_min = jnp.where(at, new_min[:, None], seg_min)
                seg_arg = jnp.where(at, new_arg[:, None], seg_arg)
            cd = jnp.stack(cand_d, axis=1)                        # [Qb, k]
            ci = jnp.stack(cand_i, axis=1).astype(jnp.int32)

            # merge with the carried best: tiny [Qb, 2k] top_k (earlier
            # chunks listed first, so stable tie-breaks preserve ascending
            # index order)
            cat_d = jnp.concatenate([best_d, cd], axis=1)
            cat_i = jnp.concatenate([best_i, ci], axis=1)
            neg_top, pos = jax.lax.top_k(-cat_d, k)
            new_d = -neg_top
            new_i = jnp.take_along_axis(cat_i, pos, axis=1)
            return c + 1, new_d, new_i

        Qb = qs.shape[0]
        init = (jnp.int32(0),
                jnp.full((Qb, k), jnp.inf), jnp.full((Qb, k), -1, jnp.int32))
        _, dist2, idx = jax.lax.while_loop(
            lambda s: s[0] < ref_trips, body, init)
        idx = jnp.where(jnp.isinf(dist2), -1, idx)
        return dist2, idx

    if n_qb == 1:
        d, i = block_knn(query_p)
        return d[:Q], i[:Q]

    out_d0 = jnp.full((n_qb * q_block, k), jnp.inf)
    out_i0 = jnp.full((n_qb * q_block, k), -1, jnp.int32)

    def q_body(state):
        b, od, oi = state
        qs = jax.lax.dynamic_slice(query_p, (b * q_block, 0), (q_block, 3))
        bd, bi = block_knn(qs)
        od = jax.lax.dynamic_update_slice(od, bd, (b * q_block, 0))
        oi = jax.lax.dynamic_update_slice(oi, bi, (b * q_block, 0))
        return b + 1, od, oi

    _, out_d, out_i = jax.lax.while_loop(
        lambda s: s[0] < q_trips, q_body, (jnp.int32(0), out_d0, out_i0))
    return out_d[:Q], out_i[:Q]


@partial(jax.jit, static_argnames=("k",))
def knn_self(points: jnp.ndarray, valid: jnp.ndarray, k: int = 3,
             count=None):
    """k nearest *other* points for each point (self-match excluded), the
    ``distCUDA2`` fork contract: returns (mean sq dist over k, idx [N, k]).

    ``count`` (optional runtime scalar) bounds BOTH sides when live rows
    occupy a prefix (see :func:`knn`)."""
    d2, idx = knn(points, points, valid, k=k + 1,
                  query_count=count, ref_count=count)
    # drop the self column (distance ~0, first entry for valid points)
    d2, idx = d2[:, 1:], idx[:, 1:]
    finite = jnp.where(jnp.isinf(d2), 0.0, d2)
    count_nb = jnp.maximum(jnp.sum(~jnp.isinf(d2), axis=1), 1)
    return jnp.sum(finite, axis=1) / count_nb, idx
