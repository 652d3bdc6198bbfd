"""Front-to-back alpha blending over per-tile depth-ordered lists.

TPU-native reformulation of the reference CUDA blend loop: instead of a
sequential per-gaussian walk per pixel, each 16x16 tile processes its list in
chunks of ``CHUNK`` gaussians at once —

* per-chunk alphas form a [256, CHUNK] matrix (VPU elementwise work);
* the front-to-back transmittance is an *exclusive cumulative product* along
  the chunk axis, computed in log space by ONE triangular-ones MXU matmul
  (``_excl_cumlog``) — a ``jnp.cumprod`` would lower to a log-depth
  associative scan whose log2(C) full-tensor passes dominate HBM traffic;
* color accumulation is a [256, CHUNK] @ [CHUNK, 3] matmul (MXU).

Three execution modes share the math:
  ``blend_scan``  — fixed chunk count, reverse-differentiable (jax.checkpoint
                    on the body keeps activation memory at one chunk);
  ``blend_while`` — ``lax.while_loop`` with early exit once every pixel of
                    the tile is saturated (T < T_threshold) or the list is
                    exhausted; inference-only.
  ``blend_tiles_fused`` — custom-VJP variant: the forward is the early-exit
                    while_loop (recording each chunk's entry transmittance),
                    the backward is a hand-written back-to-front traversal
                    (the reference CUDA backward's structure,
                    ``SLAM/render.py:110-133`` bwd) that also early-exits.

Outputs per pixel (contract from ``SLAM/render.py:110-133``):
  color          standard alpha-blended RGB;
  depth/index    the paper's single-opaque-gaussian depth: view-z and global
                 index of the *first* gaussian along the ray with individual
                 alpha >= opaque_threshold that passes the normal gate;
  color_index    global index of the max-blend-weight contributor;
  hit weights    blend weight (alpha * T) of those two gaussians;
  T              final transmittance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE

CHUNK = 128
ALPHA_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99


class TileOutputs(NamedTuple):
    color: jnp.ndarray         # [T, 256, 3]
    depth: jnp.ndarray         # [T, 256]
    depth_index: jnp.ndarray   # [T, 256] int32, -1 = none
    color_index: jnp.ndarray   # [T, 256] int32, -1 = none
    depth_weight: jnp.ndarray  # [T, 256]
    color_weight: jnp.ndarray  # [T, 256]
    T_final: jnp.ndarray       # [T, 256]


class FeatCols(NamedTuple):
    """Per-gaussian blend features as SEPARATE scalar columns.

    A packed [*, 11] array puts an 11-sized axis minor-most, which TPU
    layout assignment pads to a full 128-lane register tile — every touch
    (the per-tile gather, layout copies into the blend loop) moved ~12x its
    logical bytes (measured ~200 MB/render; PERF.md round-3 layout table).
    Columns gather/slice/broadcast at their logical size.

    Shapes: [V+1] before tile gathering (last entry = sentinel with
    opacity 0), [T, Kt] after.
    """

    mean_x: jnp.ndarray
    mean_y: jnp.ndarray
    conic_a: jnp.ndarray
    conic_b: jnp.ndarray
    conic_c: jnp.ndarray
    depth: jnp.ndarray
    r: jnp.ndarray
    g: jnp.ndarray
    b: jnp.ndarray
    opacity: jnp.ndarray
    elig: jnp.ndarray            # f32 0/1

    def gather(self, idx: jnp.ndarray) -> "FeatCols":
        """Tile-gather via ONE packed row gather + ONE transpose.

        Per-column scalar gathers measured 15.5 ms/render on v5e (the TPU
        gather unit moves ~1 element/cycle — 11 x 196k scalars); gathering
        [Kt, 11] ROWS vectorizes across lanes (0.24 ms) and the single
        [T, Kt, 11] -> [11, T, Kt] relayout restores contiguous columns.
        """
        rows = jnp.stack(tuple(self), axis=-1)[idx]       # [T, Kt, 11]
        colsT = jnp.transpose(rows, (2, 0, 1))            # [11, T, Kt]
        return FeatCols(*(colsT[i] for i in range(11)))

    def gather_with_extra(self, extra, idx: jnp.ndarray):
        """:meth:`gather` carrying extra scalar columns through the SAME
        packed row gather (adding a 12th column to the [Kt, 11+] rows is
        free next to a second per-column scalar gather — ~1.4 ms each on
        v5e).  Returns (FeatCols of [T, Kt], tuple of extra [T, Kt])."""
        n = len(extra)
        rows = jnp.stack(tuple(self) + tuple(extra), axis=-1)[idx]
        colsT = jnp.transpose(rows, (2, 0, 1))            # [11+n, T, Kt]
        return (FeatCols(*(colsT[i] for i in range(11))),
                tuple(colsT[11 + i] for i in range(n)))

    def mask_contribution(self, keep: jnp.ndarray) -> "FeatCols":
        """Zero the alpha contribution of entries where ``keep`` == 0.

        A zero-opacity entry is blend-invisible EXACTLY: alpha 0 (below
        ALPHA_EPS) never accumulates color, never passes the opaque gate
        (opaque_threshold > 0), and never wins the strict-> color-index
        race against the 0-initialized max weight.  This turns one
        projection/sort/binning/shade pass into renders of any SUBSET of
        the gaussians it covered (the pool-variant render trick,
        api.render_model_and_stable)."""
        return self._replace(opacity=self.opacity * keep,
                             elig=self.elig * keep)

    def pack(self) -> jnp.ndarray:
        """Stacked [..., 11] layout (the Pallas kernels' input contract)."""
        return jnp.stack(tuple(self), axis=-1)

    @classmethod
    def unpack(cls, arr: jnp.ndarray) -> "FeatCols":
        return cls(*(arr[..., i] for i in range(11)))


def _pack_features(proj_sorted) -> FeatCols:
    """Sorted per-gaussian blend features as sentinel-padded columns; the
    final entry of every column is the sentinel (opacity/elig 0)."""
    mean_x, mean_y, conic_a, conic_b, conic_c, depth, r, g, b, opacity, elig \
        = proj_sorted
    zero = jnp.zeros((1,), jnp.float32)
    return FeatCols(*(
        jnp.concatenate([col.astype(jnp.float32), zero])
        for col in (mean_x, mean_y, conic_a, conic_b, conic_c, depth,
                    r, g, b, opacity, elig)))


def _chunk_alphas(cols: FeatCols, pix, opaque_threshold):
    """alpha/weight math for one chunk against one tile's pixels.

    cols of [C], pix [256, 2] -> alpha [256, C], rgb_t [3, C], z [C],
    opaque-eligibility [256, C].
    """
    z = cols.depth
    rgb_t = jnp.stack([cols.r, cols.g, cols.b], axis=0)   # [3, C]
    elig = cols.elig > 0.5

    # dx/dy as two [256, C] tensors: a [256, C, 2] stack puts a size-2 axis
    # minor-most (layout-padded 64x; see FeatCols)
    dx = pix[:, None, 0] - cols.mean_x[None, :]
    dy = pix[:, None, 1] - cols.mean_y[None, :]
    power = -0.5 * (cols.conic_a[None, :] * dx * dx
                    + cols.conic_c[None, :] * dy * dy) \
        - cols.conic_b[None, :] * dx * dy
    alpha = cols.opacity[None, :] * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    opaque = elig[None, :] & (alpha >= opaque_threshold)
    return alpha, rgb_t, z, opaque


def _excl_cumlog(l: jnp.ndarray) -> jnp.ndarray:
    """Exclusive cumulative sum along the LAST axis as one MXU matmul.

    ``jnp.cumprod``/``cumsum`` lower to log-depth associative scans on TPU:
    log2(C) full materializations of the [tiles, 256, C] operand per chunk
    step, in BOTH blend directions — measured as the dominant HBM traffic
    of the optimize loop (scripts/hlo_traffic.py).  A [C, C] triangular-ones
    matmul computes the same prefix sums in ONE pass at trivial MXU cost
    (384·256·C·C MACs ≈ 1.6 GFLOP at C=128).  Transmittance products run
    this in log space: ``exp(excl_cumlog(log1p(-alpha)))`` — well-
    conditioned because alpha <= ALPHA_MAX=0.99 bounds log1p in [-4.7, 0].
    HIGHEST precision keeps the accumulation f32 (TPU matmul defaults to
    bf16 passes); all-zero rows still produce exactly 0 -> exp = 1.0, so
    the "T == 1 iff no alpha touched the pixel" mask contract is exact.
    """
    C = l.shape[-1]
    i = jnp.arange(C)
    tri = (i[:, None] < i[None, :]).astype(l.dtype)   # row j feeds cols i > j
    return jax.lax.dot_general(
        l, tri, (((l.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


def _suffix_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Suffix-exclusive sum along the LAST axis (s[i] = sum_{j>i} x[j]) as
    one MXU matmul — replaces the backward's cumsum scan (see _excl_cumlog)."""
    C = x.shape[-1]
    i = jnp.arange(C)
    tri = (i[:, None] > i[None, :]).astype(x.dtype)
    return jax.lax.dot_general(
        x, tri, (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


class _Carry(NamedTuple):
    T: jnp.ndarray            # [256]
    color: jnp.ndarray        # [3, 256] — pixel axis LAST: the carry is
    #   materialized (read+written) every while/scan step, and a [256, 3]
    #   layout would lane-pad 3 -> 128 (42x traffic on the fattest carry
    #   leaf); transposed to the external [256, 3] contract once per call
    depth: jnp.ndarray        # [256]
    depth_index: jnp.ndarray  # [256] int32 (sorted-space position, -1 none)
    depth_weight: jnp.ndarray
    color_index: jnp.ndarray  # [256] int32
    color_weight: jnp.ndarray


def _init_carry():
    n = TILE * TILE
    return _Carry(
        T=jnp.ones(n),
        color=jnp.zeros((3, n)),
        depth=jnp.zeros(n),
        depth_index=jnp.full(n, -1, jnp.int32),
        depth_weight=jnp.zeros(n),
        color_index=jnp.full(n, -1, jnp.int32),
        color_weight=jnp.zeros(n),
    )


def _blend_chunk(carry: _Carry, feat_chunk: FeatCols, idx_chunk, pix,
                 opaque_threshold) -> _Carry:
    alpha, rgb_t, z, opaque = _chunk_alphas(feat_chunk, pix, opaque_threshold)

    one_minus = 1.0 - alpha
    excl = jnp.exp(_excl_cumlog(jnp.log1p(-alpha)))       # exclusive prod
    T_in = carry.T[:, None] * excl                        # [256, C]
    w = alpha * T_in                                      # [256, C]

    color = carry.color + jax.lax.dot_general(
        rgb_t, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [3, 256]

    # first opaque hit (front-to-back == ascending chunk position)
    has_hit = jnp.any(opaque, axis=1)
    first = jnp.argmax(opaque, axis=1)                    # first True
    new_hit = has_hit & (carry.depth_index < 0)
    depth = jnp.where(new_hit, z[first], carry.depth)
    depth_index = jnp.where(new_hit, idx_chunk[first], carry.depth_index)
    depth_weight = jnp.where(new_hit, w[jnp.arange(w.shape[0]), first], carry.depth_weight)

    # max blend-weight contributor
    best = jnp.argmax(w, axis=1)
    best_w = w[jnp.arange(w.shape[0]), best]
    better = best_w > carry.color_weight
    color_weight = jnp.where(better, best_w, carry.color_weight)
    color_index = jnp.where(better, idx_chunk[best], carry.color_index)

    return _Carry(
        T=carry.T * excl[:, -1] * one_minus[:, -1],
        color=color,
        depth=depth,
        depth_index=depth_index,
        depth_weight=depth_weight,
        color_index=color_index,
        color_weight=color_weight,
    )


def _chunk_slice(col: jnp.ndarray, c, chunk: int) -> jnp.ndarray:
    """Chunk ``c`` of a [..., Kt] column as [..., chunk].

    Reshapes to [..., n_chunks, chunk] (a free bitcast) and dynamic-slices
    ONE row of the n_chunks axis: a dynamic offset on the minor (lane) axis
    would defeat Mosaic's alignment analysis and lower to general lane
    rotations (measured 2x the whole blend's cost); the second-minor
    (sublane) axis slices cheaply.
    """
    Kt = col.shape[-1]
    r = col.reshape(col.shape[:-1] + (Kt // chunk, chunk))
    s = jax.lax.dynamic_slice_in_dim(r, c, 1, axis=r.ndim - 2)
    return s.reshape(col.shape[:-1] + (chunk,))


def _chunk_update(col: jnp.ndarray, upd: jnp.ndarray, c, chunk: int) -> jnp.ndarray:
    """Inverse of :func:`_chunk_slice`: write chunk ``c`` into a [..., Kt]
    column (same sublane-axis trick)."""
    Kt = col.shape[-1]
    r = col.reshape(col.shape[:-1] + (Kt // chunk, chunk))
    r = jax.lax.dynamic_update_slice_in_dim(
        r, upd[..., None, :], c, axis=r.ndim - 2)
    return r.reshape(col.shape)


def _slice_cols(cols: FeatCols, c, chunk: int) -> FeatCols:
    """Chunk ``c`` of every column (see _chunk_slice)."""
    return FeatCols(*(_chunk_slice(x, c, chunk) for x in cols))


def _tile_pixels(origin: jnp.ndarray) -> jnp.ndarray:
    """[256, 2] pixel-center coordinates of a tile given its (x, y) origin."""
    r = jnp.arange(TILE, dtype=jnp.float32)
    px = jnp.tile(r, TILE) + origin[0]
    py = jnp.repeat(r, TILE) + origin[1]
    return jnp.stack([px, py], axis=-1)


@partial(jax.jit, static_argnames=("differentiable",))
def blend_tiles(
    proj_sorted_feat: FeatCols,      # [P+1] columns, depth-sorted
    order: jnp.ndarray,              # [P] sorted -> original
    tile_lists: jnp.ndarray,         # [T, Kt]
    tile_counts: jnp.ndarray,        # [T]
    origins: jnp.ndarray,            # [T, 2]
    opaque_threshold: float,
    T_threshold: float = 1e-4,
    differentiable: bool = False,
) -> TileOutputs:
    """Blend every tile.  vmapped over tiles; chunked over each tile's list."""
    # map sorted-space sentinel V -> original-index sentinel -1
    order_pad = jnp.concatenate([order, jnp.array([-1], jnp.int32)])

    # Pre-gather every tile's features into contiguous [T, Kt] columns
    # with one batched gather per column: the chunk loop then reads
    # sequential memory.  (Per-chunk random-row gathers inside the loop
    # measured ~5x slower.)
    tile_feat = proj_sorted_feat.gather(tile_lists)   # FeatCols of [T, Kt]
    tile_gidx = order_pad[tile_lists]                 # [T, Kt]
    if not differentiable:
        return blend_tiles_blocked(
            tile_feat, tile_gidx, tile_counts, origins,
            opaque_threshold, T_threshold)
    return blend_tiles_pregathered(
        tile_feat, tile_gidx, tile_counts, origins,
        opaque_threshold, T_threshold, differentiable)


@partial(jax.jit, static_argnames=("differentiable",))
def blend_tiles_pregathered(
    tile_feat: FeatCols,       # [T, Kt] columns, depth-ordered
    tile_gidx: jnp.ndarray,    # [T, Kt] int32 original indices (-1 sentinel)
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    opaque_threshold: float,
    T_threshold: float = 1e-4,
    differentiable: bool = False,
) -> TileOutputs:
    """Blend from pre-gathered per-tile blocks (shardable over tiles)."""
    Kt = tile_feat.mean_x.shape[-1]
    chunk = min(CHUNK, Kt)
    assert Kt % chunk == 0, "tile_capacity must be a power of two >= 64"
    n_chunks = Kt // chunk

    def run_tile(tfeat, tgidx, count, origin):
        pix = _tile_pixels(origin)

        def chunk_step(carry, c):
            feat = _slice_cols(tfeat, c, chunk)
            gidx = _chunk_slice(tgidx, c, chunk)
            return _blend_chunk(carry, feat, gidx, pix, opaque_threshold)

        if differentiable:
            def body(carry, c):
                return jax.checkpoint(
                    lambda cr, cc: (chunk_step(cr, cc), None),
                    prevent_cse=False,
                )(carry, c)
            carry, _ = jax.lax.scan(body, _init_carry(), jnp.arange(n_chunks))
        else:
            active_chunks = (count + chunk - 1) // chunk

            def cond(state):
                c, carry = state
                return (c < active_chunks) & (jnp.max(carry.T) > T_threshold)

            def step(state):
                c, carry = state
                return c + 1, chunk_step(carry, c)

            _, carry = jax.lax.while_loop(cond, step, (jnp.int32(0), _init_carry()))

        return TileOutputs(
            color=carry.color.T,
            depth=carry.depth,
            depth_index=carry.depth_index,
            color_index=carry.color_index,
            depth_weight=carry.depth_weight,
            color_weight=carry.color_weight,
            T_final=carry.T,
        )

    return jax.vmap(run_tile)(tile_feat, tile_gidx, tile_counts, origins)


def _zero_trip_outputs(T: int) -> TileOutputs:
    """The vmapped while's init carry as outputs — what every count-0 tile
    produces."""
    npx = TILE * TILE
    return TileOutputs(
        color=jnp.zeros((T, npx, 3)),
        depth=jnp.zeros((T, npx)),
        depth_index=jnp.full((T, npx), -1, jnp.int32),
        color_index=jnp.full((T, npx), -1, jnp.int32),
        depth_weight=jnp.zeros((T, npx)),
        color_weight=jnp.zeros((T, npx)),
        T_final=jnp.ones((T, npx)),
    )


def blend_tiles_blocked(
    tile_feat: FeatCols,       # [T, Kt] columns, depth-ordered
    tile_gidx: jnp.ndarray,    # [T, Kt]
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    opaque_threshold: float,
    T_threshold: float = 1e-4,
    tile_block: int = 64,
) -> TileOutputs:
    """:func:`blend_tiles_pregathered` (inference path) as a sorted
    work-queue whose HBM traffic scales with the LIVE tile population.

    The vmapped-while formulation moves every tile's [256, chunk] alpha
    block on every joint trip: at 170x300 the 8x8-tile block-major grid
    pads 209 real tiles to 384 rows (46 % pure padding), dead tiles ride
    along too, and the joint trip count is the MAX chunk depth over all
    tiles.  Here tiles are sorted count-descending (live first, similar
    chunk depths adjacent), processed in ``tile_block``-row slices inside a
    ``while_loop`` whose trip count is ``ceil(live_tiles / tile_block)`` —
    a runtime scalar — and each slice's inner chunk walk is bounded by that
    slice's own max depth.  Unprocessed rows keep the zero-trip outputs,
    exactly what the full pass produces for count == 0, and results gather
    back to the original tile order: outputs are bitwise identical
    (tests/test_rasterizer.py::test_blocked_blend_matches_pregathered).

    Reference context: the CUDA rasterizer launches one thread block per
    occupied tile (SLAM/render.py:61-108 forward) — occupancy-scaled work
    is the contract being reproduced, not a new approximation.
    """
    T = tile_counts.shape[0]
    B = min(tile_block, T)
    Tp = -(-T // B) * B
    pad = Tp - T

    order = jnp.argsort(-tile_counts).astype(jnp.int32)

    def padt(x, fill=0):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    feat_s = FeatCols(*(padt(c[order]) for c in tile_feat))
    gidx_s = padt(tile_gidx[order], -1)
    counts_s = padt(tile_counts[order])
    origins_s = padt(origins[order])
    n_live = jnp.sum(tile_counts > 0)
    trips = (n_live + B - 1) // B

    def body(state):
        b, out = state

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, b * B, B, axis=0)

        blk = blend_tiles_pregathered(
            FeatCols(*(sl(c) for c in feat_s)), sl(gidx_s), sl(counts_s),
            sl(origins_s), opaque_threshold, T_threshold)
        out = jax.tree.map(
            lambda buf, x: jax.lax.dynamic_update_slice_in_dim(
                buf, x, b * B, 0), out, blk)
        return b + 1, out

    _, out_s = jax.lax.while_loop(
        lambda s: s[0] < trips, body,
        (jnp.int32(0), _zero_trip_outputs(Tp)))
    inv = jnp.argsort(order).astype(jnp.int32)
    return jax.tree.map(lambda x: x[inv], out_s)


# ---------------------------------------------------------------------------
# transmission-only blend (mask renders)
# ---------------------------------------------------------------------------

@jax.jit
def blend_transmission(
    tile_feat,                 # 6-tuple of [T, Kt] columns:
                               #   mean_x, mean_y, conic_a, conic_b, conic_c,
                               #   opacity
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    T_threshold: float = 1e-4,
) -> jnp.ndarray:
    """Per-pixel final transmittance ONLY — the piece the optimize loop's
    partial-render masks consume (reference ``evaluate_render_range``,
    mapper.py:471-508, uses the render's transmission map and nothing else
    in local mode).  Identical alpha math and early-exit rule as the full
    blend, minus color/depth/index bookkeeping and the SH shade — and the
    per-tile gather carries 6 columns per gaussian instead of 11.

    Exactness pinned by test_rasterizer.py::test_transmission_only_matches:
    the mask (T != 1) is exact — T == 1.0 iff every alpha is exactly 0 on
    both paths — and T itself agrees to reduction-order rounding.
    """
    Kt = tile_feat[0].shape[-1]
    chunk = min(CHUNK, Kt)

    def run_tile(tfeat, count, origin):
        pix = _tile_pixels(origin)
        active_chunks = (count + chunk - 1) // chunk

        def cond(state):
            c, T = state
            return (c < active_chunks) & (jnp.max(T) > T_threshold)

        def step(state):
            c, T = state
            mean_x, mean_y, ca, cb, cc, opa = (
                _chunk_slice(col, c, chunk) for col in tfeat)
            dx = pix[:, None, 0] - mean_x[None, :]
            dy = pix[:, None, 1] - mean_y[None, :]
            power = -0.5 * (ca[None, :] * dx * dx + cc[None, :] * dy * dy) \
                - cb[None, :] * dx * dy
            alpha = opa[None, :] * jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.where(power > 0, 0.0, alpha)
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
            # log-space product to match the full blend's _excl_cumlog route
            # (T-value agreement within reduction-order rounding; exactly 1.0
            # when every alpha is exactly 0 on both paths)
            return c + 1, T * jnp.exp(jnp.sum(jnp.log1p(-alpha), axis=1))

        _, T = jax.lax.while_loop(
            cond, step, (jnp.int32(0), jnp.ones(TILE * TILE)))
        return T

    return jax.vmap(run_tile)(tile_feat, tile_counts, origins)


def blend_transmission_blocked(
    tile_feat,                 # 6-tuple of [T, Kt] columns
    tile_counts: jnp.ndarray,  # [T]
    origins: jnp.ndarray,      # [T, 2]
    T_threshold: float = 1e-4,
    tile_block: int = 64,
) -> jnp.ndarray:
    """:func:`blend_transmission` as the same sorted work-queue as
    :func:`blend_tiles_blocked` — the mask renders' tile population is the
    OPTIMIZED pool's footprint (15-55 % of tiles at steady state), so the
    occupancy scaling matters even more here.  Unprocessed tiles keep
    T == 1 (the zero-trip value); outputs are bitwise identical to the
    full pass."""
    T = tile_counts.shape[0]
    B = min(tile_block, T)
    Tp = -(-T // B) * B
    pad = Tp - T

    order = jnp.argsort(-tile_counts).astype(jnp.int32)

    def padt(x, fill=0):
        if pad == 0:
            return x
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    feat_s = tuple(padt(c[order]) for c in tile_feat)
    counts_s = padt(tile_counts[order])
    origins_s = padt(origins[order])
    n_live = jnp.sum(tile_counts > 0)
    trips = (n_live + B - 1) // B

    def body(state):
        b, out = state

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, b * B, B, axis=0)

        blk = blend_transmission(tuple(sl(c) for c in feat_s),
                                 sl(counts_s), sl(origins_s), T_threshold)
        return b + 1, jax.lax.dynamic_update_slice_in_dim(out, blk, b * B, 0)

    _, out_s = jax.lax.while_loop(
        lambda s: s[0] < trips, body,
        (jnp.int32(0), jnp.ones((Tp, TILE * TILE))))
    inv = jnp.argsort(order).astype(jnp.int32)
    return out_s[inv]


# ---------------------------------------------------------------------------
# custom-VJP fused blend: early-exit forward AND hand-written backward
# ---------------------------------------------------------------------------
#
# The scan path above differentiates via jax.checkpoint: every optimize
# iteration pays (forward over ALL chunks) + (recompute + reverse over ALL
# chunks), even though typical tiles hold 1-2 live chunks.  The fused path
# mirrors the reference CUDA rasterizer (forward stops at T < threshold and
# records per-chunk state; backward walks the same range back-to-front,
# diff_gaussian_rasterization_depth backward.cu / SLAM/render.py:110-133):
#
#   C  = sum_i alpha_i T_i rgb_i,   T_i = prod_{j<i} (1 - alpha_j)
#   dL/drgb_i   = w_i g_C
#   dL/dalpha_i = T_i (rgb_i . g_C) - (s_i + T_fin g_T) / (1 - alpha_i),
#                 s_i = sum_{j>i} w_j (rgb_j . g_C)
#   depth out   = z of the first opaque hit  ->  dL/dz_k = g_D at that slot.
#
# Differentiable outputs: color, depth, T_final.  The hit-weight outputs and
# index maps are treated as non-differentiable (the optimize loss never
# consumes them; grads would be silently dropped — keep it that way).

_BIG = jnp.float32(3.0e38)


def _chunk_alphas_vjp(cols: FeatCols, pix, opaque_threshold):
    """Like _chunk_alphas but also returns the pieces the backward needs:
    exp-term and gradient gate.  dx/dy are NOT returned: the moment-matmul
    backward (see _fused_bwd) made the power chain their only consumer, so
    XLA fuses them instead of materializing two [256, C] tensors."""
    z = cols.depth
    rgb_t = jnp.stack([cols.r, cols.g, cols.b], axis=0)   # [3, C]
    elig = cols.elig > 0.5

    dx = pix[:, None, 0] - cols.mean_x[None, :]  # [256, C] (see _chunk_alphas
    dy = pix[:, None, 1] - cols.mean_y[None, :]  # on why not a [.., 2] stack)
    power = -0.5 * (cols.conic_a[None, :] * dx * dx
                    + cols.conic_c[None, :] * dy * dy) \
        - cols.conic_b[None, :] * dx * dy
    e = jnp.exp(jnp.minimum(power, 0.0))
    raw = cols.opacity[None, :] * e
    alpha = jnp.minimum(raw, ALPHA_MAX)
    gate = (power <= 0) & (raw >= ALPHA_EPS) & (raw < ALPHA_MAX)
    alpha = jnp.where((power > 0) | (raw < ALPHA_EPS), 0.0, alpha)
    opaque = elig[None, :] & (alpha >= opaque_threshold)
    return alpha, rgb_t, z, opaque, e, gate


def _moment_basis() -> jnp.ndarray:
    """[6, 256] constant pixel-moment basis in TILE-LOCAL coordinates:
    rows are (1, u, v, u^2, u*v, v^2) over the tile's 16x16 pixel grid.

    The backward needs six pixel-axis reductions sum_p gpow * f(dx, dy)
    with f in {ca*dx+cb*dy, cc*dy+cb*dx, dx^2, dx*dy, dy^2, ...}.  Expanding
    dx = u - (mean_x - origin_x) turns all of them into linear combinations
    of the raw moments S_k = sum_p B[k, p] * gpow[p, c] — ONE [6,256]x[256,C]
    MXU matmul against this compile-time constant, instead of six separate
    [256, C] product tensors (plus dx/dy themselves) materialized per chunk
    step (measured as the top HBM consumers of optimize_execute,
    scripts/hlo_traffic.py).  Local (not absolute) coordinates keep the
    recombination well-conditioned: |u| < 16 and |mean - origin| is bounded
    by the binning influence radius, so no catastrophic cancellation."""
    r = jnp.arange(TILE, dtype=jnp.float32)
    u = jnp.tile(r, TILE)            # [256] — matches _tile_pixels order
    v = jnp.repeat(r, TILE)
    one = jnp.ones_like(u)
    return jnp.stack([one, u, v, u * u, u * v, v * v], axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def blend_tiles_fused(tile_feat, tile_gidx, tile_counts, origins,
                      opaque_threshold, T_threshold,
                      use_pallas=False, pallas_interpret=False) -> TileOutputs:
    """Differentiable blend with early exit in forward and backward.

    Same inputs/outputs as :func:`blend_tiles_pregathered`; use for the
    optimize loop's render (`models/optimize.py`).  With ``use_pallas`` both
    the forward and the backward run as Pallas TPU kernels (grid = tiles,
    fully independent per-tile early exit)."""
    out, _ = _fused_fwd(tile_feat, tile_gidx, tile_counts, origins,
                        opaque_threshold, T_threshold,
                        use_pallas, pallas_interpret)
    return out


def _fused_fwd(tile_feat: FeatCols, tile_gidx, tile_counts, origins,
               opaque_threshold, T_threshold,
               use_pallas=False, pallas_interpret=False):
    Kt = tile_feat.mean_x.shape[-1]
    chunk = min(CHUNK, Kt)
    n_chunks = Kt // chunk

    if use_pallas:
        from . import pallas_blend

        out, entry_T, done = pallas_blend.blend_fwd_pallas(
            tile_feat.pack(), tile_gidx, tile_counts, origins,
            opaque_threshold, T_threshold, pallas_interpret)
        res = (tile_feat, tile_gidx, origins, entry_T, done,
               out.T_final, out.depth_index)
        return out, res

    def run_tile(tfeat, tgidx, count, origin):
        pix = _tile_pixels(origin)
        active_chunks = (count + chunk - 1) // chunk
        entry0 = jnp.zeros((n_chunks, TILE * TILE))

        def cond(state):
            c, carry, _ = state
            return (c < active_chunks) & (jnp.max(carry.T) > T_threshold)

        def step(state):
            c, carry, entry = state
            entry = jax.lax.dynamic_update_slice_in_dim(
                entry, carry.T[None], c, axis=0)
            feat = _slice_cols(tfeat, c, chunk)
            gidx = _chunk_slice(tgidx, c, chunk)
            return c + 1, _blend_chunk(carry, feat, gidx, pix, opaque_threshold), entry

        done, carry, entry = jax.lax.while_loop(
            cond, step, (jnp.int32(0), _init_carry(), entry0))
        out = TileOutputs(
            color=carry.color.T, depth=carry.depth,
            depth_index=carry.depth_index, color_index=carry.color_index,
            depth_weight=carry.depth_weight, color_weight=carry.color_weight,
            T_final=carry.T)
        return out, entry, done

    out, entry_T, done = jax.vmap(run_tile)(
        tile_feat, tile_gidx, tile_counts, origins)
    res = (tile_feat, tile_gidx, origins, entry_T, done,
           out.T_final, out.depth_index)
    return out, res


def _float_cot(g, like):
    """Cotangents for integer outputs arrive as float0 — replace with zeros."""
    if g is None or g.dtype == jax.dtypes.float0:
        return jnp.zeros(like.shape, jnp.float32)
    return g.astype(jnp.float32)


def _fused_bwd(opaque_threshold, T_threshold, use_pallas, pallas_interpret,
               res, g: TileOutputs):
    tile_feat, tile_gidx, origins, entry_T, done, T_fin, depth_index = res
    Kt = tile_feat.mean_x.shape[-1]
    chunk = min(CHUNK, Kt)

    g_color = _float_cot(g.color, T_fin[..., None].repeat(3, -1))
    g_depth = _float_cot(g.depth, T_fin)
    g_T = _float_cot(g.T_final, T_fin)

    if use_pallas:
        import numpy as np

        from . import pallas_blend

        g_feat = pallas_blend.blend_bwd_pallas(
            tile_feat.pack(), tile_gidx, origins, entry_T, done,
            g_color, g_depth, T_fin * g_T, depth_index,
            opaque_threshold, pallas_interpret)
        return (FeatCols.unpack(g_feat),
                np.zeros(tile_gidx.shape, jax.dtypes.float0),
                np.zeros(done.shape, jax.dtypes.float0),
                jnp.zeros_like(origins))

    def bwd_tile(tfeat, tgidx, origin, entry, n_done, Tf, didx,
                 gc, gd, gt):
        pix = _tile_pixels(origin)
        tfin_gt = Tf * gt                                   # [256]

        def psum(x):
            # pixel-axis reduction -> [C]
            return jnp.sum(x, axis=0)

        def cond(state):
            c, _, _ = state
            return c >= 0

        def step(state):
            c, s_carry, gfeat = state
            feat = _slice_cols(tfeat, c, chunk)
            gidx = _chunk_slice(tgidx, c, chunk)
            alpha, rgb_t, z, opaque, e, gate = \
                _chunk_alphas_vjp(feat, pix, opaque_threshold)

            one_minus = 1.0 - alpha
            excl = jnp.exp(_excl_cumlog(jnp.log1p(-alpha)))
            T_in = entry[c][:, None] * excl                 # [256, C]
            w = alpha * T_in

            rgbdot = jax.lax.dot_general(
                gc, rgb_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [256, C]
            wg = w * rgbdot
            tot = jnp.sum(wg, axis=1)
            s_in = _suffix_excl(wg)                         # suffix-exclusive
            s_total = s_in + s_carry[:, None]

            galpha = T_in * rgbdot \
                - (s_total + tfin_gt[:, None]) / one_minus
            galpha = jnp.where(gate, galpha, 0.0)

            gpow = galpha * alpha                           # [256, C]
            ca, cb, cc = feat.conic_a, feat.conic_b, feat.conic_c
            # six pixel reductions sum_p gpow * f(dx, dy) as ONE moment
            # matmul (see _moment_basis): S = B @ gpow, then recombine in
            # [C] space with the tile-local means a = mx - ox, b = my - oy.
            S = jax.lax.dot_general(
                _moment_basis(), gpow, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)        # [6, C]
            a = feat.mean_x - origin[0]
            b = feat.mean_y - origin[1]
            Ex = S[1] - a * S[0]                            # sum gpow*dx
            Ey = S[2] - b * S[0]                            # sum gpow*dy
            Exx = S[3] - 2.0 * a * S[1] + a * a * S[0]      # sum gpow*dx^2
            Exy = S[4] - a * S[2] - b * S[1] + a * b * S[0]
            Eyy = S[5] - 2.0 * b * S[2] + b * b * S[0]
            gmean_x = ca * Ex + cb * Ey
            gmean_y = cc * Ey + cb * Ex
            gca = -0.5 * Exx
            gcb = -Exy
            gcc = -0.5 * Eyy
            gopa = psum(galpha * e)
            grgb_t = jax.lax.dot_general(gc, w, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)  # [3, C]

            # depth: the forward recorded the hit's ORIGINAL index; a
            # gaussian appears at most once per tile list, so matching
            # indices recovers the hit slot (sentinels are -1 on both sides).
            hit = opaque & (gidx[None, :] == didx[:, None]) & (didx >= 0)[:, None]
            gz = psum(jnp.where(hit, gd[:, None], 0.0))

            # accumulate PACKED as [11, Kt] (Kt on lanes; a [Kt, 11] carry
            # would lane-pad 11 -> 128 and move ~12x per step) with the
            # chunk written on the SUBLANE axis of an [11, n_chunks, chunk]
            # view (a dynamic offset on the lane axis lowers to general
            # lane rotations — the measured _chunk_slice trap)
            gchunk = jnp.stack([
                gmean_x, gmean_y, gca, gcb, gcc, gz,
                grgb_t[0], grgb_t[1], grgb_t[2], gopa,
                jnp.zeros((chunk,)),
            ])                                              # [11, chunk]
            r = gfeat.reshape(11, Kt // chunk, chunk)
            r = jax.lax.dynamic_update_slice_in_dim(
                r, gchunk[:, None, :], c, axis=1)
            return c - 1, s_carry + tot, r.reshape(11, Kt)

        _, _, gfeat = jax.lax.while_loop(
            cond, step,
            (n_done - 1, jnp.zeros(TILE * TILE), jnp.zeros((11, Kt))))
        return gfeat

    g_packed = jax.vmap(bwd_tile)(
        tile_feat, tile_gidx, origins, entry_T, done, T_fin, depth_index,
        g_color, g_depth, g_T)                              # [T, 11, Kt]
    # unpack ONCE via a transpose (11 per-column lane-extractions would
    # re-read the padded array 11x)
    gT = jnp.transpose(g_packed, (1, 0, 2))
    g_feat = FeatCols(*(gT[i] for i in range(11)))

    import numpy as np

    # integer primals (gidx, counts) take float0 cotangents
    return (g_feat,
            np.zeros(tile_gidx.shape, jax.dtypes.float0),
            np.zeros(done.shape, jax.dtypes.float0),
            jnp.zeros_like(origins))


blend_tiles_fused.defvjp(_fused_fwd, _fused_bwd)
