"""Jitted Gaussian-map lifecycle operations with static shapes.

Each function mirrors a reference mapper behavior (cited per function) but is
reformulated mask/scatter-style over the fixed-capacity ``MapState``:
spawning samples a *fixed-size* candidate set with a validity mask, deletion
clears status flags, and all "dynamic" counts travel as traced scalars.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils
from ..utils.geometry import quat_align_z_to, normalize
from ..ops import knn as knn_ops
from ..ops import segment as segment_ops
from .gaussian_map import (
    FREE, STABLE, UNSTABLE, GaussianMapConfig, MapState,
    activated_opacity, activated_scales, gaussian_radius, derived_normal,
    shs_from_features, alive_mask, render_inputs, stable_mask,
)


class TempPoints(NamedTuple):
    """Fixed-capacity spawn staging buffer (the reference's
    ``temp_pointcloud``, mapper.py:21,128-132)."""

    xyz: jnp.ndarray      # [Kt, 3] world
    normal: jnp.ndarray   # [Kt, 3] world
    color: jnp.ndarray    # [Kt, 3]
    opacity: jnp.ndarray  # [Kt, 1] raw logit
    valid: jnp.ndarray    # [Kt] bool


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@jax.jit
def high_water_mark(state: MapState) -> jnp.ndarray:
    """1 + the highest occupied slot index (0 when empty).  Inserts fill the
    lowest free slots, so alive rows always live below this mark."""
    alive = state.status != FREE
    idx = jax.lax.broadcasted_iota(jnp.int32, alive.shape + (1,), 0)[:, 0]
    return jnp.max(jnp.where(alive, idx + 1, 0))


# ---------------------------------------------------------------------------
# pixel sampling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_n",))
def sample_masked_pixels(key, mask: jnp.ndarray, n_target, max_n: int):
    """Uniformly sample up to ``n_target`` pixels where ``mask`` is set.

    Static-shape version of ``sample_pixels`` (SLAM/utils.py:141-183): random
    priorities + top_k instead of randperm.  Returns ([max_n] flat indices,
    [max_n] valid).
    """
    flat = mask.reshape(-1)
    r = jax.random.uniform(key, flat.shape)
    priority = jnp.where(flat, r, -1.0)
    vals, idx = jax.lax.top_k(priority, max_n)
    rank = jnp.arange(max_n)
    valid = (vals >= 0.0) & (rank < n_target)
    return idx.astype(jnp.int32), valid


@partial(jax.jit, static_argnames=("max_each",))
def gather_temp_points(
    vertex_w: jnp.ndarray, normal_w: jnp.ndarray, color: jnp.ndarray,
    idx_a, valid_a, idx_b, valid_b, init_opacity: float, max_each: int,
) -> TempPoints:
    """Gather two sampled pixel groups into one temp buffer and
    zero-normal-filter them (``add_empty_points``, gaussian_pointcloud.py:305-349)."""
    idx = jnp.concatenate([idx_a, idx_b])
    valid = jnp.concatenate([valid_a, valid_b])
    vflat = vertex_w.reshape(-1, 3)
    nflat = normal_w.reshape(-1, 3)
    cflat = color.reshape(-1, 3)
    xyz = vflat[idx]
    nrm = nflat[idx]
    col = cflat[idx]
    valid = valid & (jnp.sum(jnp.abs(nrm), axis=-1) > 0)
    nrm = normalize(nrm)
    opa = jnp.full((idx.shape[0], 1), inverse_sigmoid(init_opacity), jnp.float32)
    return TempPoints(xyz=xyz, normal=nrm, color=col, opacity=opa, valid=valid)


# ---------------------------------------------------------------------------
# spawn pipeline
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("ref_limit",))
def temp_filter_dedup(temp: TempPoints, state: MapState,
                      ref_limit: int | None = None,
                      query_count=None) -> TempPoints:
    """Drop temp points inside an existing unstable gaussian's 0.6-radius
    3-NN neighbourhood (``temp_points_filter``, mapper.py:797-826).

    ``ref_limit`` bounds the KNN reference scan to the map's occupied slot
    prefix (inserts always fill the lowest free slots, so alive rows live in
    ``[0, high_water_mark)``).  On top of that the unstable rows are
    stable-partitioned to a live prefix so the KNN's chunk loop trips scale
    with the actual UNSTABLE count, and ``query_count`` (live temp rows —
    the caller compacts the temp buffer first) bounds the query blocks —
    per-frame KNN traffic then scales with live x live, not capacity x
    capacity.  Selection is unchanged: a stable partition preserves the
    relative order of valid rows, which is the tournament's tie-break key.
    """
    lim = ref_limit or state.capacity
    status = state.status[:lim]
    unstable = status == UNSTABLE
    order_r = segment_ops.stable_partition_order(unstable)
    xyz = state.xyz[:lim][order_r]
    radius = gaussian_radius(state.scaling[:lim])[order_r]
    n_unstable = jnp.sum(unstable)
    valid_p = jnp.arange(lim) < n_unstable
    d2, idx = knn_ops.knn(temp.xyz, xyz, valid_p, k=3,
                          query_count=query_count, ref_count=n_unstable)
    corr = jnp.where(idx >= 0, radius[jnp.clip(idx, 0)] * 0.6, 0.0)
    inside = jnp.any(jnp.sqrt(jnp.where(jnp.isinf(d2), jnp.inf, d2)) < corr, axis=-1)
    has_unstable = n_unstable > 0
    return temp._replace(valid=temp.valid & ~(inside & has_unstable))


@partial(jax.jit, static_argnames=("height", "width"))
def temp_attach_to_stable(
    temp: TempPoints, state: MapState, stable_color_index: jnp.ndarray,
    w2c: jnp.ndarray, K: jnp.ndarray, height: int, width: int,
    add_depth_thres: float, low_opacity: float = 0.1,
) -> TempPoints:
    """Project temp points; those landing on a rendered *stable* gaussian
    within half the depth-spawn threshold of its plane get demoted to low
    opacity (``temp_points_attach``, mapper.py:829-881)."""
    p_c = jnp.matmul(temp.xyz, w2c[:3, :3].T,
                     precision=jax.lax.Precision.HIGHEST) + w2c[:3, 3]
    z = jnp.maximum(p_c[:, 2], 1e-6)
    u = jnp.floor(K[0, 0] * p_c[:, 0] / z + K[0, 2]).astype(jnp.int32)
    v = jnp.floor(K[1, 1] * p_c[:, 1] / z + K[1, 2]).astype(jnp.int32)
    inview = (u >= 0) & (u < width) & (v >= 0) & (v < height) & (p_c[:, 2] > 0)
    uc = jnp.clip(u, 0, width - 1)
    vc = jnp.clip(v, 0, height - 1)
    sidx = stable_color_index[vc, uc]
    hit = inview & (sidx >= 0)
    gi = jnp.clip(sidx, 0)
    s_normal = derived_normal(state.scaling, state.rotation)[gi]
    s_xyz = state.xyz[gi]
    plane_d = jnp.abs(jnp.sum((s_xyz - temp.xyz) * s_normal, axis=-1))
    attach = hit & (plane_d < 0.5 * add_depth_thres) & temp.valid
    new_opa = jnp.where(
        attach[:, None],
        inverse_sigmoid(jnp.full_like(temp.opacity, low_opacity)),
        temp.opacity,
    )
    return temp._replace(opacity=new_opa)


@partial(jax.jit, static_argnames=("config", "ref_limit"))
def temp_scale_init(temp: TempPoints, state: MapState,
                    config: GaussianMapConfig,
                    ref_limit: int | None = None,
                    query_count=None) -> Tuple[TempPoints, jnp.ndarray]:
    """3-NN based scale initialization + crowding rejection
    (``update_geometry``, gaussian_pointcloud.py:366-405; the CUDA
    ``distCUDA2`` fork becomes :func:`rtgslam_tpu.ops.knn.knn`).

    Returns (filtered temp, log-scales [Kt, 3]).  ``ref_limit`` /
    ``query_count`` as in :func:`temp_filter_dedup`; the [temp ++ map]
    reference concat is stable-partitioned to a valid prefix so the chunk
    trips scale with live counts (dedup holes in the temp prefix included).
    """
    lim = ref_limit or state.capacity
    alive = state.status[:lim] != FREE
    ref_xyz = jnp.concatenate([temp.xyz, state.xyz[:lim]], axis=0)
    ref_valid = jnp.concatenate([temp.valid, alive], axis=0)
    temp_radius = jnp.zeros(temp.xyz.shape[0])  # fresh temp scales ~1e-6
    ref_radius = jnp.concatenate(
        [temp_radius, gaussian_radius(state.scaling[:lim])])

    order_r = segment_ops.stable_partition_order(ref_valid)
    ref_xyz = ref_xyz[order_r]
    ref_radius = ref_radius[order_r]
    n_valid = jnp.sum(ref_valid)
    valid_p = jnp.arange(ref_valid.shape[0]) < n_valid

    d2, idx = knn_ops.knn(temp.xyz, ref_xyz, valid_p, k=4,
                          query_count=query_count, ref_count=n_valid)
    d2, idx = d2[:, 1:], idx[:, 1:]  # drop self-match
    safe_idx = jnp.clip(idx, 0)
    dist = jnp.sqrt(jnp.where(jnp.isinf(d2), 1e12, d2)) - 3.0 * ref_radius[safe_idx]
    dist = jnp.where(idx >= 0, dist, 1e6)

    crowded = jnp.any(dist < 0, axis=-1)
    valid = temp.valid & ~crowded

    mean_sq = jnp.mean(jnp.minimum(dist, 1e3) ** 2, axis=-1)
    scales = jnp.clip(jnp.sqrt(mean_sq), config.min_radius, config.max_radius)
    factor = jnp.asarray(config.xyz_factor, jnp.float32)
    log_scales = jnp.log(config.scale_factor * scales[:, None] * factor[None, :]
                         + 1e-12)
    return temp._replace(valid=valid), log_scales


@partial(jax.jit, static_argnames=("config",))
def insert_temp(state: MapState, temp: TempPoints, log_scales: jnp.ndarray,
                time, config: GaussianMapConfig) -> Tuple[MapState, jnp.ndarray]:
    """Scatter valid temp points into FREE slots as UNSTABLE gaussians
    (``temp_to_optimize`` -> ``pointcloud.cat``, mapper.py:884-896).

    Returns (state, inserted count, slots [Kt] — the slot index each temp
    row landed in, sentinel = capacity for dropped/invalid rows; consumed
    by frame_chain's incremental lifecycle render).  Capacity overflow
    silently drops the tail (observable through count vs temp validity sum).
    """
    P = state.capacity
    Kt = temp.xyz.shape[0]
    free = jnp.nonzero(state.status == FREE, size=Kt, fill_value=P)[0]
    free_rank = jnp.arange(Kt)
    n_free = jnp.sum(state.status == FREE)

    # pack valid temp entries first so they pair with the first free slots
    order = segment_ops.stable_partition_order(temp.valid)  # valid first, stable
    t_xyz = temp.xyz[order]
    t_normal = temp.normal[order]
    t_color = temp.color[order]
    t_opa = temp.opacity[order]
    t_scales = log_scales[order]
    t_valid = temp.valid[order] & (free_rank < n_free)

    # invalid rows scatter out of bounds and are dropped; valid free slots are
    # unique, so the scatter is race-free
    slots = jnp.where(t_valid, free, P)
    if isinstance(config.xyz_factor, tuple) and all(f == 1.0 for f in config.xyz_factor):
        rots = jnp.zeros((Kt, 4)).at[:, 0].set(1.0)
    else:
        rots = quat_align_z_to(t_normal)
    f_dc = sh_utils.rgb_to_sh(t_color)

    def scatter(arr, new_vals):
        return arr.at[slots].set(new_vals.astype(arr.dtype), mode="drop")

    new_state = state.replace(
        xyz=scatter(state.xyz, t_xyz),
        features_dc=scatter(state.features_dc, f_dc),
        features_rest=scatter(state.features_rest,
                              jnp.zeros((Kt,) + state.features_rest.shape[1:])),
        scaling=scatter(state.scaling, t_scales),
        rotation=scatter(state.rotation, rots),
        opacity=scatter(state.opacity, t_opa),
        confidence=scatter(state.confidence, jnp.zeros((Kt, 1))),
        add_tick=scatter(state.add_tick,
                         jnp.full((Kt, 1), time, jnp.int32)),
        depth_error_counter=scatter(state.depth_error_counter,
                                    jnp.zeros((Kt, 1), jnp.int32)),
        color_error_counter=scatter(state.color_error_counter,
                                    jnp.zeros((Kt, 1), jnp.int32)),
        status=scatter(state.status, jnp.full((Kt,), UNSTABLE, jnp.int32)),
    )
    return new_state, jnp.sum(t_valid), slots


# ---------------------------------------------------------------------------
# lifecycle
# ---------------------------------------------------------------------------

@jax.jit
def fix_confident(state: MapState, stable_confidence_thres: float) -> MapState:
    """UNSTABLE -> STABLE when confidence exceeds the threshold; confidence
    clipped at the threshold (``gaussians_fix``, mapper.py:253-271)."""
    promote = (state.status == UNSTABLE) & (
        state.confidence[:, 0] > stable_confidence_thres)
    return state.replace(
        status=jnp.where(promote, STABLE, state.status),
        confidence=jnp.where(promote[:, None],
                             jnp.minimum(state.confidence, stable_confidence_thres),
                             state.confidence),
    )


@jax.jit
def fix_all(state: MapState) -> MapState:
    """Promote every unstable gaussian (final global opt, mapper.py:596-597)."""
    return state.replace(status=jnp.where(state.status == UNSTABLE, STABLE, state.status))


@partial(jax.jit, static_argnames=("unstable",))
def delete_gaussians(state: MapState, time, unstable_time_window: float,
                     unstable: bool = True) -> MapState:
    """Free oversized gaussians (radius > 10x pool mean) and, for the
    unstable pool, gaussians that never stabilized within the time window
    (``gaussians_delete``, mapper.py:298-333)."""
    pool = state.status == (UNSTABLE if unstable else STABLE)
    radius = gaussian_radius(state.scaling)
    pool_n = jnp.maximum(jnp.sum(pool), 1)
    mean_radius = jnp.sum(jnp.where(pool, radius, 0.0)) / pool_n
    big = pool & (radius > mean_radius * 10.0)
    if unstable:
        old = pool & ((time - state.add_tick[:, 0]) > unstable_time_window)
        kill = big | old
    else:
        kill = big
    return state.replace(status=jnp.where(kill, FREE, state.status))


@partial(jax.jit, static_argnames=("num_gaussians",))
def error_update(
    state: MapState,
    render_color, render_depth, render_normal, depth_index, color_index,
    gt_color, gt_depth,
    add_color_thres: float, add_depth_thres: float,
    time, num_gaussians: int,
) -> MapState:
    """Per-gaussian error bookkeeping + self-healing
    (``error_gaussians_remove``, mapper.py:510-591 — the CUDA
    ``accumulate_gaussian_error`` becomes a segment reduction).

    Stable gaussians accumulating mean depth error > 2x spawn threshold get a
    depth strike; color likewise.  >= 10 depth strikes -> delete; >= 10 color
    strikes -> confidence reset + re-aged (``gaussians_release``,
    mapper.py:286-295).
    """
    gt_d = gt_depth[..., 0] if gt_depth.ndim == 3 else gt_depth
    r_d = render_depth[..., 0] if render_depth.ndim == 3 else render_depth
    depth_err = jnp.maximum(gt_d - r_d, 0.0)  # only under-estimation counts
    # channel SUM here vs channel MEAN in spawn_step — deliberate 3x
    # asymmetry copied from the reference (strike: mapper.py:529-530 sums;
    # spawn: mapper.py:760-762 means), both against add_color_thres
    color_err = jnp.sum(jnp.abs(gt_color - render_color), axis=-1)
    invalid = (gt_d == 0) | (depth_index < 0)
    depth_err = jnp.where(invalid, 0.0, depth_err)
    color_err = jnp.where(gt_d == 0, 0.0, color_err)
    # The reference also zeroes the per-pixel normal error before the
    # scatter (mapper.py:532 ``normal_error = devF(torch.zeros_like(...))``)
    # — strike logic only ever consumes color/depth; kept for exact parity.
    normal_err = jnp.zeros_like(depth_err)

    g_color, g_depth, _ = segment_ops.accumulate_gaussian_error(
        color_err, depth_err, normal_err, color_index, depth_index,
        num_gaussians=num_gaussians)

    stable = state.status == STABLE
    depth_strike = stable & (g_depth > 2.0 * add_depth_thres)
    color_strike = stable & (g_color > 2.0 * add_color_thres)
    dec = state.depth_error_counter + depth_strike[:, None].astype(jnp.int32)
    cec = state.color_error_counter + color_strike[:, None].astype(jnp.int32)

    delete = stable & (dec[:, 0] >= 10)
    release = stable & (cec[:, 0] >= 10) & ~delete
    return state.replace(
        depth_error_counter=dec,
        color_error_counter=cec,
        status=jnp.where(delete, FREE, state.status),
        confidence=jnp.where(release[:, None], 0.0, state.confidence),
        add_tick=jnp.where(release[:, None], time, state.add_tick),
    )


# ---------------------------------------------------------------------------
# history merge
# ---------------------------------------------------------------------------

def _slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Batched spherical interpolation with lerp fallback for near-colinear
    quaternions (``SLAM/utils.py:593-652``).

    DELIBERATE DIVERGENCE: q1 is flipped into q0's hemisphere when
    ``dot < 0``.  The reference slerp has no hemisphere correction, so an
    optimized rotation that lands on the antipodal representation of its
    history snapshot (q and -q encode the same rotation) would lerp
    straight through the zero quaternion (dot ~ -1 routes to the lerp
    branch) or take the long great-circle path — either corrupts the
    merged rotation.  Flipping changes nothing when dot >= 0."""
    q0n, q1n = normalize(q0), normalize(q1)
    dot = jnp.sum(q0n * q1n, axis=-1, keepdims=True)
    flip = jnp.where(dot < 0.0, -1.0, 1.0)
    q1, q1n, dot = q1 * flip, q1n * flip, dot * flip
    colinear = jnp.abs(dot) > 0.9995
    theta0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin0 = jnp.sin(theta0)
    safe_sin0 = jnp.where(jnp.abs(sin0) < 1e-6, 1.0, sin0)
    s0 = jnp.sin((1 - t) * theta0) / safe_sin0
    s1 = jnp.sin(t * theta0) / safe_sin0
    slerped = s0 * q0 + s1 * q1
    lerped = q0 + t * (q1 - q0)
    return jnp.where(colinear, lerped, slerped)


@jax.jit
def history_merge(state: MapState, hist: Dict[str, jnp.ndarray],
                  max_weight: float, update_mask: jnp.ndarray) -> MapState:
    """EMA the optimized parameters toward their pre-optimization values,
    weighted by how confident each gaussian already was
    (``history_merge``, mapper.py:212-250).

    The reference indexes a scalar ``history_weight[0]`` for the feature /
    scaling merges — we use the principled per-gaussian weight throughout.
    Rotation is slerped in activated space.
    """
    w = max_weight * hist["confidence"] / (state.confidence + 1e-6)  # [P, 1]
    w = jnp.where(update_mask[:, None], w, 0.0)

    rot = _slerp(hist["rotation_act"], normalize(state.rotation), 1.0 - w)
    return state.replace(
        xyz=hist["xyz"] * w + (1 - w) * state.xyz,
        features_dc=hist["features_dc"] * w + (1 - w) * state.features_dc,
        features_rest=hist["features_rest"] * w[..., None] + (1 - w[..., None]) * state.features_rest,
        scaling=hist["scaling"] * w + (1 - w) * state.scaling,
        rotation=rot,
    )


# ---------------------------------------------------------------------------
# fused per-frame composites (fewer dispatches: each device call costs a
# full round trip in this environment and launch overhead on real hardware)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("config", "max_each", "height", "width",
                                   "first_frame", "has_stable", "ref_limit"))
def spawn_step(
    key, state: MapState,
    vertex_w, normal_w, color, depth,             # frame maps [H, W, *]
    model_T, model_depth, model_color, model_depth_index,  # model render
    stable_color_index,                            # [H, W] (ignored unless has_stable)
    w2c, K, time,
    uniform_sample_num, transmission_sample_ratio, error_sample_ratio,
    add_transmission_thres, add_depth_thres, add_color_thres,
    config: GaussianMapConfig, max_each: int, height: int, width: int,
    first_frame: bool, has_stable: bool, ref_limit: int,
):
    """The whole ``gaussians_add`` chain (sample -> gather -> dedup ->
    attach -> scale-init -> insert) as ONE executable
    (reference mapper.py:128-132,715-896)."""
    k1, k2 = jax.random.split(key)
    d = depth[..., 0] if depth.ndim == 3 else depth
    if first_frame:
        idx_a, val_a = sample_masked_pixels(k1, d > 0, uniform_sample_num, max_each)
        idx_b = jnp.zeros((max_each,), jnp.int32)
        val_b = jnp.zeros((max_each,), bool)
    else:
        T = model_T[..., 0]
        trans_mask = (T > add_transmission_thres) & (d > 0)
        trans_num = (transmission_sample_ratio
                     * (jnp.sum(trans_mask) / d.size)
                     * uniform_sample_num).astype(jnp.int32)
        idx_a, val_a = sample_masked_pixels(k1, trans_mask, trans_num, max_each)

        depth_err = jnp.abs(d - model_depth[..., 0])
        color_err = jnp.mean(jnp.abs(color - model_color), axis=-1)
        depth_mask = ((depth_err > add_depth_thres) & (d > 0)
                      & (model_depth_index > -1))
        color_mask = ((color_err > add_color_thres) & (d > 0)
                      & (T < add_transmission_thres))
        err_mask = (depth_mask | color_mask) & ~trans_mask
        err_num = (jnp.sum(err_mask) * error_sample_ratio).astype(jnp.int32)
        idx_b, val_b = sample_masked_pixels(k2, err_mask, err_num, max_each)

    temp = gather_temp_points(vertex_w, normal_w, color, idx_a, val_a,
                              idx_b, val_b, config.init_opacity, max_each)
    # Compact live temp rows to a prefix so both KNNs below bound their
    # query blocks by the LIVE spawn count (typically a few hundred) instead
    # of the static 2*max_each buffer.  A stable partition preserves the
    # relative order of valid rows, so insert_temp's slot assignment — and
    # with it the whole downstream map — is unchanged.
    order_t = segment_ops.stable_partition_order(temp.valid)
    temp = TempPoints(*(x[order_t] for x in temp))
    live = jnp.sum(temp.valid)
    temp = temp_filter_dedup(temp, state, ref_limit=ref_limit,
                             query_count=live)
    if has_stable:
        temp = temp_attach_to_stable(temp, state, stable_color_index,
                                     w2c, K, height, width, add_depth_thres)
    temp, log_scales = temp_scale_init(temp, state, config,
                                       ref_limit=ref_limit, query_count=live)
    return insert_temp(state, temp, log_scales, time, config)


@partial(jax.jit, static_argnames=("num_gaussians",))
def lifecycle_step(
    state: MapState,
    render_color, render_depth, render_normal, depth_index, color_index,
    gt_color, gt_depth,
    stable_confidence_thres, add_color_thres, add_depth_thres,
    time, unstable_time_window, num_gaussians: int,
):
    """Post-optimize lifecycle (fix -> error strikes -> unstable delete) as
    ONE executable (reference mapper.py:123-126)."""
    state = fix_confident(state, stable_confidence_thres)
    # error_update's strikes/deletes are masked to stable rows, so it is a
    # no-op when the stable pool is empty (no host gate needed)
    state = error_update(
        state, render_color, render_depth, render_normal,
        depth_index, color_index, gt_color, gt_depth,
        add_color_thres, add_depth_thres, time, num_gaussians)
    return delete_gaussians(state, time, unstable_time_window, unstable=True)


@jax.jit
def map_counters(state: MapState):
    """(high-water mark, stable count) in one dispatch — fetched lazily by
    the host to size the next spawn without a blocking mid-frame sync."""
    return high_water_mark(state), jnp.sum(state.status == STABLE)


@partial(jax.jit, static_argnames=(
    "config", "max_each", "height", "width", "first_frame", "has_stable",
    "ref_limit", "settings"))
def spawn_chain(
    key, state: MapState,
    vertex_w, normal_w, color, depth,             # frame maps [H, W, *]
    w2c, K, campos, time,
    uniform_sample_num, transmission_sample_ratio, error_sample_ratio,
    add_transmission_thres, add_depth_thres, add_color_thres,
    config: GaussianMapConfig, max_each: int, height: int, width: int,
    first_frame: bool, has_stable: bool, ref_limit: int, settings,
):
    """``spawn_step`` plus the model/stable renders it consumes, as ONE
    executable (reference mapper.py:715-896 renders the global map at :728
    and the stable map at :849 as separate kernel launches; both share ONE
    projection/sort/shade pass here — render_model_and_stable).

    Returns (state', n_inserted, model_render_out, base_pass, slots): the
    model render doubles as this frame's ``model_map`` so the host never
    re-renders for it; ``base_pass``/``slots`` let frame_chain's lifecycle
    render resume from this pass instead of re-projecting and re-sorting
    (api.render_with_inserted).  base_pass is None on the first frame.
    """
    from ..ops.rasterize.api import render_model_and_stable

    zero_hw1 = jnp.zeros((height, width, 1))
    if first_frame:
        model_out = None
        base = None
        model_T, model_depth = zero_hw1, zero_hw1
        model_color = jnp.zeros((height, width, 3))
        model_didx = jnp.full((height, width), -1, jnp.int32)
        stable_cidx = jnp.full((height, width), -1, jnp.int32)
    else:
        # the pair render handles an empty stable pool exactly (index map
        # all -1) at the cost of one re-blend (~0.1 ms) — not worth a
        # third retrace bucket on has_stable
        model_out, stable_cidx, base = render_model_and_stable.__wrapped__(
            render_inputs(state, alive_mask(state)), stable_mask(state),
            w2c, K, campos, settings)
        model_T, model_depth = model_out["T_map"], model_out["depth"]
        model_color = model_out["render"]
        model_didx = model_out["depth_index_map"]

    state, n_inserted, slots = spawn_step.__wrapped__(
        key, state, vertex_w, normal_w, color, depth,
        model_T, model_depth, model_color, model_didx, stable_cidx,
        w2c, K, time,
        uniform_sample_num, transmission_sample_ratio, error_sample_ratio,
        add_transmission_thres, add_depth_thres, add_color_thres,
        config, max_each, height, width, first_frame, has_stable, ref_limit)
    return state, n_inserted, model_out, base, slots


@partial(jax.jit, static_argnames=("num_gaussians", "settings"))
def lifecycle_chain(
    state: MapState,
    w2c, K, campos,
    gt_color, gt_depth,
    stable_confidence_thres, add_color_thres, add_depth_thres,
    time, unstable_time_window, num_gaussians: int, settings,
):
    """``lifecycle_step`` plus the global render it scores against, plus the
    occupancy counters the next frame's spawn needs — ONE executable.

    Returns (state', render_out, high_water_mark, n_stable).  The counters
    are computed on the POST-lifecycle state so the host can size the next
    spawn's KNN scan bound and stable-render gate without a fresh dispatch
    (it fetches these two scalars lazily, after the device has already
    drained this frame's work).
    """
    from ..ops.rasterize.api import _render_impl

    out = _render_impl.__wrapped__(
        render_inputs(state, alive_mask(state)), w2c, K, campos, None,
        settings, False, False)
    state, hwm, n_stable = lifecycle_post_render.__wrapped__(
        state, out, gt_color, gt_depth,
        stable_confidence_thres, add_color_thres, add_depth_thres,
        time, unstable_time_window, num_gaussians)
    return state, out, hwm, n_stable


@partial(jax.jit, static_argnames=("num_gaussians",))
def lifecycle_post_render(
    state: MapState,
    out,                          # render output dict (any render variant)
    gt_color, gt_depth,
    stable_confidence_thres, add_color_thres, add_depth_thres,
    time, unstable_time_window, num_gaussians: int,
):
    """The post-render half of :func:`lifecycle_chain` (lifecycle_step +
    occupancy counters) — shared by the standalone chain and frame_chain's
    incremental-render path."""
    state = lifecycle_step.__wrapped__(
        state, out["render"], out["depth"], out["normal"],
        out["depth_index_map"], out["color_index_map"],
        gt_color, gt_depth,
        stable_confidence_thres, add_color_thres, add_depth_thres,
        time, unstable_time_window, num_gaussians)
    n_stable = jnp.sum(state.status == STABLE)
    return state, high_water_mark(state), n_stable


@partial(jax.jit, static_argnames=(
    "config", "max_each", "height", "width", "has_stable",
    "ref_limit", "settings"))
def frame_chain(
    key, state: MapState,
    vertex_w, normal_w, color, depth,             # frame maps [H, W, *]
    w2c, K, campos, time,
    uniform_sample_num, transmission_sample_ratio, error_sample_ratio,
    add_transmission_thres, add_depth_thres, add_color_thres,
    stable_confidence_thres, unstable_time_window,
    config: GaussianMapConfig, max_each: int, height: int, width: int,
    has_stable: bool, ref_limit: int, settings,
):
    """spawn_chain + lifecycle as ONE executable, for frames with no
    optimization pass between them (5 of 6 frames at the Replica operating
    point).  The reference launches these as separate kernel groups
    (mapper.py:119-132); here each extra dispatch costs a device round trip,
    so the non-optimize frame becomes a single device call.

    The lifecycle render resumes from the spawn render's projection/sort/
    shade pass (the two states differ ONLY by the rows insert_temp just
    scattered), so a non-optimize frame pays for exactly ONE [P]-row
    projection + [P]-key depth sort total (api.render_with_inserted).

    Returns (state', n_inserted, model_out, lifecycle_render, hwm, n_stable).
    """
    from ..ops.rasterize.api import render_with_inserted

    state, n_inserted, model_out, base, slots = spawn_chain.__wrapped__(
        key, state, vertex_w, normal_w, color, depth,
        w2c, K, campos, time,
        uniform_sample_num, transmission_sample_ratio, error_sample_ratio,
        add_transmission_thres, add_depth_thres, add_color_thres,
        config, max_each, height, width, False, has_stable, ref_limit,
        settings)

    # gather ONLY the inserted rows (activated) for the incremental render;
    # dropped/invalid rows gather slot capacity-1 but carry alive=False so
    # they can never enter a tile list
    P = config.capacity
    ok = slots < P
    sl = jnp.minimum(slots, P - 1)
    scaling, rotation = state.scaling[sl], state.rotation[sl]
    M = sl.shape[0]
    new_rows = {
        "xyz": state.xyz[sl],
        "scales": activated_scales(scaling),
        "rotations": normalize(rotation),
        "opacity": activated_opacity(state.opacity[sl]),
        "shs_flat": shs_from_features(
            state.features_dc[sl], state.features_rest[sl]).reshape(M, -1),
        "normal": derived_normal(scaling, rotation),
        "alive": ok,
    }
    normals_full = derived_normal(state.scaling, state.rotation)
    out = render_with_inserted.__wrapped__(
        new_rows, sl, normals_full, base, w2c, K, campos, settings)

    state, hwm, n_stable = lifecycle_post_render.__wrapped__(
        state, out, color, depth,
        stable_confidence_thres, add_color_thres, add_depth_thres,
        time, unstable_time_window, config.capacity)
    return state, n_inserted, model_out, out, hwm, n_stable


# ---------------------------------------------------------------------------
# Donated twins (mapper-facing).
#
# The map is one fixed-capacity SoA (~capacity x 60 f32); every chain above
# rewrites it by masked scatter.  Without input/output aliasing XLA must
# materialise a full copy of each updated field per call (copy-on-write),
# costing HBM bandwidth and 2x peak memory for the state.  These twins donate
# the state so the scatters run in place.  Contract: the caller must DROP its
# reference to the passed state — the mapper reassigns ``self.state`` at every
# call site.  The value-semantics originals above stay for tests and any
# caller that still needs the old state (e.g. test_parallel feeds one state to
# two implementations).  The pipelined system's tracker snapshot copies
# ``state.xyz`` before publishing (system.py) so donation can never invalidate
# a cross-thread reference.
# ---------------------------------------------------------------------------
_DONATE = {"donate_argnames": ("state",)}

spawn_chain_donated = partial(
    jax.jit, static_argnames=(
        "config", "max_each", "height", "width", "first_frame", "has_stable",
        "ref_limit", "settings"), **_DONATE)(spawn_chain.__wrapped__)

lifecycle_chain_donated = partial(
    jax.jit, static_argnames=("num_gaussians", "settings"),
    **_DONATE)(lifecycle_chain.__wrapped__)

frame_chain_donated = partial(
    jax.jit, static_argnames=(
        "config", "max_each", "height", "width", "has_stable",
        "ref_limit", "settings"), **_DONATE)(frame_chain.__wrapped__)

fix_all_donated = partial(jax.jit, **_DONATE)(fix_all.__wrapped__)

delete_gaussians_donated = partial(
    jax.jit, static_argnames=("unstable",), **_DONATE)(
    delete_gaussians.__wrapped__)


def capture_history(state: MapState) -> Dict[str, jnp.ndarray]:
    """Snapshot the merge-relevant parameters before optimization
    (mapper.py:146-155)."""
    return {
        "xyz": state.xyz,
        "features_dc": state.features_dc,
        "features_rest": state.features_rest,
        "scaling": state.scaling,
        "rotation_act": normalize(state.rotation),
        "rotation_raw": state.rotation,
        "opacity": state.opacity,
        "confidence": state.confidence,
    }
