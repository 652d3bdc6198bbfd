"""Gaussian map lifecycle tests: spawn, fix, delete, error strikes, merge."""

import numpy as np
import jax.numpy as jnp

from rtgslam_tpu.models import map_ops
from rtgslam_tpu.models.gaussian_map import (
    FREE, STABLE, UNSTABLE, GaussianMapConfig, MapState, gaussian_radius,
)

CFG = GaussianMapConfig(capacity=256, temp_capacity=32, max_sh_degree=3,
                        min_radius=0.001, max_radius=0.05)


def make_temp(n, offset=0.0):
    Kt = CFG.temp_capacity
    xyz = np.zeros((Kt, 3), np.float32)
    xyz[:n] = np.linspace([0, 0, 1], [1, 0, 1], n) + offset
    valid = np.zeros(Kt, bool)
    valid[:n] = True
    normal = np.tile([0, 0, -1.0], (Kt, 1)).astype(np.float32)
    color = np.full((Kt, 3), 0.5, np.float32)
    opa = np.full((Kt, 1), 3.0, np.float32)
    return map_ops.TempPoints(
        xyz=jnp.asarray(xyz), normal=jnp.asarray(normal),
        color=jnp.asarray(color), opacity=jnp.asarray(opa),
        valid=jnp.asarray(valid))


def test_insert_and_counts():
    state = MapState.create(CFG)
    temp = make_temp(10)
    log_scales = jnp.full((CFG.temp_capacity, 3), -4.0)
    state, n, _ = map_ops.insert_temp(state, temp, log_scales, 5, CFG)
    assert int(n) == 10
    assert int(jnp.sum(state.status == UNSTABLE)) == 10
    inserted = np.asarray(state.status) == UNSTABLE
    assert np.all(np.asarray(state.add_tick)[inserted] == 5)


def test_insert_respects_capacity():
    small = GaussianMapConfig(capacity=8, temp_capacity=32)
    state = MapState.create(small)
    temp = make_temp(20)
    state, n, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, small)
    assert int(n) == 8
    assert int(jnp.sum(state.status == UNSTABLE)) == 8


def test_fix_promotes_and_clips():
    state = MapState.create(CFG)
    temp = make_temp(4)
    state, _, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, CFG)
    state = state.replace(confidence=state.confidence.at[:2, 0].set(99.0))
    state = map_ops.fix_confident(state, 50.0)
    status = np.asarray(state.status)
    assert (status == STABLE).sum() == 2
    assert np.asarray(state.confidence).max() <= 50.0


def test_delete_big_and_expired():
    state = MapState.create(CFG)
    temp = make_temp(20)
    state, _, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, CFG)
    # blow up one gaussian's scale so it exceeds 10x the pool mean radius
    big_row = int(np.nonzero(np.asarray(state.status) == UNSTABLE)[0][0])
    state = state.replace(scaling=state.scaling.at[big_row].set(2.0))
    state = map_ops.delete_gaussians(state, 10, unstable_time_window=1000, unstable=True)
    assert int(state.status[big_row]) == FREE
    # expire all remaining
    state = map_ops.delete_gaussians(state, 2000, unstable_time_window=100, unstable=True)
    assert int(jnp.sum(state.status == UNSTABLE)) == 0


def test_dedup_rejects_points_inside_existing():
    state = MapState.create(CFG)
    temp0 = make_temp(5)
    state, _, _ = map_ops.insert_temp(
        state, temp0, jnp.full((32, 3), np.log(0.05)), 0, CFG)
    # same positions again -> all rejected; far positions -> kept
    near = make_temp(5)
    near2 = map_ops.temp_filter_dedup(near, state)
    assert int(near2.valid.sum()) == 0
    far = make_temp(5, offset=10.0)
    far2 = map_ops.temp_filter_dedup(far, state)
    assert int(far2.valid.sum()) == 5


def test_error_update_strikes_and_heals():
    state = MapState.create(CFG)
    temp = make_temp(3)
    state, _, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, CFG)
    state = state.replace(status=jnp.where(state.status == UNSTABLE, STABLE,
                                           state.status))
    rows = np.nonzero(np.asarray(state.status) == STABLE)[0]
    H = W = 8
    didx = jnp.full((H, W), -1, jnp.int32).at[0, 0].set(int(rows[0]))
    cidx = jnp.full((H, W), -1, jnp.int32).at[1, 1].set(int(rows[1]))
    gt_depth = jnp.full((H, W, 1), 2.0)
    r_depth = jnp.full((H, W, 1), 1.0)   # under-estimates by 1m >> 2*thres
    gt_color = jnp.ones((H, W, 3))
    r_color = jnp.zeros((H, W, 3))       # color error 3 >> 2*thres
    for t in range(10):
        state = map_ops.error_update(
            state, r_color, r_depth, jnp.zeros((H, W, 3)), didx, cidx,
            gt_color, gt_depth, 0.1, 0.1, t, CFG.capacity)
    assert int(state.status[rows[0]]) == FREE          # depth strikes delete
    assert int(state.status[rows[1]]) == STABLE        # color strikes release
    assert float(state.confidence[rows[1], 0]) == 0.0  # confidence reset


def test_history_merge_weights():
    state = MapState.create(CFG)
    temp = make_temp(4)
    state, _, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, CFG)
    hist = map_ops.capture_history(state)
    mask = state.status == UNSTABLE
    # confidence 0 -> history weight ~0 -> state unchanged
    moved = state.replace(xyz=state.xyz + 1.0)
    merged = map_ops.history_merge(moved, hist, 0.5, mask)
    assert np.allclose(np.asarray(merged.xyz)[np.asarray(mask)],
                       np.asarray(moved.xyz)[np.asarray(mask)], atol=1e-4)
    # equal confidence -> weight = max_weight -> halfway back
    hist2 = dict(hist)
    hist2["confidence"] = jnp.ones_like(state.confidence)
    state2 = moved.replace(confidence=jnp.ones_like(state.confidence))
    merged2 = map_ops.history_merge(state2, hist2, 0.5, mask)
    sel = np.asarray(mask)
    assert np.allclose(np.asarray(merged2.xyz)[sel],
                       np.asarray(moved.xyz)[sel] - 0.5, atol=1e-4)


def test_radius_derivation():
    state = MapState.create(CFG)
    state = state.replace(scaling=state.scaling.at[0].set(
        jnp.log(jnp.asarray([0.04, 0.02, 0.004]))))
    r = float(gaussian_radius(state.scaling)[0])
    assert np.isclose(r, (0.04 + 0.02) / 2, atol=1e-5)


def test_donated_twins_match_value_semantics():
    """The mapper-facing donated twins (map_ops.*_donated) must produce the
    exact state the value-semantics originals do; donation only changes
    buffer aliasing, never values."""
    import jax

    state = MapState.create(CFG)
    temp = make_temp(12)
    state, _, _ = map_ops.insert_temp(state, temp, jnp.full((32, 3), -4.0), 0, CFG)
    state = state.replace(confidence=state.confidence.at[:3, 0].set(99.0))

    ref = map_ops.fix_all(state)
    ref = map_ops.delete_gaussians(ref, 10, unstable_time_window=1000,
                                   unstable=True)

    copy = jax.tree.map(lambda x: x.copy(), state)
    got = map_ops.fix_all_donated(copy)
    got = map_ops.delete_gaussians_donated(
        got, 10, unstable_time_window=1000, unstable=True)

    for field in ("status", "xyz", "scaling", "rotation", "opacity",
                  "confidence"):
        assert np.array_equal(np.asarray(getattr(ref, field)),
                              np.asarray(getattr(got, field))), field


def test_slerp_hemisphere_correction():
    """Antipodal quaternion pairs (q and -q encode the same rotation) must
    interpolate to a usable rotation, not through the zero quaternion
    (deliberate divergence from the reference slerp — see _slerp)."""
    q = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    out = map_ops._slerp(q, -q, jnp.asarray([[0.5]]))
    # without hemisphere correction this lerp yields the zero quaternion
    assert float(jnp.linalg.norm(out)) > 0.9
    # and the interpolant still encodes the same rotation as q
    outn = out / jnp.linalg.norm(out)
    assert abs(float(jnp.abs(jnp.sum(outn * q)))) > 0.999
    # regular (same-hemisphere) pairs are untouched by the flip
    q2 = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    q3 = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    mid = map_ops._slerp(q2, q3, jnp.asarray([[0.5]]))
    assert np.allclose(np.asarray(mid)[0], [2 ** -0.5, 2 ** -0.5, 0, 0],
                       atol=1e-5)
