"""Rasterizer tests: projection math, binning invariants, blend correctness
vs a brute-force per-pixel reference, gradients, and golden synthetic-scene
checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtgslam_tpu.ops.rasterize import RasterSettings, render
from rtgslam_tpu.ops.rasterize.project import project
from rtgslam_tpu.ops.rasterize import binning
from rtgslam_tpu.utils.sh import rgb_to_sh


def make_scene(P=64, n_alive=8, seed=0, H=64, W=96):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((P, 3), np.float32)
    alive = np.zeros(P, bool)
    xyz[:n_alive] = rng.uniform([-1, -0.7, 1.0], [1, 0.7, 4.0], (n_alive, 3))
    alive[:n_alive] = True
    scales = np.full((P, 3), 1e-6, np.float32)
    scales[:n_alive] = rng.uniform(0.05, 0.2, (n_alive, 3))
    scales[:n_alive, 2] *= 0.1
    rots = rng.standard_normal((P, 4)).astype(np.float32)
    rots[:, 0] += 2.0
    opa = np.full((P, 1), 0.8, np.float32)
    shs = np.zeros((P, 16, 3), np.float32)
    shs[:, 0] = np.asarray(rgb_to_sh(jnp.asarray(
        rng.uniform(0.1, 0.9, (P, 3)).astype(np.float32))))
    normal = np.tile(np.array([0, 0, -1], np.float32), (P, 1))
    g = dict(xyz=jnp.asarray(xyz), scales=jnp.asarray(scales),
             rotations=jnp.asarray(rots / np.linalg.norm(rots, axis=-1, keepdims=True)),
             opacity=jnp.asarray(opa), shs=jnp.asarray(shs),
             normal=jnp.asarray(normal), alive=jnp.asarray(alive))
    cam = dict(w2c=jnp.eye(4),
               K=jnp.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                             jnp.float32),
               campos=jnp.zeros(3))
    st = RasterSettings(height=H, width=W, block_capacity=256, tile_capacity=64)
    return g, cam, st


def reference_blend(g, cam, st):
    """Brute-force per-pixel forward with the same math (numpy)."""
    pr = project(g["xyz"], g["scales"], g["rotations"], g["opacity"], g["shs"],
                 g["normal"], g["alive"], cam["w2c"], cam["K"], cam["campos"],
                 st.width, st.height, st.sh_degree, st.normal_threshold)
    order = np.argsort(np.where(np.asarray(pr.visible), np.asarray(pr.depth), np.inf))
    mean2d = np.asarray(pr.mean2d)[order]
    conic = np.asarray(pr.conic)[order]
    rgb = np.asarray(pr.rgb)[order]
    opa = np.asarray(pr.opacity)[order]
    z = np.asarray(pr.depth)[order]
    vis = np.asarray(pr.visible)[order]
    radius = np.asarray(pr.radius)[order]
    elig = np.asarray(pr.normal_elig)[order]

    H, W = st.height, st.width
    color = np.zeros((H, W, 3))
    depth = np.zeros((H, W))
    didx = np.full((H, W), -1)
    T_map = np.ones((H, W))
    for py in range(H):
        for px in range(W):
            T = 1.0
            for k in range(len(order)):
                if not vis[k]:
                    break
                dx, dy = px - mean2d[k, 0], py - mean2d[k, 1]
                # bbox test like the tiled path
                if abs(dx) > radius[k] and abs(dy) > radius[k]:
                    pass
                power = -0.5 * (conic[k, 0] * dx * dx + conic[k, 2] * dy * dy) \
                    - conic[k, 1] * dx * dy
                if power > 0:
                    continue
                alpha = min(opa[k] * np.exp(power), 0.99)
                if alpha < 1 / 255:
                    continue
                if alpha >= st.opaque_threshold and elig[k] and didx[py, px] < 0:
                    depth[py, px] = z[k]
                    didx[py, px] = order[k]
                color[py, px] += alpha * T * rgb[k]
                T *= 1 - alpha
                if T < st.T_threshold:
                    # tiled path only stops at chunk granularity; keep going
                    pass
            T_map[py, px] = T
    return color, depth, didx, T_map


@pytest.mark.slow
@pytest.mark.parametrize("differentiable", [False, True])
def test_blend_matches_bruteforce(differentiable):
    g, cam, st = make_scene()
    out = render(g, cam, st, differentiable=differentiable)
    ref_color, ref_depth, ref_didx, ref_T = reference_blend(g, cam, st)
    assert np.allclose(np.asarray(out["render"]), ref_color, atol=2e-3)
    assert np.allclose(np.asarray(out["depth"])[..., 0], ref_depth, atol=1e-4)
    assert np.array_equal(np.asarray(out["depth_index_map"]), ref_didx)
    assert np.allclose(np.asarray(out["T_map"])[..., 0], ref_T, atol=2e-3)


def test_projection_depth_and_center():
    g, cam, st = make_scene(n_alive=1)
    pr = project(g["xyz"], g["scales"], g["rotations"], g["opacity"], g["shs"],
                 g["normal"], g["alive"], cam["w2c"], cam["K"], cam["campos"],
                 st.width, st.height, 3, 0.5)
    xyz = np.asarray(g["xyz"][0])
    K = np.asarray(cam["K"])
    assert np.isclose(float(pr.depth[0]), xyz[2])
    expect_u = K[0, 0] * xyz[0] / xyz[2] + K[0, 2]
    assert np.isclose(float(pr.mean2d[0, 0]), expect_u, atol=1e-3)


def test_binning_lists_sorted_by_depth():
    g, cam, st = make_scene(n_alive=16)
    pr = project(g["xyz"], g["scales"], g["rotations"], g["opacity"], g["shs"],
                 g["normal"], g["alive"], cam["w2c"], cam["K"], cam["campos"],
                 st.width, st.height, 3, 0.5)
    bins = binning.bin_gaussians(pr, st.height, st.width, 256, 64,
                                 max_visible=st.max_visible)
    depth_sorted = np.asarray(pr.depth)[np.asarray(bins.order)]
    lists = np.asarray(bins.tile_lists)
    counts = np.asarray(bins.tile_counts)
    for t in range(lists.shape[0]):
        entries = lists[t, :counts[t]]
        entries = entries[entries < pr.depth.shape[0]]
        d = depth_sorted[entries]
        assert np.all(np.diff(d) >= -1e-6)


def test_tile_mask_skips_tiles():
    g, cam, st = make_scene()
    ty, tx = binning.tile_grid_shape(st.height, st.width)
    mask = jnp.zeros((ty, tx), jnp.int32)
    out = render(g, cam, st, tile_mask=mask)
    assert np.all(np.asarray(out["render"]) == 0)
    assert np.all(np.asarray(out["T_map"]) == 1)
    full = render(g, cam, st, tile_mask=jnp.ones((ty, tx), jnp.int32))
    nomask = render(g, cam, st)
    assert np.allclose(np.asarray(full["render"]), np.asarray(nomask["render"]),
                       atol=1e-5)


@pytest.mark.slow
def test_gradients_finite_and_localized():
    g, cam, st = make_scene()

    def loss(params):
        out = render(dict(g, **params), cam, st, differentiable=True)
        return jnp.sum(out["render"] ** 2) + jnp.sum(out["depth"] ** 2)

    grads = jax.grad(loss)({k: g[k] for k in
                            ("xyz", "scales", "rotations", "opacity", "shs")})
    alive = np.asarray(g["alive"])
    for k, v in grads.items():
        v = np.asarray(v)
        assert np.isfinite(v).all(), k
        dead = v[~alive].reshape(-1)
        assert np.all(dead == 0), f"dead gaussians got {k} gradient"


@pytest.mark.slow
def test_finite_difference_gradcheck():
    """Color-vs-xyz gradient against central differences."""
    g, cam, st = make_scene(n_alive=2, H=32, W=32)

    def loss(xyz):
        out = render(dict(g, xyz=xyz), cam, st, differentiable=True)
        return jnp.sum(out["render"] * jnp.linspace(0, 1, 32)[None, :, None])

    grad = np.asarray(jax.grad(loss)(g["xyz"]))
    eps = 3e-4
    rel_errs = []
    for gi in range(2):
        for d in range(2):  # x, y (z moves the depth sort; fd less stable)
            x_p = np.asarray(g["xyz"]).copy(); x_p[gi, d] += eps
            x_m = np.asarray(g["xyz"]).copy(); x_m[gi, d] -= eps
            fd = (float(loss(jnp.asarray(x_p))) - float(loss(jnp.asarray(x_m)))) / (2 * eps)
            rel_errs.append(abs(grad[gi, d] - fd) / max(abs(fd), 1e-1))
    # the true gradient has jump discontinuities (alpha cutoffs, the 0.99
    # clamp, bbox/binning boundaries — identical in the reference CUDA), so
    # central differences carry event noise; require close median agreement
    rel_errs = np.sort(rel_errs)
    assert rel_errs[1] < 0.05, rel_errs
    assert rel_errs[-1] < 0.25, rel_errs


@pytest.mark.slow
def test_fused_vjp_matches_scan_path():
    """blend_tiles_fused (custom VJP, early exit) must agree with the
    scan+checkpoint autodiff path on values AND gradients of a loss over
    color, depth, and T_map."""
    import dataclasses

    g, cam, st = make_scene(P=96, n_alive=24, seed=3)
    st_scan = dataclasses.replace(st, use_fused_vjp=False)
    st_fused = dataclasses.replace(st, use_fused_vjp=True)

    rng = np.random.default_rng(0)
    wc = jnp.asarray(rng.standard_normal((st.height, st.width, 3)), jnp.float32)
    wd = jnp.asarray(rng.standard_normal((st.height, st.width, 1)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((st.height, st.width, 1)), jnp.float32)

    def loss(params, settings):
        out = render(dict(g, **params), cam, settings, differentiable=True)
        return (jnp.sum(out["render"] * wc) + jnp.sum(out["depth"] * wd)
                + jnp.sum(out["T_map"] * wt))

    keys = ("xyz", "scales", "rotations", "opacity", "shs")
    params = {k: g[k] for k in keys}
    v_scan, g_scan = jax.value_and_grad(lambda p: loss(p, st_scan))(params)
    v_fused, g_fused = jax.value_and_grad(lambda p: loss(p, st_fused))(params)

    assert np.isclose(float(v_scan), float(v_fused), rtol=1e-4, atol=1e-4)
    for k in keys:
        a, b = np.asarray(g_scan[k]), np.asarray(g_fused[k])
        assert np.isfinite(b).all(), k
        scale = max(np.abs(a).max(), 1e-3)
        assert np.allclose(a, b, atol=2e-4 * scale, rtol=2e-3), (
            k, np.abs(a - b).max(), scale)


def test_fused_vjp_forward_matches_inference():
    """The fused forward IS the while_loop inference blend — outputs must be
    bit-comparable to the non-differentiable render."""
    g, cam, st = make_scene(P=96, n_alive=24, seed=5)
    out_inf = render(g, cam, st, differentiable=False)
    out_fused = render(g, cam, st, differentiable=True)
    for k in ("render", "depth", "T_map"):
        assert np.allclose(np.asarray(out_inf[k]), np.asarray(out_fused[k]),
                           atol=1e-6), k
    assert np.array_equal(np.asarray(out_inf["depth_index_map"]),
                          np.asarray(out_fused["depth_index_map"]))


def test_render_empty_map():
    g, cam, st = make_scene(n_alive=0)
    out = render(g, cam, st)
    assert np.all(np.asarray(out["render"]) == 0)
    assert np.all(np.asarray(out["depth_index_map"]) == -1)
    assert np.all(np.asarray(out["T_map"]) == 1)


@pytest.mark.slow
def test_overflow_reported_when_capacity_undersized():
    """Undersized per-tile capacity must be observable, not silent."""
    g, cam, st = make_scene(P=128, n_alive=64, H=32, W=32)
    # cluster every gaussian onto the same small screen region so each tile
    # overlaps all 64 of them
    xyz = np.asarray(g["xyz"]).copy()
    xyz[:64] = [0.0, 0.0, 2.0] + 0.01 * np.random.default_rng(0).standard_normal((64, 3))
    g = dict(g, xyz=jnp.asarray(xyz))
    import dataclasses

    small = dataclasses.replace(st, tile_capacity=32, block_capacity=64)
    out_small = render(g, cam, small)
    big = dataclasses.replace(st, tile_capacity=256, block_capacity=512)
    out_big = render(g, cam, big)
    assert int(out_small["overflow"]) > 0
    assert int(out_big["overflow"]) == 0


@pytest.mark.slow
def test_capacity_invariance_when_no_overflow():
    """Renders must be bit-identical across block/tile/max_visible capacity
    choices whenever bin_overflow == 0 — the invariant that lets bench.py
    and configs size static capacities to the workload (capacity is a cost
    knob, never a semantics knob; PERF.md 'static-capacity sizing')."""
    import dataclasses

    g, cam, st = make_scene(P=128, n_alive=40, seed=3)
    base = render(g, cam, st)
    assert int(base["overflow"]) == 0
    for kwargs in ({"tile_capacity": 128}, {"block_capacity": 128},
                   {"max_visible": 64},
                   {"block_capacity": 64, "tile_capacity": 64}):
        st2 = dataclasses.replace(st, **kwargs)
        out = render(g, cam, st2)
        assert int(out["overflow"]) == 0, kwargs
        for k in ("render", "depth", "depth_index_map", "T_map"):
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(out[k]),
                err_msg=f"{k} differs at {kwargs}")


def test_transmission_only_matches_full_render():
    """The mask-render variant (render_transmission) must produce the same
    occupancy mask (T != 1) as the full render's T_map — it is what the
    optimize loop's partial-render masks consume — and agree on T itself to
    reduction-order rounding."""
    from rtgslam_tpu.ops.rasterize.api import render_transmission

    g, cam, st = make_scene(P=96, n_alive=24, seed=5)
    full = render(g, cam, st)
    light = render_transmission(g, cam["w2c"], cam["K"], cam["campos"], st)
    T_full = np.asarray(full["T_map"])[..., 0]
    T_light = np.asarray(light["T_map"])[..., 0]
    assert np.array_equal(T_full != 1.0, T_light != 1.0)
    assert np.allclose(T_full, T_light, atol=1e-6)
    assert int(light["overflow"]) == int(full["overflow"])


def test_optimize_masks_unchanged_by_light_render(tiny_map_state=None):
    """optimize_chain's local-mode masks (now computed by the light render)
    must leave the optimization result identical to a run whose masks come
    from the full render — pinned by comparing against masks recomputed
    here with the full render path."""
    from rtgslam_tpu.ops import preprocess
    from rtgslam_tpu.ops.rasterize.api import render_transmission

    g, cam, st = make_scene(P=96, n_alive=24, seed=7)
    full = render(g, cam, st)
    rmask_full = np.asarray(full["T_map"])[..., 0] != 1.0
    tile_full = np.asarray(preprocess.transmission_to_tilemask(
        jnp.asarray(rmask_full), 16, 0.5))
    light = render_transmission(g, cam["w2c"], cam["K"], cam["campos"], st)
    rmask_light = np.asarray(light["T_map"])[..., 0] != 1.0
    tile_light = np.asarray(preprocess.transmission_to_tilemask(
        jnp.asarray(rmask_light), 16, 0.5))
    assert np.array_equal(rmask_full, rmask_light)
    assert np.array_equal(tile_full, tile_light)


def test_model_and_stable_pair_matches_standalone():
    """render_model_and_stable (one projection/sort/binning/shade pass,
    two blends) must reproduce BOTH standalone renders exactly when no
    capacity overflows: the alive-pool render on every output, and the
    stable-subset render's color index map (the only stable output the
    spawn consumes, mapper temp_attach_to_stable)."""
    from rtgslam_tpu.ops.rasterize.api import render_model_and_stable

    g, cam, st = make_scene(P=96, n_alive=32, seed=11)
    # mark a subset of the alive gaussians stable
    rng = np.random.default_rng(3)
    stable = np.zeros(96, bool)
    stable[:32] = rng.random(32) < 0.5
    stable_j = jnp.asarray(stable)

    model_ref = render(g, cam, st)
    g_stable = dict(g, alive=stable_j)
    stable_ref = render(g_stable, cam, st)

    model_out, stable_cidx, _base = render_model_and_stable(
        g, stable_j, cam["w2c"], cam["K"], cam["campos"], st)

    assert int(model_out["overflow"]) == 0
    for k in ("render", "depth", "normal", "T_map", "color_hit_weight",
              "depth_hit_weight"):
        np.testing.assert_allclose(
            np.asarray(model_ref[k]), np.asarray(model_out[k]),
            atol=1e-6, err_msg=f"model {k} differs")
    for k in ("color_index_map", "depth_index_map"):
        np.testing.assert_array_equal(
            np.asarray(model_ref[k]), np.asarray(model_out[k]),
            err_msg=f"model {k} differs")
    np.testing.assert_array_equal(
        np.asarray(stable_ref["color_index_map"]), np.asarray(stable_cidx),
        err_msg="stable color index differs")


def test_model_and_stable_pair_empty_stable():
    """No stable gaussians -> the stable index map is all -1 and the model
    outputs still match the standalone render."""
    from rtgslam_tpu.ops.rasterize.api import render_model_and_stable

    g, cam, st = make_scene(P=64, n_alive=8, seed=2)
    model_ref = render(g, cam, st)
    model_out, stable_cidx, _base = render_model_and_stable(
        g, jnp.zeros(64, bool), cam["w2c"], cam["K"], cam["campos"], st)
    np.testing.assert_allclose(
        np.asarray(model_ref["render"]), np.asarray(model_out["render"]),
        atol=1e-6)
    assert np.all(np.asarray(stable_cidx) == -1)


def test_render_with_inserted_matches_fresh():
    """The incremental lifecycle render (base pass + merged inserted rows,
    api.render_with_inserted) must match a fresh full render of the union
    exactly when nothing overflows — including sentinel (dropped) insert
    slots, which must be blend-invisible."""
    from rtgslam_tpu.ops.rasterize.api import (
        render_model_and_stable, render_with_inserted)

    g, cam, st = make_scene(P=96, n_alive=40, seed=13)
    first = jnp.arange(96) < 24
    g_base = dict(g, alive=g["alive"] & first)

    _, _, base = render_model_and_stable(
        g_base, jnp.zeros(96, bool), cam["w2c"], cam["K"], cam["campos"], st)

    # rows 24..39 are the "inserted" set; two sentinel slots (=P) model
    # temp rows that were dropped for lack of free capacity
    slots = jnp.concatenate([jnp.arange(24, 40, dtype=jnp.int32),
                             jnp.full((2,), 96, jnp.int32)])
    ok = slots < 96
    sl = jnp.minimum(slots, 95)
    new_rows = {
        "xyz": g["xyz"][sl],
        "scales": g["scales"][sl],
        "rotations": g["rotations"][sl],
        "opacity": g["opacity"][sl],
        "shs_flat": g["shs"].reshape(96, -1)[sl],
        "normal": g["normal"][sl],
        "alive": ok,
    }
    out = render_with_inserted(
        new_rows, sl, g["normal"], base,
        cam["w2c"], cam["K"], cam["campos"], st)

    fresh = render(g, cam, st)
    assert int(out["overflow"]) == 0
    for k in ("render", "depth", "normal", "T_map", "color_hit_weight",
              "depth_hit_weight"):
        np.testing.assert_allclose(
            np.asarray(fresh[k]), np.asarray(out[k]), atol=1e-6,
            err_msg=f"{k} differs")
    for k in ("color_index_map", "depth_index_map"):
        np.testing.assert_array_equal(
            np.asarray(fresh[k]), np.asarray(out[k]), err_msg=f"{k} differs")


def _random_tile_blocks(T=37, Kt=128, seed=11):
    """Random pre-gathered tile blocks with a skewed count distribution:
    zeros (dead tiles), partial chunks, and full lists."""
    from rtgslam_tpu.ops.rasterize import blend

    rng = np.random.default_rng(seed)
    cols = {
        "mean_x": rng.uniform(0, 16, (T, Kt)),
        "mean_y": rng.uniform(0, 16, (T, Kt)),
        "conic_a": rng.uniform(0.05, 0.4, (T, Kt)),
        "conic_b": rng.uniform(-0.03, 0.03, (T, Kt)),
        "conic_c": rng.uniform(0.05, 0.4, (T, Kt)),
        "depth": rng.uniform(0.5, 5.0, (T, Kt)),
        "r": rng.uniform(0, 1, (T, Kt)),
        "g": rng.uniform(0, 1, (T, Kt)),
        "b": rng.uniform(0, 1, (T, Kt)),
        "opacity": rng.uniform(0.2, 0.95, (T, Kt)),
        "elig": (rng.uniform(size=(T, Kt)) > 0.2).astype(np.float32),
    }
    feat = blend.FeatCols(**{k: jnp.asarray(v, jnp.float32)
                             for k, v in cols.items()})
    gidx = jnp.asarray(rng.integers(0, 500, (T, Kt)), jnp.int32)
    counts = np.where(rng.uniform(size=T) < 0.4, 0,
                      rng.integers(1, Kt + 1, T)).astype(np.int32)
    origins = jnp.asarray(
        np.stack([rng.integers(0, 6, T) * 16.0,
                  rng.integers(0, 4, T) * 16.0], -1), jnp.float32)
    return feat, gidx, jnp.asarray(counts), origins


def test_blocked_blend_matches_pregathered():
    """The sorted work-queue blend (blend_tiles_blocked) must be BITWISE
    the vmapped-while blend on every output — per-tile results are
    independent, the block walk only reorders which tiles compute when,
    and unprocessed tiles take the zero-trip carry values."""
    from rtgslam_tpu.ops.rasterize import blend

    feat, gidx, counts, origins = _random_tile_blocks()
    base = blend.blend_tiles_pregathered(
        feat, gidx, counts, origins, 0.6, 1e-4, False)
    for tb in (8, 16, 64):
        out = blend.blend_tiles_blocked(
            feat, gidx, counts, origins, 0.6, 1e-4, tile_block=tb)
        for k in blend.TileOutputs._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(base, k)), np.asarray(getattr(out, k)),
                err_msg=f"{k} differs at tile_block={tb}")


def test_blocked_transmission_matches():
    from rtgslam_tpu.ops.rasterize import blend

    feat, _, counts, origins = _random_tile_blocks(seed=13)
    cols = (feat.mean_x, feat.mean_y, feat.conic_a, feat.conic_b,
            feat.conic_c, feat.opacity)
    base = blend.blend_transmission(cols, counts, origins)
    for tb in (8, 64):
        out = blend.blend_transmission_blocked(
            cols, counts, origins, tile_block=tb)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out),
                                      err_msg=f"T at tile_block={tb}")


def test_compact_rows_matches_scatter_reference():
    """_compact_rows (top_k form, prepare_probe3-selected) is
    bitwise-identical to the cumsum+scatter definition it replaced: slot k
    of a row = index of the row's (k+1)-th set bit; rows keep the FIRST
    `capacity` hits; dead slots carry the fill sentinel.  Random masks
    incl. empty, full, overflowing rows, vmapped and flat leading shapes —
    plus capacity > n (the static-pad branch)."""
    rng = np.random.default_rng(7)

    def reference(hit, capacity, fill):
        rows, n = hit.shape
        out = np.full((rows, capacity), fill, np.int32)
        counts = np.zeros(rows, np.int32)
        for r in range(rows):
            idx = np.flatnonzero(hit[r])[:capacity]
            out[r, : idx.size] = idx
            counts[r] = min(int(hit[r].sum()), capacity)
        return out, counts

    for cap, n, rows, p in [(8, 37, 5, 0.3), (16, 16, 4, 0.9),
                            (4, 100, 7, 0.02), (32, 20, 3, 1.0),
                            (6, 50, 2, 0.0)]:
        hit = rng.random((rows, n)) < p
        want, want_c = reference(hit, cap, n)
        got, got_c = binning._compact_rows(jnp.asarray(hit), cap, n)
        np.testing.assert_array_equal(np.asarray(got), want)
        np.testing.assert_array_equal(np.asarray(got_c), want_c)

    # 3-D leading shape (the fine tile stage) + vmap (the prepare path)
    hit = rng.random((3, 4, 33)) < 0.4
    flat_want, flat_cnt = reference(hit.reshape(12, 33), 5, 33)
    got, got_c = binning._compact_rows(jnp.asarray(hit), 5, 33)
    np.testing.assert_array_equal(np.asarray(got).reshape(12, 5), flat_want)
    np.testing.assert_array_equal(np.asarray(got_c).reshape(12), flat_cnt)
    vgot, vgot_c = jax.vmap(lambda h: binning._compact_rows(h, 5, 33))(
        jnp.asarray(hit))
    np.testing.assert_array_equal(np.asarray(vgot), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(vgot_c), np.asarray(got_c))
