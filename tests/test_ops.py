"""Unit tests: preprocessing maps, KNN, segment errors, ICP."""

import numpy as np
import jax
import jax.numpy as jnp

from rtgslam_tpu.ops import preprocess, knn, segment, icp


def test_vertex_map_roundtrip():
    H, W = 32, 48
    K = jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    depth = jnp.full((H, W), 2.0)
    vm = preprocess.compute_vertex_map(depth, K)
    # center pixel back-projects to (0, 0, depth)
    assert np.allclose(np.asarray(vm[H // 2, W // 2]), [0, 0, 2.0], atol=0.1)
    # reproject: u = fx*x/z + cx
    u = np.asarray(K[0, 0] * vm[..., 0] / vm[..., 2] + K[0, 2])
    assert np.allclose(u, np.arange(W)[None, :].repeat(H, 0), atol=1e-3)


def test_normal_map_plane():
    """A (nearly) fronto-parallel plane's normals point along z.

    A tiny ramp avoids the reference's per-image min/max invalidation
    (SLAM/utils.py:116-120), which zeroes a perfectly constant depth map.
    """
    H, W = 32, 32
    K = jnp.asarray([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1]])
    depth = 2.0 + 1e-4 * jnp.arange(H)[:, None] * jnp.ones((H, W))
    vm = preprocess.compute_vertex_map(depth, K)
    nm = np.asarray(preprocess.compute_normal_map(vm))
    inner = nm[4:-4, 4:-4]
    assert np.all(np.abs(inner[..., 2]) > 0.99)


def test_pools_and_tilemasks():
    x = jnp.arange(35 * 37, dtype=jnp.float32).reshape(35, 37)
    mp_ = preprocess.maxpool(x, 16)
    assert mp_.shape == (3, 3)
    mask = jnp.zeros((35, 37), bool).at[0, 0].set(True)
    tm = preprocess.pixelmask_to_tilemask(mask, 16)
    assert tm.shape == (3, 3) and int(tm[0, 0]) == 1 and int(tm.sum()) == 1
    # transmission mask needs > ratio of the tile set
    dense = jnp.zeros((32, 32), bool).at[:16, :16].set(True)
    tm2 = preprocess.transmission_to_tilemask(dense, 16, 0.5)
    assert int(tm2[0, 0]) == 1 and int(tm2.sum()) == 1


def test_colorerror_tilemask_topk():
    err = jnp.zeros((32, 64)).at[:16, :16].set(5.0)
    tm = preprocess.colorerror_to_tilemask(err, 16, 0.25)
    assert int(tm[0, 0]) == 1
    assert int(tm.sum()) == 1


def test_bilateral_filter_preserves_flat():
    d = jnp.full((24, 24), 3.0)
    out = preprocess.bilateral_filter(d, 3, 2.0, 2.0)
    assert np.allclose(np.asarray(out), 3.0, atol=1e-4)
    # zeros stay zero and don't bleed
    d2 = d.at[:, :8].set(0.0)
    out2 = np.asarray(preprocess.bilateral_filter(d2, 3, 2.0, 2.0))
    assert np.all(out2[:, :5] == 0)
    assert np.allclose(out2[:, 12:], 3.0, atol=1e-4)


def test_knn_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(0)
    q = rng.uniform(0, 4, (200, 3)).astype(np.float32)
    r = rng.uniform(0, 4, (300, 3)).astype(np.float32)
    d2, idx = knn.knn(jnp.asarray(q), jnp.asarray(r), jnp.ones(300, bool), k=3,
                      chunk=128)
    d_ref, i_ref = cKDTree(r).query(q, k=3)
    assert np.allclose(np.sort(np.asarray(idx)), np.sort(i_ref))
    assert np.allclose(np.asarray(d2), d_ref ** 2, atol=1e-4)


def test_knn_tournament_brute_force():
    """Segment-tournament extraction vs brute force: multi-chunk, duplicate
    points (exact ties inside and across 128-lane segments), invalid refs."""
    rng = np.random.default_rng(7)
    q = rng.uniform(0, 2, (97, 3)).astype(np.float32)
    r = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    r[120] = r[40]          # duplicate across chunks (chunk=256)
    r[41] = r[40]           # duplicate inside one segment
    valid = np.ones(500, bool)
    valid[rng.choice(500, 60, replace=False)] = False
    d2, idx = knn.knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                      k=4, chunk=256)
    d2, idx = np.asarray(d2), np.asarray(idx)
    dist = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
    dist[:, ~valid] = np.inf
    order = np.argsort(dist, axis=1, kind="stable")[:, :4]
    ref_d = np.take_along_axis(dist, order, axis=1)
    assert np.allclose(d2, ref_d, atol=1e-4)
    # indices must agree except where exact ties permit either order
    mism = idx != order
    if mism.any():
        qq, kk = np.nonzero(mism)
        assert np.allclose(dist[qq, idx[qq, kk]], ref_d[qq, kk], atol=1e-6)


def test_knn_blocked_counts_match_full():
    """query_count / ref_count / q_block trip bounding is EXACT on the live
    prefix: same results as the single-block full-capacity scan, and rows
    past query_count stay (inf, -1)."""
    rng = np.random.default_rng(11)
    Q, R = 640, 900
    q = rng.uniform(0, 2, (Q, 3)).astype(np.float32)
    r = rng.uniform(0, 2, (R, 3)).astype(np.float32)
    n_q, n_r = 213, 517          # live prefixes (not block/chunk aligned)
    valid = np.zeros(R, bool)
    valid[:n_r] = True
    d_full, i_full = knn.knn(jnp.asarray(q), jnp.asarray(r),
                             jnp.asarray(valid), k=3, chunk=256)
    d_blk, i_blk = knn.knn(jnp.asarray(q), jnp.asarray(r),
                           jnp.asarray(valid), k=3, chunk=256,
                           query_count=jnp.int32(n_q),
                           ref_count=jnp.int32(n_r), q_block=128)
    d_blk, i_blk = np.asarray(d_blk), np.asarray(i_blk)
    assert np.array_equal(i_blk[:n_q], np.asarray(i_full)[:n_q])
    assert np.allclose(d_blk[:n_q], np.asarray(d_full)[:n_q])
    # rows past the last processed block stay at the (inf, -1) init; the
    # partial block's stragglers (213..255 here) carry real values
    edge = -(-n_q // 128) * 128
    assert np.all(np.isinf(d_blk[edge:])) and np.all(i_blk[edge:] == -1)
    # a mid-chunk ref_count with stragglers marked invalid is also exact
    d_b2, i_b2 = knn.knn(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                         k=3, chunk=256, ref_count=jnp.int32(n_r))
    assert np.array_equal(np.asarray(i_b2), np.asarray(i_full))


def test_knn_respects_validity():
    q = jnp.asarray([[0.0, 0, 0]])
    r = jnp.asarray([[0.1, 0, 0], [0.2, 0, 0], [5, 5, 5]])
    valid = jnp.asarray([False, True, True])
    d2, idx = knn.knn(q, r, valid, k=2)
    assert int(idx[0, 0]) == 1  # nearest VALID
    assert int(idx[0, 1]) == 2


def test_knn_self_excludes_self():
    pts = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [2, 0, 0]])
    mean_d2, idx = knn.knn_self(pts, jnp.ones(3, bool), k=2)
    assert int(idx[0, 0]) == 1 and int(idx[0, 1]) == 2
    assert np.allclose(float(mean_d2[0]), (1 + 4) / 2, atol=1e-4)


def test_accumulate_gaussian_error():
    H, W, P = 4, 4, 8
    cidx = jnp.full((H, W), -1, jnp.int32).at[0, 0].set(2).at[0, 1].set(2).at[1, 1].set(5)
    didx = jnp.full((H, W), -1, jnp.int32).at[2, 2].set(3)
    cerr = jnp.zeros((H, W)).at[0, 0].set(1.0).at[0, 1].set(3.0).at[1, 1].set(4.0)
    derr = jnp.zeros((H, W)).at[2, 2].set(0.5)
    g_c, g_d, g_n = segment.accumulate_gaussian_error(cerr, derr, derr, cidx, didx, P)
    assert np.allclose(float(g_c[2]), 2.0)      # mean(1, 3)
    assert np.allclose(float(g_c[5]), 4.0)
    assert np.allclose(float(g_d[3]), 0.5)
    assert float(g_c[0]) == 0.0


def test_icp_recovers_pose(synthetic_cams):
    cams = synthetic_cams
    from rtgslam_tpu.config import read_config
    import os
    args = read_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "base.yaml"))
    args.icp_use_model_depth = False
    tracker = icp.IcpTracker(args)
    K = jnp.asarray(cams[0].intrinsic)
    tracker.update_curr_status(jnp.asarray(cams[0].depth), K)
    tracker.move_last_status()
    tracker.update_curr_status(jnp.asarray(cams[1].depth), K)
    pose10, ok = tracker.predict_pose()
    gt_rel = np.linalg.inv(cams[0].pose_gt) @ cams[1].pose_gt
    assert ok
    assert np.linalg.norm(pose10[:3, 3] - gt_rel[:3, 3]) < 2e-3  # < 2 mm
    R_err = pose10[:3, :3].T @ gt_rel[:3, :3]
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 0.2


def test_exp_se3_equals_reference_order():
    """Twist layout is [rot, trans] (reference icp.py:271-310)."""
    from rtgslam_tpu.utils.geometry import exp_se3

    xi = jnp.asarray([0.0, 0, 0, 1, 2, 3])
    T = np.asarray(exp_se3(xi))
    assert np.allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
    xi2 = jnp.asarray([0.1, 0, 0, 0, 0, 0])
    T2 = np.asarray(exp_se3(xi2))
    assert abs(T2[1, 2] + np.sin(0.1)) < 1e-5


def test_stable_partition_order_matches_argsort():
    rng = np.random.default_rng(3)
    for n in (1, 7, 128, 1000):
        mask = jnp.asarray(rng.random(n) < 0.4)
        got = np.asarray(segment.stable_partition_order(mask))
        want = np.argsort(~np.asarray(mask), kind="stable")
        assert np.array_equal(got, want), n
    # all-true / all-false edges
    for mask in (jnp.ones(16, bool), jnp.zeros(16, bool)):
        got = np.asarray(segment.stable_partition_order(mask))
        assert np.array_equal(got, np.arange(16))
