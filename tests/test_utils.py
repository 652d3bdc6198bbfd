"""Unit tests: geometry, SH, PLY I/O, trajectory, config."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rtgslam_tpu.utils import geometry, ply, sh, traj
from rtgslam_tpu.config import read_config


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((32, 4)).astype(np.float32)
    R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
    # orthonormal, det +1
    eye = np.einsum("nij,nkj->nik", R, R)
    assert np.allclose(eye, np.eye(3), atol=1e-5)
    assert np.allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_align_z():
    rng = np.random.default_rng(1)
    n = rng.standard_normal((64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    q = geometry.quat_align_z_to(jnp.asarray(n))
    R = np.asarray(geometry.quat_to_rotmat(q))
    z = R @ np.array([0.0, 0.0, 1.0], np.float32)
    assert np.allclose(z, n, atol=1e-4)


def test_exp_se3_matches_scipy():
    from scipy.linalg import expm

    rng = np.random.default_rng(2)
    for _ in range(5):
        xi = rng.standard_normal(6).astype(np.float32) * 0.3
        T = np.asarray(geometry.exp_se3(jnp.asarray(xi)))
        # build the matrix exponential of the twist
        w, v = xi[:3], xi[3:]
        M = np.zeros((4, 4))
        M[:3, :3] = np.asarray(geometry.skew(jnp.asarray(w)))
        M[:3, 3] = v
        assert np.allclose(T, expm(M), atol=1e-4)


def test_exp_se3_small_angle():
    T = np.asarray(geometry.exp_se3(jnp.zeros(6)))
    assert np.allclose(T, np.eye(4))
    assert np.isfinite(T).all()


def test_sh_dc_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.9]])
    coeff = sh.rgb_to_sh(rgb)
    assert np.allclose(np.asarray(sh.sh_to_rgb(coeff)), np.asarray(rgb), atol=1e-6)
    # degree-0 eval reproduces the DC color (minus the +0.5 shift convention)
    shs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(coeff)
    out = sh.eval_sh(3, shs, jnp.asarray([[0.0, 0.0, 1.0]]))
    assert np.allclose(np.asarray(out) + 0.5, np.asarray(rgb), atol=1e-6)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 100
    data = {
        "xyz": rng.standard_normal((n, 3)).astype(np.float32),
        "features_dc": rng.standard_normal((n, 3)).astype(np.float32),
        "features_rest": rng.standard_normal((n, 15, 3)).astype(np.float32),
        "opacity": rng.standard_normal((n, 1)).astype(np.float32),
        "scaling": rng.standard_normal((n, 3)).astype(np.float32),
        "rotation": rng.standard_normal((n, 4)).astype(np.float32),
        "confidence": rng.random((n, 1)).astype(np.float32),
    }
    path = str(tmp_path / "test.ply")
    ply.save_gaussian_ply(path, data["xyz"], data["features_dc"],
                          data["features_rest"], data["opacity"],
                          data["scaling"], data["rotation"], data["confidence"])
    back = ply.read_gaussian_ply(path)
    for k in data:
        assert np.allclose(back[k], data[k], atol=1e-6), k


def test_ate_zero_for_identical():
    poses = [np.eye(4) for _ in range(10)]
    for i, p in enumerate(poses):
        p[ :3, 3] = [i * 0.1, np.sin(i), 0.0]
    assert traj.ate_rmse(np.stack(poses), np.stack(poses)) < 1e-6


def test_ate_invariant_to_rigid_transform():
    rng = np.random.default_rng(4)
    gt = [np.eye(4) for _ in range(20)]
    for i, p in enumerate(gt):
        p[:3, 3] = rng.standard_normal(3)
    R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(
        rng.standard_normal(4).astype(np.float32))))
    offset = np.eye(4); offset[:3, :3] = R; offset[:3, 3] = [1, 2, 3]
    es = [offset @ p for p in gt]
    assert traj.ate_rmse(np.stack(es), np.stack(gt)) < 1e-4


def test_config_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    child = tmp_path / "child.yaml"
    parent.write_text("parent: None\na: 1\nb: 2\n")
    child.write_text(f"parent: {parent}\nb: 3\nc: 4\n")
    args = read_config(str(child))
    assert args.a == 1 and args.b == 3 and args.c == 4


def test_param_group_extract():
    from rtgslam_tpu.config import OptimizationParams, GroupParams

    ns = GroupParams()
    ns.position_lr = 0.123
    ns.unrelated = "x"
    g = OptimizationParams().extract(ns)
    assert g.position_lr == 0.123
    assert not hasattr(g, "unrelated")
