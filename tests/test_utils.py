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


def test_mesh_roundtrip_and_surface_sampling(tmp_path):
    """write_mesh/read_mesh roundtrip + area-weighted surface sampling
    (trimesh.sample.sample_surface semantics, reference SLAM/eval.py:193)."""
    from rtgslam_tpu.slam.eval import sample_mesh_surface

    # two triangles: a big 2x2 quad piece and a tiny sliver — samples must
    # land area-proportionally and inside the triangles
    verts = np.array([[0, 0, 0], [2, 0, 0], [2, 2, 0], [0, 2, 0],
                      [5, 0, 0], [5.01, 0, 0], [5, 0.01, 0]], np.float32)
    faces = np.array([[0, 1, 2], [4, 5, 6]], np.int32)
    path = str(tmp_path / "mesh.ply")
    ply.write_mesh(path, verts, faces)
    v2, f2 = ply.read_mesh(path)
    assert np.allclose(v2, verts) and np.array_equal(f2, faces)

    pts = sample_mesh_surface(v2, f2, 20_000, seed=0)
    frac_big = np.mean(pts[:, 0] < 4.0)
    assert frac_big > 0.999   # big triangle area 2.0 vs sliver 5e-5
    big = pts[pts[:, 0] < 4.0]
    assert np.all(big[:, 2] == 0)
    assert np.all(big[:, 1] <= big[:, 0] + 1e-5)   # inside triangle 0-1-2
    # uniform coverage: the centroid of uniform samples on that triangle
    assert np.allclose(big.mean(0)[:2], [4 / 3, 2 / 3], atol=0.02)


def test_eval_pcd_surface_vs_vertex_protocol(tmp_path):
    """Surface- vs vertex-sampled GT differ measurably (VERDICT r4 #5 done
    criterion): a coarse mesh whose interior is reconstructed but whose
    vertices are missed scores recall ~0 under vertex-GT and high under the
    reference's surface protocol."""
    from rtgslam_tpu.slam.eval import eval_pcd

    # one 1m x 1m quad, vertices only at the corners
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh_path = str(tmp_path / "gt.ply")
    ply.write_mesh(mesh_path, verts, faces)
    # a vertex-only "mesh" (no face element) for the fallback path
    vert_path = str(tmp_path / "gt_verts.ply")
    ply.write_ply(vert_path, {"x": verts[:, 0], "y": verts[:, 1], "z": verts[:, 2]})

    # reconstruction covers the interior but stops 15 cm short of corners
    g = np.linspace(0.15, 0.85, 40, dtype=np.float32)
    gx, gy = np.meshgrid(g, g)
    rec = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size, np.float32)], 1)

    surf = eval_pcd(rec, mesh_path, sample=20_000)
    vert = eval_pcd(rec, vert_path, sample=20_000)
    assert surf["recall"] > 0.4          # interior GT samples are covered
    assert vert["recall"] < 1e-6         # corner vertices all > 3 cm away
    assert surf["f1"] > vert["f1"] + 0.3
    assert surf["precision"] > 0.999     # rec points lie on the surface


def test_all_scene_configs_resolve():
    """Every shipped scene config resolves through its ``parent:`` chain to
    the full key set (reference tree: ``configs/{replica,tum,scannetpp,ours}``
    incl. ``tum/fr2_xyz.yaml``/``fr3_office.yaml`` mirroring
    ``/root/reference/configs/tum/``)."""
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_yamls = sorted(
        glob.glob(os.path.join(repo, "configs", "*", "*.yaml")))
    scene_yamls = [p for p in scene_yamls
                   if os.sep + "orb_config" + os.sep not in p
                   and os.sep + "dataset" + os.sep not in p]
    assert len(scene_yamls) >= 17   # 8 replica + 3 tum + 4 scannetpp + ours + synthetic
    names = {os.path.basename(p) for p in scene_yamls}
    assert {"fr1_desk.yaml", "fr2_xyz.yaml", "fr3_office.yaml"} <= names
    os.chdir(repo)   # parent: paths are repo-relative, as in the reference
    for p in scene_yamls:
        args = read_config(p)
        # keys from every level of the chain: scene, dataset base, base.yaml
        for key in ("source_path", "save_path", "type",
                    "gaussian_update_iter", "stable_confidence_thres",
                    "icp_downscales", "map_capacity"):
            assert hasattr(args, key), f"{p} missing {key}"
    fr2 = read_config(os.path.join(repo, "configs", "tum", "fr2_xyz.yaml"))
    assert fr2.source_path.endswith("rgbd_dataset_freiburg2_xyz")
    assert fr2.orb_settings_path.endswith("tum2.yaml")
    fr3 = read_config(os.path.join(repo, "configs", "tum", "fr3_office.yaml"))
    assert fr3.source_path.endswith("freiburg3_long_office_household")
    assert fr3.stable_confidence_thres == 200   # inherited from tum_base


def test_param_group_extract():
    from rtgslam_tpu.config import OptimizationParams, GroupParams

    ns = GroupParams()
    ns.position_lr = 0.123
    ns.unrelated = "x"
    g = OptimizationParams().extract(ns)
    assert g.position_lr == 0.123
    assert not hasattr(g, "unrelated")
