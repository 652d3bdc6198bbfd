"""Evaluation: per-frame render quality + point-cloud geometry metrics.

Reference contracts (``SLAM/eval.py``):
  eval_frame  (:226) -> eval_picture (:38): PSNR / (MS-)SSIM / LPIPS /
              depth-L1 (cm) / valid-pixel-ratio, comparison JPGs;
  eval_pcd    (:176): accuracy & completion (cm), precision/recall/F1 @ 3 cm
              against the GT mesh vertices (KDTree nearest distances).

LPIPS requires pretrained AlexNet features.  Permanent contract (single
gate, ``models/lpips.py``): ``LPIPS_WEIGHTS`` set -> real number in every
eval output; unset -> the column is absent.  No NaN path exists.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models import losses
from ..ops.rasterize import RasterSettings
from ..utils.ply import read_ply


def lpips(img: np.ndarray, gt: np.ndarray):
    """LPIPS(alex) when weights are available, else None (pure-JAX AlexNet,
    see models/lpips.py; export weights with scripts/export_lpips_weights.py
    on a connected machine and point LPIPS_WEIGHTS at the npz).  The gate
    lives in models/lpips.py — this is a thin re-export (reference scores
    LPIPS per frame, SLAM/eval.py:58-66)."""
    from ..models.lpips import lpips as lpips_jax

    return lpips_jax(img, gt)


def eval_picture(render_out: Dict, gt_color: np.ndarray, gt_depth: np.ndarray,
                 save_path: Optional[str] = None, name: str = "eval",
                 min_depth: float = 0.0, max_depth: float = 5.0) -> Dict[str, float]:
    img = np.asarray(render_out["render"]).clip(0, 1)
    depth = np.asarray(render_out["depth"])[..., 0]
    gt_c = np.asarray(gt_color)
    gt_d = np.asarray(gt_depth)
    if gt_d.ndim == 3:
        gt_d = gt_d[..., 0]

    psnr = float(losses.psnr(jnp.asarray(img), jnp.asarray(gt_c)))
    ssim_v = float(losses.ssim(jnp.asarray(img), jnp.asarray(gt_c)))
    ms_ssim_v = float(losses.ms_ssim(jnp.asarray(img), jnp.asarray(gt_c)))

    valid = (gt_d > 0) & (depth > 0)
    depth_l1 = float(np.abs(depth - gt_d)[valid].mean() * 100) if valid.any() else 0.0
    valid_ratio = float(((depth > 0) & (gt_d > 0)).sum() / max((gt_d > 0).sum(), 1))

    metrics = {
        "psnr": psnr,
        "ssim": ssim_v,
        "ms_ssim": ms_ssim_v,
        "depth_l1_cm": depth_l1,
        "valid_ratio": valid_ratio,
        # dropped gaussian-tile entries: non-zero means the static binning
        # capacities are undersized for this map/view (silently truncated
        # far gaussians render as holes — raise tile_capacity)
        "bin_overflow": int(render_out.get("overflow", 0)),
    }
    lp = lpips(img.astype(np.float32), gt_c.astype(np.float32))
    if lp is not None:
        metrics["lpips"] = lp
    elif not eval_picture._warned_lpips:
        eval_picture._warned_lpips = True
        print("[eval] lpips: unavailable (no AlexNet weights shipped; set "
              "LPIPS_WEIGHTS to an npz from scripts/export_lpips_weights.py)")

    if save_path:
        import cv2

        os.makedirs(save_path, exist_ok=True)
        row_color = np.concatenate([gt_c, img], axis=1)
        cv2.imwrite(os.path.join(save_path, f"{name}_color.jpg"),
                    cv2.cvtColor((row_color * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
        span = max(max_depth - min_depth, 1e-6)
        row_depth = np.concatenate([gt_d, depth], axis=1)
        dn = ((row_depth - min_depth) / span).clip(0, 1)
        cv2.imwrite(os.path.join(save_path, f"{name}_depth.jpg"),
                    cv2.applyColorMap((dn * 255).astype(np.uint8), cv2.COLORMAP_JET))
    return metrics


eval_picture._warned_lpips = False


def eval_frame(mapper, frame, save_path: Optional[str] = None,
               min_depth: float = 0.0, max_depth: float = 5.0,
               save_picture: bool = False, run_pcd: bool = False,
               pcd_gt_path: Optional[str] = None,
               opaque_threshold_eval: Optional[float] = None,
               pcd_rec_path: Optional[str] = None,
               settings=None) -> Dict[str, float]:
    """Render the frame from the current map and score it
    (reference SLAM/eval.py:226-274).

    ``pcd_rec_path`` points geometry eval at a reconstruction PLY — the
    densified point cloud when available (reference metric.py:156-157
    prefers ``pcd_densify.ply`` over raw gaussian centers).
    ``settings`` overrides the mapper's RasterSettings — needed when the
    eval camera's resolution differs from the mapping resolution (the
    banded path maps at H/n_bands but evals the final keyframe full-res)."""
    if settings is None:
        settings = mapper.settings
    if opaque_threshold_eval is not None:
        import dataclasses

        settings = dataclasses.replace(
            settings, opaque_threshold=opaque_threshold_eval)
    out = mapper._render(frame.device_dict(), "global", settings=settings)
    name = f"frame_{frame.uid:04d}"
    metrics = eval_picture(
        out, frame.image, frame.depth,
        save_path if save_picture else None, name, min_depth, max_depth)
    if run_pcd and pcd_gt_path and os.path.exists(pcd_gt_path):
        if pcd_rec_path and os.path.exists(pcd_rec_path):
            cols = read_ply(pcd_rec_path)
            pts = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
        else:
            from ..models.gaussian_map import STABLE, to_numpy_dict

            data = to_numpy_dict(mapper.state, STABLE)
            pts = data["xyz"]
        metrics.update(eval_pcd(pts, pcd_gt_path))
    if save_path:
        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, f"{name}.json"), "w") as f:
            json.dump(metrics, f, indent=2)
    return metrics


def sample_mesh_surface(vertices: np.ndarray, faces: np.ndarray,
                        n: int, seed: int = 0) -> np.ndarray:
    """Area-weighted uniform sampling of a triangle mesh's surface —
    the ``trimesh.sample.sample_surface`` semantics the reference GT side
    uses (``SLAM/eval.py:193``): pick triangles with probability
    proportional to area, then a uniform barycentric point per pick."""
    rng = np.random.default_rng(seed)
    v0 = vertices[faces[:, 0]]
    e1 = vertices[faces[:, 1]] - v0
    e2 = vertices[faces[:, 2]] - v0
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    total = area.sum()
    if total <= 0:
        return vertices[rng.integers(0, len(vertices), n)]
    tri = rng.choice(len(faces), size=n, p=area / total)
    # uniform barycentric: fold (u, v) with u+v>1 back into the triangle
    u = rng.random(n)
    v = rng.random(n)
    over = u + v > 1.0
    u = np.where(over, 1.0 - u, u)
    v = np.where(over, 1.0 - v, v)
    return (v0[tri] + u[:, None] * e1[tri] + v[:, None] * e2[tri]).astype(np.float32)


def eval_pcd(points: np.ndarray, gt_mesh_path: str,
             threshold: float = 0.03, sample: int = 1_000_000) -> Dict[str, float]:
    """Accuracy / completion / P / R / F1 vs the GT mesh, reference protocol
    (``SLAM/eval.py:176-223``): the GT side is ``sample`` points drawn
    area-weighted from the mesh SURFACE (``trimesh.sample.sample_surface``,
    :193 — NOT the vertices, whose density tracks triangulation rather than
    area), the reconstruction side is subsampled to the same budget, both
    sides scored with nearest-neighbour KDTree distances.  Meshes without a
    face element fall back to vertex sampling (synthetic point-set GTs)."""
    from scipy.spatial import cKDTree

    from ..utils.ply import read_mesh

    verts, faces = read_mesh(gt_mesh_path)
    rng = np.random.default_rng(0)
    if faces is not None and len(faces):
        gt = sample_mesh_surface(verts, faces, sample)
    else:
        gt = verts
        if len(gt) > sample:
            gt = gt[rng.choice(len(gt), sample, replace=False)]
    if len(points) > sample:
        points = points[rng.choice(len(points), sample, replace=False)]

    d_p2g, _ = cKDTree(gt).query(points, k=1)
    d_g2p, _ = cKDTree(points).query(gt, k=1)
    precision = float((d_p2g < threshold).mean())
    recall = float((d_g2p < threshold).mean())
    f1 = 2 * precision * recall / max(precision + recall, 1e-8)
    return {
        "accuracy_cm": float(d_p2g.mean() * 100),
        "completion_cm": float(d_g2p.mean() * 100),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
