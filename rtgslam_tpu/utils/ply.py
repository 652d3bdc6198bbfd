"""Binary PLY I/O for Gaussian point clouds — no third-party deps.

On-disk schema is byte-compatible with the reference checkpoints
(``SLAM/gaussian_pointcloud.py:407-466``): float32 properties
``x,y,z, nx,ny,nz, f_dc_0..2, f_rest_*, opacity, scale_0..2, rot_0..3``
with an optional trailing ``confidence``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def _gaussian_property_names(n_rest: int, include_confidence: bool) -> List[str]:
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(3)]
    names += [f"f_rest_{i}" for i in range(n_rest)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(3)]
    names += [f"rot_{i}" for i in range(4)]
    if include_confidence:
        names.append("confidence")
    return names


def write_ply(path: str, columns: Dict[str, np.ndarray]) -> None:
    """Write a little-endian binary PLY with float32 vertex properties.

    ``columns`` maps property name -> [N] array; insertion order is the
    property order.
    """
    names = list(columns.keys())
    n = len(next(iter(columns.values())))
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header", ""]
    data = np.stack([np.asarray(columns[k], dtype="<f4") for k in names], axis=1)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(data.tobytes())


def save_gaussian_ply(
    path: str,
    xyz: np.ndarray,
    features_dc: np.ndarray,
    features_rest: np.ndarray,
    opacity: np.ndarray,
    scaling: np.ndarray,
    rotation: np.ndarray,
    confidence: Optional[np.ndarray] = None,
) -> None:
    """Save gaussians in the reference PLY schema.

    features_dc: [N, 3]; features_rest: [N, R, 3] (coefficient-major) — the
    flat layout written is channel-major per coefficient to match the 3DGS
    f_rest ordering (transpose(1,2).flatten, reference
    ``gaussian_pointcloud.py:436-443``).
    """
    n = xyz.shape[0]
    rest_flat = np.transpose(np.asarray(features_rest), (0, 2, 1)).reshape(n, -1)
    cols: Dict[str, np.ndarray] = {}
    for i, k in enumerate("xyz"):
        cols[k] = xyz[:, i]
    for k in ("nx", "ny", "nz"):
        cols[k] = np.zeros(n, dtype=np.float32)
    for i in range(3):
        cols[f"f_dc_{i}"] = np.asarray(features_dc)[:, i]
    for i in range(rest_flat.shape[1]):
        cols[f"f_rest_{i}"] = rest_flat[:, i]
    cols["opacity"] = np.asarray(opacity).reshape(n)
    for i in range(3):
        cols[f"scale_{i}"] = np.asarray(scaling)[:, i]
    for i in range(4):
        cols[f"rot_{i}"] = np.asarray(rotation)[:, i]
    if confidence is not None:
        cols["confidence"] = np.asarray(confidence).reshape(n)
    write_ply(path, cols)


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a PLY with float vertex properties into name -> [N] arrays.

    Supports binary little endian and ascii, which covers reference-produced
    checkpoints.
    """
    with open(path, "rb") as f:
        raw = f.read()
    header_end = raw.index(b"end_header")
    header = raw[:header_end].decode("ascii", errors="replace").splitlines()
    body = raw[raw.index(b"\n", header_end) + 1:]

    fmt = "binary_little_endian"
    names: List[str] = []
    types: List[str] = []
    count = 0
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element" and parts[1] == "vertex":
            count = int(parts[2])
        elif parts[0] == "property" and parts[1] != "list":
            types.append(parts[1])
            names.append(parts[2])

    type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4",
                "ushort": "<u2", "short": "<i2"}
    if fmt == "ascii":
        table = np.loadtxt(
            [l for l in body.decode("ascii").splitlines() if l.strip()],
            dtype=np.float64,
        ).reshape(count, len(names))
        return {name: table[:, i].astype(np.float32) for i, name in enumerate(names)}
    dtype = np.dtype([(name, type_map[t]) for name, t in zip(names, types)])
    table = np.frombuffer(body, dtype=dtype, count=count)
    return {name: np.ascontiguousarray(table[name]) for name in names}


def read_gaussian_ply(path: str) -> Dict[str, np.ndarray]:
    """Read a reference-schema gaussian PLY into structured arrays.

    Returns dict with xyz [N,3], features_dc [N,3], features_rest [N,R,3],
    opacity [N,1], scaling [N,3], rotation [N,4], confidence [N,1].
    """
    cols = read_ply(path)
    n = len(cols["x"])
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)
    rest_names = sorted(
        (k for k in cols if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    if rest_names:
        rest = np.stack([cols[k] for k in rest_names], axis=1)
        rest = rest.reshape(n, 3, -1).transpose(0, 2, 1)  # -> [N, R, 3]
    else:
        rest = np.zeros((n, 0, 3), dtype=np.float32)
    scaling = np.stack([cols[f"scale_{i}"] for i in range(3)], axis=1)
    rotation = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)
    opacity = cols["opacity"].reshape(n, 1)
    confidence = cols.get("confidence", np.zeros(n, np.float32)).reshape(n, 1)
    return {
        "xyz": xyz,
        "features_dc": f_dc,
        "features_rest": rest,
        "opacity": opacity,
        "scaling": scaling,
        "rotation": rotation,
        "confidence": confidence,
    }


def merge_gaussian_ply(path0: str, path1: str, out_path: str) -> None:
    """Concatenate two gaussian PLYs (reference ``SLAM/utils.py:383-392``)."""
    a, b = read_ply(path0), read_ply(path1)
    merged = {k: np.concatenate([a[k], b[k]]) for k in a if k in b}
    write_ply(out_path, merged)
