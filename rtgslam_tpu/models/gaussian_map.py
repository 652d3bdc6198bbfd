"""Fixed-capacity structure-of-arrays Gaussian map.

Design stance (vs the reference's three growable ``GaussianPointCloud``
containers, ``SLAM/gaussian_pointcloud.py:27-51`` + ``mapper.py:21-23``):
the whole map lives in ONE preallocated HBM pytree of ``capacity`` slots with
a per-slot ``status`` flag (FREE / UNSTABLE / STABLE).  Consequences:

* every operation is jittable with static shapes — the map growing or
  shrinking never recompiles anything;
* "delete" is a status clear, "fix" (unstable -> stable) is a status write —
  no tensor reallocation or concatenation;
* the reference's concat-unstable-then-stable render input
  (``mapper.py:1081-1108``) becomes just a different alive-mask over the same
  arrays, so stable/unstable/global renders share one compiled executable.

Raw (pre-activation) parameters are stored, exactly like the reference
optimizes raw values: scaling is log-scale, opacity is logit, rotation is an
unnormalized quaternion.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.geometry import quat_to_rotmat, normalize

FREE, UNSTABLE, STABLE = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class GaussianMapConfig:
    capacity: int = 262144
    temp_capacity: int = 65536
    max_sh_degree: int = 3
    init_opacity: float = 0.99
    scale_factor: float = 1.0
    min_radius: float = 0.001
    max_radius: float = 0.05
    xyz_factor: tuple = (1.0, 1.0, 0.1)

    @property
    def n_rest(self) -> int:
        return (self.max_sh_degree + 1) ** 2 - 1

    @classmethod
    def from_args(cls, args) -> "GaussianMapConfig":
        return cls(
            capacity=getattr(args, "map_capacity", 262144),
            temp_capacity=getattr(args, "temp_capacity", 65536),
            max_sh_degree=args.max_sh_degree,
            init_opacity=args.init_opacity,
            scale_factor=args.scale_factor,
            min_radius=args.min_radius,
            max_radius=args.max_radius,
            xyz_factor=tuple(args.xyz_factor),
        )


class MapState(struct.PyTreeNode):
    """The complete map as a pytree of [P, ...] arrays."""

    xyz: jnp.ndarray             # [P, 3]
    features_dc: jnp.ndarray     # [P, 3]
    features_rest: jnp.ndarray   # [P, R, 3]
    scaling: jnp.ndarray         # [P, 3] log-scale
    rotation: jnp.ndarray        # [P, 4] quaternion (w,x,y,z)
    opacity: jnp.ndarray         # [P, 1] logit
    confidence: jnp.ndarray      # [P, 1]
    add_tick: jnp.ndarray        # [P, 1] int32
    depth_error_counter: jnp.ndarray  # [P, 1] int32
    color_error_counter: jnp.ndarray  # [P, 1] int32
    status: jnp.ndarray          # [P] int32

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, config: GaussianMapConfig) -> "MapState":
        P, R = config.capacity, config.n_rest
        f32, i32 = jnp.float32, jnp.int32
        return cls(
            xyz=jnp.zeros((P, 3), f32),
            features_dc=jnp.zeros((P, 3), f32),
            features_rest=jnp.zeros((P, R, 3), f32),
            scaling=jnp.full((P, 3), -13.8, f32),   # log(1e-6)
            rotation=jnp.zeros((P, 4), f32).at[:, 0].set(1.0),
            opacity=jnp.zeros((P, 1), f32),
            confidence=jnp.zeros((P, 1), f32),
            add_tick=jnp.zeros((P, 1), i32),
            depth_error_counter=jnp.zeros((P, 1), i32),
            color_error_counter=jnp.zeros((P, 1), i32),
            status=jnp.zeros((P,), i32),
        )

    # -- derived quantities -------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def params(self) -> Dict[str, jnp.ndarray]:
        """The six optimizable raw parameter groups."""
        return {
            "xyz": self.xyz,
            "features_dc": self.features_dc,
            "features_rest": self.features_rest,
            "scaling": self.scaling,
            "rotation": self.rotation,
            "opacity": self.opacity,
        }

    def with_params(self, params: Dict[str, jnp.ndarray]) -> "MapState":
        return self.replace(**params)


# ---------------------------------------------------------------------------
# activations (free functions so the optimize loop can call them on raw
# parameter dicts during autodiff)
# ---------------------------------------------------------------------------

def activated_scales(scaling: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(scaling)


def activated_opacity(opacity: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(opacity)


def shs_from_features(features_dc: jnp.ndarray, features_rest: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([features_dc[:, None, :], features_rest], axis=1)


def derived_normal(scaling: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """World normal = rotation column of the smallest scale axis (reference
    ``gaussian_pointcloud.py:539-550`` ``get_normal``)."""
    R = quat_to_rotmat(rotation)                    # columns are local axes
    min_axis = jnp.argmin(scaling, axis=-1)
    cols = jnp.swapaxes(R, -1, -2)                  # [P, axis, xyz]
    n = jnp.take_along_axis(cols, min_axis[:, None, None].repeat(3, -1), axis=1)[:, 0]
    return normalize(n)


def gaussian_radius(scaling: jnp.ndarray) -> jnp.ndarray:
    """Disc radius = mean of the two largest activated scales (reference
    ``get_radius``, gaussian_pointcloud.py:515-519)."""
    s = activated_scales(scaling)
    return (jnp.sum(s, axis=-1) - jnp.min(s, axis=-1)) / 2.0


def render_inputs(state: MapState, alive: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Activated arrays for the rasterizer with the given alive mask."""
    return {
        "xyz": state.xyz,
        "scales": activated_scales(state.scaling),
        "rotations": normalize(state.rotation),
        "opacity": activated_opacity(state.opacity),
        "shs": shs_from_features(state.features_dc, state.features_rest),
        "normal": derived_normal(state.scaling, state.rotation),
        "alive": alive,
    }


def unstable_mask(state: MapState) -> jnp.ndarray:
    return state.status == UNSTABLE


def stable_mask(state: MapState) -> jnp.ndarray:
    return state.status == STABLE


def alive_mask(state: MapState) -> jnp.ndarray:
    return state.status != FREE


def counts(state: MapState):
    """(unstable, stable) slot counts as device scalars."""
    return (
        jnp.sum(state.status == UNSTABLE),
        jnp.sum(state.status == STABLE),
    )


# ---------------------------------------------------------------------------
# host-side import/export (checkpoints)
# ---------------------------------------------------------------------------

def to_numpy_dict(state: MapState, which: int) -> Dict[str, np.ndarray]:
    """Extract the compacted rows with the given status as numpy arrays."""
    status = np.asarray(state.status)
    sel = np.nonzero(status == which)[0]
    return {
        "xyz": np.asarray(state.xyz)[sel],
        "features_dc": np.asarray(state.features_dc)[sel],
        "features_rest": np.asarray(state.features_rest)[sel],
        "opacity": np.asarray(state.opacity)[sel],
        "scaling": np.asarray(state.scaling)[sel],
        "rotation": np.asarray(state.rotation)[sel],
        "confidence": np.asarray(state.confidence)[sel],
    }


def load_numpy_dict(state: MapState, data: Dict[str, np.ndarray],
                    status_value: int = STABLE, start: int = 0) -> MapState:
    """Insert rows from a checkpoint dict starting at slot ``start``."""
    n = data["xyz"].shape[0]
    sl = slice(start, start + n)
    rest = data["features_rest"]
    if rest.shape[1] < state.features_rest.shape[1]:
        pad = state.features_rest.shape[1] - rest.shape[1]
        rest = np.pad(rest, ((0, 0), (0, pad), (0, 0)))
    return state.replace(
        xyz=state.xyz.at[sl].set(data["xyz"]),
        features_dc=state.features_dc.at[sl].set(data["features_dc"]),
        features_rest=state.features_rest.at[sl].set(rest),
        opacity=state.opacity.at[sl].set(data["opacity"]),
        scaling=state.scaling.at[sl].set(data["scaling"]),
        rotation=state.rotation.at[sl].set(data["rotation"]),
        confidence=state.confidence.at[sl].set(data["confidence"]),
        status=state.status.at[sl.start:sl.start + n].set(status_value),
    )
