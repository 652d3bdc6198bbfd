from .gaussian_map import MapState, GaussianMapConfig
from . import losses, optimize, map_ops

__all__ = ["MapState", "GaussianMapConfig", "losses", "optimize", "map_ops"]
