from . import geometry, sh, ply, traj, monitor, general

__all__ = ["geometry", "sh", "ply", "traj", "monitor", "general"]
