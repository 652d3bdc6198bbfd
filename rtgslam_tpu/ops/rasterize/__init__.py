from .api import RasterSettings, render, render_from_camera

__all__ = ["RasterSettings", "render", "render_from_camera"]
