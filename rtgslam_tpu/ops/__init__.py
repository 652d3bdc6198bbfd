from . import preprocess, icp, knn, segment
from .rasterize import render

__all__ = ["preprocess", "icp", "knn", "segment", "render"]
