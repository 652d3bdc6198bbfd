from .tracker import Tracker
from .mapper import Mapper

__all__ = ["Tracker", "Mapper"]
