from .loader import GroupParams, read_config, merge_dicts, save_config
from .params import (
    ParamGroup,
    DatasetParams,
    OptimizationParams,
    MapParams,
)

__all__ = [
    "GroupParams",
    "read_config",
    "merge_dicts",
    "save_config",
    "ParamGroup",
    "DatasetParams",
    "OptimizationParams",
    "MapParams",
]
