from .sharded import (make_mesh, dp_optimize_step, dp_global_optimize,
                      dp_local_optimize, dryrun_multichip)
from .sp_render import sp_render

__all__ = ["make_mesh", "dp_optimize_step", "dp_global_optimize",
           "dp_local_optimize", "dryrun_multichip", "sp_render"]
