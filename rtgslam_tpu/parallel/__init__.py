from .sharded import make_mesh, dp_optimize_step, dryrun_multichip

__all__ = ["make_mesh", "dp_optimize_step", "dryrun_multichip"]
