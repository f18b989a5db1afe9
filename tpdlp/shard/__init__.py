from tpdlp.shard.mesh import (
    make_solver_mesh,
    problem_shardings,
    shard_device_problem,
    shard_state,
)

__all__ = [
    "make_solver_mesh",
    "problem_shardings",
    "shard_device_problem",
    "shard_state",
]
