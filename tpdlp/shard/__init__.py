from tpdlp.shard.mesh import (
    init_distributed,
    make_solver_mesh,
    problem_shardings,
    shard_device_problem,
    shard_state,
)

__all__ = [
    "init_distributed",
    "make_solver_mesh",
    "problem_shardings",
    "shard_device_problem",
    "shard_state",
]
