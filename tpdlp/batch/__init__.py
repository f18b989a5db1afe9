from tpdlp.batch.vmapped import solve_batch

__all__ = ["solve_batch"]
