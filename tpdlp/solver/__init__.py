from tpdlp.solver.solve import solve, SolveResult

__all__ = ["solve", "SolveResult"]
