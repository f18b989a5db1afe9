from tpdlp.presolve.reductions import presolve, postsolve, PostsolveData

__all__ = ["presolve", "postsolve", "PostsolveData"]
