from tpdlp.scaling.ruiz import ruiz_equilibrate, pock_chambolle, scale_problem

__all__ = ["ruiz_equilibrate", "pock_chambolle", "scale_problem"]
