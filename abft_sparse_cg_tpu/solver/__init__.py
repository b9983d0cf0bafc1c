"""CG solver core."""

from .cg import CGResult, make_cg_solver

__all__ = ["CGResult", "make_cg_solver"]
