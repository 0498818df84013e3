"""Compat: reference ``linprog/simplex.py`` -> TPU-native general solver."""

from linprog_tpu.api import SimplexSolver

__all__ = ["SimplexSolver"]
