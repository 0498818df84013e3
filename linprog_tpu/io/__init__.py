from .mps import MPSProblem, mps_to_solver_inputs, read_mps

__all__ = ["read_mps", "MPSProblem", "mps_to_solver_inputs"]
