from .reference_impl import OracleSimplex, oracle_solve

__all__ = ["OracleSimplex", "oracle_solve"]
