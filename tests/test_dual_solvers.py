"""Dual engine correctness (mirrors reference ``tests/test_dual_base_solvers.py``)
plus dual-unbounded and dual-infeasible-basis coverage the reference lacks."""

import numpy as np
import pytest

from linprog_tpu import (
    BasisIsDualInfeasibleError,
    DualIsUnboundedError,
    DualNaiveSimplexSolver,
    DualRevisedSimplexSolver,
)
from tests.problems import DUAL_PROBLEMS

SOLVERS = [DualNaiveSimplexSolver, DualRevisedSimplexSolver]
TOL = 1e-5


@pytest.mark.parametrize("problem", DUAL_PROBLEMS, ids=lambda p: p.name)
@pytest.mark.parametrize("solver_cls", SOLVERS)
def test_reaches_known_optimum(problem, solver_cls):
    solver = solver_cls(problem.c, problem.A, problem.b, problem.starting_basis)
    res = solver.solve()
    assert res.optimum
    assert np.array_equal(np.sort(res.basis), np.sort(problem.optimal_basis))
    assert np.linalg.norm(res.x[problem.optimal_basis] - problem.optimal_bfs, 2) < TOL


@pytest.mark.parametrize("solver_cls", SOLVERS)
def test_dual_unbounded_is_primal_infeasible(solver_cls):
    # x1 + s = -1 with x >= 0 is infeasible; slack basis is dual feasible
    c = np.array([1.0, 0.0])
    A = np.array([[-1.0, -1.0]])  # -x1 - s = 1 after sign-fix of b=-1
    b = np.array([1.0])
    # keep b positive? we need a dual-feasible, primal-infeasible start:
    # min x1 s.t. -x1 - x2 = 1, x >= 0 -> infeasible (lhs <= 0 < 1)
    solver = solver_cls(c, A, b, basis=np.array([1]))
    with pytest.raises(DualIsUnboundedError):
        solver.solve()


@pytest.mark.parametrize("solver_cls", SOLVERS)
def test_dual_infeasible_basis_raises(solver_cls):
    # reduced cost of x2 is negative under basis [2, 3] -> not dual feasible
    c = np.array([-1.0, -1.0, 0.0, 0.0])
    A = np.array([[1.0, 1.0, 1.0, 0.0], [1.0, 2.0, 0.0, 1.0]])
    b = np.array([2.0, 3.0])
    with pytest.raises(BasisIsDualInfeasibleError):
        solver_cls(c, A, b, basis=np.array([2, 3]))
