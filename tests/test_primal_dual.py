"""Primal-dual algorithm (mirrors reference ``tests/test_primal_dual_algorithm.py``)."""

import numpy as np
import pytest

from linprog_tpu import PrimalDualAlgorithm
from linprog_tpu.status import DualIsUnboundedError
from tests.problems import PRIMAL_DUAL_PROBLEMS


@pytest.mark.parametrize("problem", PRIMAL_DUAL_PROBLEMS, ids=lambda p: p.name)
def test_reaches_known_optimum(problem):
    solver = PrimalDualAlgorithm(problem.c, problem.A, problem.b)
    res = solver.solve()
    assert res.optimum
    assert np.allclose(res.x, problem.optimal_bfs, atol=1e-4)
    expected_cost = float(problem.c @ problem.optimal_bfs)
    assert res.cost == pytest.approx(expected_cost, abs=1e-3)


def test_infeasible_problem_raises():
    # -x1 - x2 = 1 with x >= 0 is infeasible
    c = np.array([1.0, 1.0])
    A = np.array([[-1.0, -1.0]])
    b = np.array([1.0])
    solver = PrimalDualAlgorithm(c, A, b)
    with pytest.raises(DualIsUnboundedError):
        solver.solve()
