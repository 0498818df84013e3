"""The `linprog` compat package must serve reference-style user code
unchanged: same import paths, same call patterns, same results."""

import numpy as np
import pytest

from tests.problems import DUAL_PROBLEMS, PRIMAL_PROBLEMS


def test_reference_import_paths_work():
    from linprog.data_classes import LinProgResult  # noqa: F401
    from linprog.dual_solvers import (  # noqa: F401
        DualNaiveSimplexSolver,
        DualRevisedSimplexSolver,
    )
    from linprog.exceptions import (  # noqa: F401
        BasisIsPrimalInfeasibleError,
        PrimalIsUnboundedError,
    )
    from linprog.preprocessing import ProblemPreprocessingUtils  # noqa: F401
    from linprog.primal_solvers import (  # noqa: F401
        PrimalNaiveSimplexSolver,
        PrimalRevisedSimplexSolver,
    )
    from linprog.simplex import SimplexSolver  # noqa: F401
    from linprog.special_solvers import (  # noqa: F401
        BoundedVariablePrimalSimplexSolver,
        PhaseOneSimplexSolver,
        PrimalDualAlgorithm,
    )
    from linprog.utils import (  # noqa: F401
        dual_simplex_div,
        get_bounds_on_bfs,
        primal_simplex_div,
    )


def test_reference_style_primal_solve():
    # exactly the reference's test pattern (tests/test_primal_base_solvers.py)
    from linprog.primal_solvers import PrimalRevisedSimplexSolver

    p = PRIMAL_PROBLEMS[0]
    solver = PrimalRevisedSimplexSolver(p.c, p.A, p.b, p.starting_basis)
    res = solver.solve()
    assert np.linalg.norm(res.x[res.basis] - p.optimal_bfs, 2) < 1e-2
    assert np.array_equal(np.sort(res.basis), np.sort(p.optimal_basis))


def test_reference_style_dual_solve():
    from linprog.dual_solvers import DualRevisedSimplexSolver

    p = DUAL_PROBLEMS[0]
    solver = DualRevisedSimplexSolver(p.c, p.A, p.b, p.starting_basis)
    res = solver.solve()
    assert np.linalg.norm(res.x[res.basis] - p.optimal_bfs, 2) < 1e-2


def test_reference_style_diet_script():
    # verbatim usage shape of reference examples/diet.py
    from linprog.simplex import SimplexSolver

    from tests.test_diet_example import REFERENCE_COST, diet_problem

    c, G, h, lb, ub = diet_problem()
    solver = SimplexSolver(c=c, G=G, h=h, lb=lb, ub=ub)
    res = solver.solve()
    assert abs(res.cost - REFERENCE_COST) / REFERENCE_COST < 1e-6


def test_reference_style_preprocessing_utils():
    from linprog.preprocessing import ProblemPreprocessingUtils as P

    c, A, b = P.preprocess_problem([1, 2], [[1, 2], [-3, 4]], [-5, 6])
    assert (b >= 0).all()
    c2, A2, b2 = P.canonical_form_to_standard_form([1.0], [[2.0]], [3.0])
    assert A2.shape == (1, 2)


def test_reference_style_utils():
    from linprog.utils import dual_simplex_div, get_bounds_on_bfs, primal_simplex_div

    out = primal_simplex_div(np.array([1.0, 2.0]), np.array([2.0, -1.0]))
    assert out[0] == pytest.approx(0.5) and np.isinf(out[1])
    out = dual_simplex_div(np.array([1.0, 2.0]), np.array([2.0, -1.0]))
    assert np.isinf(out[0]) and out[1] == pytest.approx(2.0)
    assert get_bounds_on_bfs(np.array([[2.0, 1.0]]), np.array([3.0])) > 0
