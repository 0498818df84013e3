"""Host-side structural presolve: reductions + postsolve vs plain solves."""

import numpy as np
import pytest

from linprog_tpu import status as st
from linprog_tpu.presolve_host import presolve_problem, solve_with_presolve
from linprog_tpu.status import (
    PrimalIsInfeasibleError,
    PrimalIsUnboundedError,
)

scipy_opt = pytest.importorskip("scipy.optimize")


def _highs(c, A=None, b=None, G=None, h=None, lb=None, ub=None):
    n = len(c)
    lb = np.zeros(n) if lb is None else lb
    ub = np.full(n, np.inf) if ub is None else ub
    bounds = [(lo if np.isfinite(lo) else None,
               hi if np.isfinite(hi) else None) for lo, hi in zip(lb, ub)]
    return scipy_opt.linprog(c, A_eq=A, b_eq=b, A_ub=G, b_ub=h,
                             bounds=bounds, method="highs")


def test_reductions_fire_and_solution_matches():
    # structure: x0 fixed, x2 empty column, row 1 of G is a singleton,
    # row 1 of A is a singleton fixing x3
    rng = np.random.default_rng(0)
    n = 6
    c = np.array([1.0, -2.0, 0.5, 1.0, -1.0, 2.0])
    A = np.zeros((2, n))
    A[0, [1, 4, 5]] = [1.0, 2.0, -1.0]
    b = np.array([3.0, 2.0])
    A[1, 3] = 2.0  # singleton: x3 = 1
    G = np.zeros((3, n))
    G[0, [1, 4]] = [1.0, 1.0]
    G[1, 4] = 1.0  # singleton: x4 <= 1.5
    G[2, [1, 5]] = [-1.0, 1.0]
    h = np.array([2.5, 1.5, 4.0])
    lb = np.zeros(n)
    ub = np.full(n, np.inf)
    lb[0] = ub[0] = 0.7  # fixed variable
    ub[1] = 5.0
    # x2 appears in no constraint and c2 > 0 -> sits at lb

    red = presolve_problem(c, A, b, G, h, lb, ub)
    assert red.post.status == st.RUNNING
    assert red.post.fixed_mask[[0, 2, 3]].all()
    assert red.c.shape[0] < n
    assert red.G.shape[0] < 3  # singleton G row absorbed into the bound

    res = solve_with_presolve(c, A, b, G, h, lb, ub)
    ref = _highs(c, A, b, G, h, lb, ub)
    assert ref.status == 0 and res.optimum
    assert res.cost == pytest.approx(ref.fun, rel=1e-6, abs=1e-8)
    np.testing.assert_allclose(res.x[0], 0.7)
    np.testing.assert_allclose(res.x[3], 1.0)


def test_presolve_detects_infeasible_bounds_and_rows():
    c = np.ones(3)
    lb = np.array([0.0, 2.0, 0.0])
    ub = np.array([1.0, 1.0, 1.0])  # lb1 > ub1
    red = presolve_problem(c, lb=lb, ub=ub)
    assert red.post.status == st.PRIMAL_INFEASIBLE
    with pytest.raises(PrimalIsInfeasibleError):
        solve_with_presolve(c, lb=lb, ub=ub)

    # zero A row with nonzero rhs
    A = np.zeros((1, 3))
    b = np.array([1.0])
    red = presolve_problem(c, A=A, b=b)
    assert red.post.status == st.PRIMAL_INFEASIBLE


def test_presolve_detects_unbounded_free_column():
    # empty column with negative cost and no upper bound
    c = np.array([-1.0, 1.0])
    G = np.array([[0.0, 1.0]])
    h = np.array([2.0])
    with pytest.raises(PrimalIsUnboundedError):
        solve_with_presolve(c, G=G, h=h)


def test_fully_determined_by_presolve():
    # singleton equality rows pin every variable
    c = np.array([1.0, 2.0])
    A = np.array([[2.0, 0.0], [0.0, 1.0]])
    b = np.array([4.0, 3.0])
    res = solve_with_presolve(c, A=A, b=b)
    assert res.optimum and res.iters == 0
    np.testing.assert_allclose(res.x, [2.0, 3.0])
    assert res.cost == pytest.approx(8.0)


def test_random_instances_presolve_equals_plain():
    rng = np.random.default_rng(4)
    for trial in range(4):
        m, n = 6, 9
        G = rng.standard_normal((m, n))
        x0 = rng.random(n)
        h = G @ x0 + rng.random(m)
        cc = 0.2 + rng.random(n) - G.T @ rng.random(m)
        lb = np.zeros(n)
        ub = np.full(n, np.inf)
        # inject structure: fix one var, empty one column, singleton row
        lb[0] = ub[0] = 0.3
        G[:, 1] = 0.0
        cc[1] = abs(cc[1])
        G[2, :] = 0.0
        G[2, 3] = 1.0
        h[2] = 0.8
        res = solve_with_presolve(cc, G=G, h=h, lb=lb, ub=ub)
        ref = _highs(cc, G=G, h=h, lb=lb, ub=ub)
        assert ref.status == 0, trial
        assert res.optimum, trial
        assert res.cost == pytest.approx(ref.fun, rel=1e-5, abs=1e-6), trial


def test_batch_general_with_presolve():
    """solve_batch_general(presolve=True): reduced instances solve to the
    same optima, presolve-resolved instances never reach the device."""
    from linprog_tpu import status as stt
    from linprog_tpu.batch import solve_batch_general

    rng = np.random.default_rng(8)
    problems = []
    # 0: plain feasible instance
    G = rng.standard_normal((5, 7))
    x0 = rng.random(7)
    problems.append({
        "c": 0.2 + rng.random(7) - G.T @ rng.random(5),
        "G": G, "h": G @ x0 + rng.random(5),
    })
    # 1: instance with structure (empty col 0 with c>0, singleton G row)
    G2 = rng.standard_normal((4, 6))
    G2[:, 0] = 0.0
    G2[1, :] = 0.0
    G2[1, 3] = 1.0
    x0 = rng.random(6)
    h2 = G2 @ x0 + rng.random(4)
    c2 = 0.2 + rng.random(6) - G2.T @ rng.random(4)
    c2[0] = abs(c2[0])
    problems.append({"c": c2, "G": G2, "h": h2})
    # 2: infeasible by contradictory equalities -> resolved at presolve
    problems.append({
        "c": np.ones(2),
        "A": np.array([[1.0, 0.0], [1.0, 0.0]]),
        "b": np.array([1.0, 2.0]),
    })
    # 3: fully determined by singleton equalities
    problems.append({
        "c": np.array([1.0, 2.0]),
        "A": np.array([[2.0, 0.0], [0.0, 1.0]]),
        "b": np.array([4.0, 3.0]),
    })

    plain = solve_batch_general(problems[:2], 400, 400)
    pres = solve_batch_general(problems, 400, 400, presolve=True)
    for i in range(2):
        assert pres[i].optimum
        assert pres[i].cost == pytest.approx(plain[i].cost, rel=1e-5,
                                             abs=1e-5)
        np.testing.assert_allclose(pres[i].x, plain[i].x, atol=1e-4)
    assert pres[2].status == stt.PRIMAL_INFEASIBLE and not pres[2].optimum
    assert pres[3].optimum and pres[3].iters == 0
    np.testing.assert_allclose(pres[3].x, [2.0, 3.0])
