"""Free variables (lb = -inf) through the general front end.

The reference emits a broken inf-rhs bound row for these; here they are
handled by substitution (finite ub) or variable splitting (doubly free).
"""

import numpy as np
import pytest

from linprog_tpu import SimplexSolver

scipy_opt = pytest.importorskip("scipy.optimize")


def test_doubly_free_variable_split():
    # min x1 + 2 x2 s.t. x1 + x2 = 1, x2 >= 0, x1 free -> x1 unboundedly
    # negative? c1 > 0 pulls x1 down but x1 = 1 - x2 <= 1; with x2 >= 0,
    # minimize x1 + 2 x2 = (1 - x2) + 2 x2 = 1 + x2 -> x2 = 0, x1 = 1.
    res = SimplexSolver(
        c=np.array([1.0, 2.0]),
        A=np.array([[1.0, 1.0]]),
        b=np.array([1.0]),
        lb=np.array([-np.inf, 0.0]),
    ).solve()
    assert res.optimum
    assert np.allclose(res.x, [1.0, 0.0], atol=1e-4)
    assert res.cost == pytest.approx(1.0, abs=1e-4)


def test_free_variable_goes_negative():
    # min x1 s.t. x1 - x2 = -3, 0 <= x2 <= 1, x1 free -> x1 = x2 - 3 in
    # [-3, -2]; minimize x1 -> x2 = 0, x1 = -3.
    res = SimplexSolver(
        c=np.array([1.0, 0.0]),
        A=np.array([[1.0, -1.0]]),
        b=np.array([-3.0]),
        lb=np.array([-np.inf, 0.0]),
        ub=np.array([np.inf, 1.0]),
    ).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(-3.0, abs=1e-4)


def test_free_below_finite_above():
    # x1 in (-inf, 2]: min -x1 s.t. x1 + x2 <= 5 -> x1 = 2
    res = SimplexSolver(
        c=np.array([-1.0, 0.0]),
        G=np.array([[1.0, 1.0]]),
        h=np.array([5.0]),
        lb=np.array([-np.inf, 0.0]),
        ub=np.array([2.0, np.inf]),
    ).solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(2.0, abs=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_free_vars_match_highs(seed):
    rng = np.random.default_rng(seed)
    m, n = 6, 8
    G = rng.normal(size=(m, n))
    h = G @ rng.uniform(0, 1, n) + rng.uniform(0.5, 1.5, m)
    c = rng.normal(size=n)
    lb = np.zeros(n)
    ub = np.full(n, np.inf)
    # two free variables, one with a finite upper bound
    lb[0] = -np.inf
    lb[1] = -np.inf
    ub[1] = rng.uniform(0.5, 2.0)
    # keep it bounded: box everything else
    ub[2:] = rng.uniform(1.0, 3.0, n - 2)
    ub[0] = rng.uniform(1.0, 3.0)
    lb[0] = -rng.uniform(1.0, 3.0)  # actually finite -- flip var 0 back
    lb[0] = -np.inf if seed % 2 == 0 else lb[0]

    bounds = [
        (None if np.isneginf(lb[j]) else lb[j],
         None if np.isposinf(ub[j]) else ub[j])
        for j in range(n)
    ]
    from linprog_tpu import PrimalIsUnboundedError

    ref = scipy_opt.linprog(c, A_ub=G, b_ub=h, bounds=bounds, method="highs")
    try:
        res = SimplexSolver(c, G=G, h=h, lb=lb, ub=ub).solve(
            maxiters1=300, maxiters2=300
        )
    except PrimalIsUnboundedError:
        assert ref.status == 3
        return
    if ref.status == 0:
        assert res.optimum
        assert res.cost == pytest.approx(ref.fun, abs=2e-3)
        np.testing.assert_allclose(res.x, ref.x, atol=5e-3)
    elif ref.status == 3:
        assert not res.optimum
