"""Bounded-variable simplex (mirrors reference
``tests/test_simplex_with_bounded_variables.py`` -- Bazaraa ex. 5.6)."""

import numpy as np
import pytest

from linprog_tpu import BoundedVariablePrimalSimplexSolver, PrimalIsUnboundedError


def _bazaraa_ex_5_6():
    c = np.array([-2.0, -4.0, -1.0, 0.0, 0.0])
    b = np.array([10.0, 4.0])
    A = np.array([[2.0, 1.0, 1.0, 1.0, 0.0], [1.0, 1.0, -1.0, -0.0, 1.0]])
    lb = np.array([0.0, 0.0, 1.0, 0.0, 0.0])
    ub = np.array([4.0, 6.0, 4.0, np.inf, np.inf])
    return c, A, b, lb, ub


def test_bazaraa_ex_5_6():
    c, A, b, lb, ub = _bazaraa_ex_5_6()
    solver = BoundedVariablePrimalSimplexSolver(
        c, A, b, lb, ub,
        basis=np.array([3, 4]),
        lb_nonbasic_vars=np.array([0, 1, 2]),
        ub_nonbasic_vars=np.array([]),
    )
    res = solver.solve()
    assert res.optimum
    assert np.allclose(res.x, [2 / 3, 6.0, 8 / 3, 0.0, 0.0], atol=1e-4)


def test_resume_after_iter_limit():
    c, A, b, lb, ub = _bazaraa_ex_5_6()
    solver = BoundedVariablePrimalSimplexSolver(
        c, A, b, lb, ub,
        basis=np.array([3, 4]),
        lb_nonbasic_vars=np.array([0, 1, 2]),
        ub_nonbasic_vars=np.array([]),
    )
    res = solver.solve(maxiters=1)
    assert not res.optimum
    res = solver.solve(maxiters=100)
    assert res.optimum
    assert np.allclose(res.x, [2 / 3, 6.0, 8 / 3, 0.0, 0.0], atol=1e-4)


def test_infinite_bounds_clamped_to_M_box():
    # min -x1 s.t. x1 - x2 = 1, both unbounded above.  The wrapper clamps
    # +/-inf bounds to the BFS magnitude bound M (= 1 here, Lemma 2.1), so
    # the solve lands on the M box: x1 = M.  The reference clamps the same
    # way (special_solvers.py:139-142).
    c = np.array([-1.0, 0.0])
    A = np.array([[1.0, -1.0]])
    b = np.array([1.0])
    lb = np.array([0.0, 0.0])
    ub = np.array([np.inf, np.inf])
    solver = BoundedVariablePrimalSimplexSolver(
        c, A, b, lb, ub,
        basis=np.array([0]),
        lb_nonbasic_vars=np.array([1]),
        ub_nonbasic_vars=np.array([]),
    )
    res = solver.solve(maxiters=100)
    assert res.optimum
    assert res.x[0] == pytest.approx(1.0, abs=1e-5)


def test_engine_level_unbounded_status():
    # drive the bounded engine directly with truly infinite bounds: no
    # finite step of any kind exists -> PRIMAL_UNBOUNDED status.
    import jax.numpy as jnp

    from linprog_tpu import DEFAULT_CONFIG
    from linprog_tpu import bounded as bnd
    from linprog_tpu import status as st

    c = jnp.array([-1.0, 0.0])
    A = jnp.array([[1.0, -1.0]])
    b = jnp.array([1.0])
    lb = jnp.array([0.0, 0.0])
    ub = jnp.array([jnp.inf, jnp.inf])
    var_state = np.array([2, 0], dtype=np.int8)  # x0 basic, x1 at lb
    state = bnd.make_bounded_state(A, b, lb, ub, np.array([0]), var_state)
    state = bnd.run_bounded_jit(c, A, b, lb, ub, state, 50, DEFAULT_CONFIG)
    assert int(state.status) == st.PRIMAL_UNBOUNDED


def test_bound_flip_path():
    # min -x1 s.t. x1 + x2 = 5, 0 <= x1 <= 2: entering x1 flips lb -> ub
    c = np.array([-1.0, 0.0])
    A = np.array([[1.0, 1.0]])
    b = np.array([5.0])
    lb = np.array([0.0, 0.0])
    ub = np.array([2.0, np.inf])
    solver = BoundedVariablePrimalSimplexSolver(
        c, A, b, lb, ub,
        basis=np.array([1]),
        lb_nonbasic_vars=np.array([0]),
        ub_nonbasic_vars=np.array([]),
    )
    res = solver.solve()
    assert res.optimum
    assert res.x[0] == pytest.approx(2.0, abs=1e-5)
    assert res.x[1] == pytest.approx(3.0, abs=1e-5)
