"""Dual variables in results + singular-basis guards."""

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import PrimalRevisedSimplexSolver
from linprog_tpu import status as st
from linprog_tpu.batch import solve_batch_two_phase
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from tests.problems import PRIMAL_PROBLEMS


def test_single_solve_exposes_duals():
    p = PRIMAL_PROBLEMS[1]
    res = PrimalRevisedSimplexSolver(
        p.c, p.A, p.b, p.starting_basis
    ).solve()
    assert res.optimum
    # strong duality: b'y == c'x at the optimum
    assert float(p.b @ res.y) == pytest.approx(res.cost, abs=1e-4)
    # dual feasibility: y'A <= c
    assert (res.y @ p.A <= p.c + 1e-4).all()


def test_batched_solve_exposes_duals():
    scipy_opt = pytest.importorskip("scipy.optimize")
    B, m, n = 6, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=8)
    cs, As, bs = to_standard_form_batch(c, G, h)
    res = solve_batch_two_phase(
        jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs), 300, 300
    )
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    y = np.asarray(res.y)
    # strong duality per lane
    np.testing.assert_allclose(
        np.einsum("bm,bm->b", bs, y), np.asarray(res.cost), atol=1e-3
    )
    # compare against HiGHS inequality duals (sign convention: HiGHS
    # marginals for A_ub are <= 0; our y for [G|I] rows relate by y = -mu)
    ref = scipy_opt.linprog(
        c[0], A_ub=G[0], b_ub=h[0], bounds=(0, None), method="highs"
    )
    if ref.status == 0 and hasattr(ref, "ineqlin"):
        # rows that were not sign-flipped in standard form conversion
        flip = np.where(h[0] < 0, -1.0, 1.0)
        ours = y[0] * flip
        np.testing.assert_allclose(
            ours, ref.ineqlin.marginals, atol=1e-3
        )


def test_singular_basis_raises():
    c = np.array([1.0, 1.0, 0.0])
    A = np.array([[1.0, 1.0, 2.0], [2.0, 2.0, 4.0]])  # rank 1
    b = np.array([1.0, 2.0])
    with pytest.raises(ValueError, match="singular"):
        PrimalRevisedSimplexSolver(c, A, b, basis=np.array([0, 1]))


def test_batched_singular_lane_freezes_not_poisons():
    import jax

    from linprog_tpu import engine
    from linprog_tpu.batch import solve_batch_from_basis

    p = PRIMAL_PROBLEMS[0]
    c = jnp.tile(jnp.asarray(p.c, jnp.float32), (2, 1))
    A = np.tile(p.A.astype(np.float32), (2, 1, 1))
    A[1, :, 1] = A[1, :, 0]  # lane 1: duplicate column -> singular basis
    b = jnp.tile(jnp.asarray(p.b, jnp.float32), (2, 1))
    basis = jnp.asarray(np.tile(p.starting_basis, (2, 1)), jnp.int32)
    res = solve_batch_from_basis(c, jnp.asarray(A), b, basis, 100)
    status = np.asarray(res.status)
    assert status[0] == st.OPTIMAL  # healthy lane unaffected
    assert status[1] == st.NUMERICAL_ERROR


def test_general_api_duals_match_highs_marginals():
    """SimplexSolver duals come back in the USER's row space (eq rows then
    ineq rows, sign-fix undone) and match HiGHS marginals."""
    scipy_opt = pytest.importorskip("scipy.optimize")

    rng = np.random.default_rng(13)
    n, mA, mG = 8, 2, 5
    G = rng.standard_normal((mG, n))
    A = rng.standard_normal((mA, n))
    x0 = rng.random(n)
    b = A @ x0
    b[0] = -b[0]  # force a sign-flip row
    A[0] = -A[0]
    h = G @ x0 + rng.random(mG)
    c = 0.2 + rng.random(n) - G.T @ rng.random(mG)

    from linprog_tpu import SimplexSolver

    res = SimplexSolver(c, A=A, b=b, G=G, h=h).solve(400, 400)
    assert res.optimum
    ref = scipy_opt.linprog(c, A_eq=A, b_eq=b, A_ub=G, b_ub=h,
                            bounds=(0, None), method="highs")
    assert ref.status == 0
    assert res.y.shape == (mA + mG,)
    np.testing.assert_allclose(res.y[:mA], ref.eqlin.marginals,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(res.y[mA:], ref.ineqlin.marginals,
                               rtol=1e-4, atol=1e-4)
