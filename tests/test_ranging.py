"""Sensitivity ranging: verified against brute-force re-solves (HiGHS).

Inside the reported interval the optimal VERTEX is unchanged (so the
re-solved optimum equals the linear prediction from the current x / y);
just outside a finite endpoint the basis changes and the re-solved
optimum beats the prediction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig, engine
from linprog_tpu import status as st
from linprog_tpu.batch import solve_batch_two_phase
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from linprog_tpu.ranging import ranging, ranging_batch

scipy_opt = pytest.importorskip("scipy.optimize")


def _solve_standard(c, A, b):
    res = scipy_opt.linprog(
        c, A_eq=A, b_eq=b, bounds=(0, None), method="highs"
    )
    if res.status == 3:  # unbounded: objective is -inf (strictly better)
        return -np.inf
    assert res.status == 0, res.status
    return res.fun


def _setup(seed):
    c, G, h = random_inequality_lps(1, 6, 8, seed=seed, dtype=np.float64)
    cs, As, bs = to_standard_form_batch(c, G, h)
    res = solve_batch_two_phase(cs, As, bs, 200, 200)
    assert int(res.status[0]) == st.OPTIMAL
    state = engine.make_state(jnp.asarray(As[0]), jnp.asarray(bs[0]),
                              jnp.asarray(res.basis[0]))
    return (np.asarray(cs[0]), np.asarray(As[0]), np.asarray(bs[0]),
            np.asarray(res.x[0]), state)


def test_cost_ranging_against_resolves():
    c, A, b, x, state = _setup(seed=3)
    rng_res = ranging(jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), state)
    lo = np.asarray(rng_res.cost_lo)
    hi = np.asarray(rng_res.cost_hi)
    assert (lo <= c + 1e-7).all() and (c <= hi + 1e-7).all()
    checked = 0
    for j in range(len(c)):
        for endpoint, inside_sign in ((lo[j], +1.0), (hi[j], -1.0)):
            if not np.isfinite(endpoint) or abs(endpoint - c[j]) < 1e-6:
                continue
            span = abs(endpoint - c[j])
            # inside: optimum stays at the SAME vertex
            c_in = c.copy()
            c_in[j] = endpoint + inside_sign * 0.05 * span
            assert _solve_standard(c_in, A, b) == pytest.approx(
                float(c_in @ x), rel=1e-6, abs=1e-8
            ), j
            # outside: a different vertex is strictly better
            c_out = c.copy()
            c_out[j] = endpoint - inside_sign * 0.25 * span
            assert _solve_standard(c_out, A, b) < float(c_out @ x) + 1e-9, j
            checked += 1
    assert checked >= 3  # the instance must actually exercise endpoints


def test_rhs_ranging_against_resolves():
    c, A, b, x, state = _setup(seed=5)
    y = np.asarray(engine.duals(jnp.asarray(c), state))
    rr = ranging(jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), state)
    lo, hi = np.asarray(rr.rhs_lo), np.asarray(rr.rhs_hi)
    assert (lo <= b + 1e-7).all() and (b <= hi + 1e-7).all()
    checked = 0
    for i in range(len(b)):
        for endpoint, inside_sign in ((lo[i], +1.0), (hi[i], -1.0)):
            if not np.isfinite(endpoint) or abs(endpoint - b[i]) < 1e-6:
                continue
            span = abs(endpoint - b[i])
            b_in = b.copy()
            b_in[i] = endpoint + inside_sign * 0.05 * span
            # inside: optimum moves LINEARLY with the dual price y_i
            pred = float(c @ x) + y[i] * (b_in[i] - b[i])
            assert _solve_standard(c, A, b_in) == pytest.approx(
                pred, rel=1e-6, abs=1e-8
            ), i
            checked += 1
    assert checked >= 3


def test_ranging_batch_matches_single():
    c, G, h = random_inequality_lps(4, 6, 8, seed=9, dtype=np.float64)
    cs, As, bs = to_standard_form_batch(c, G, h)
    res = solve_batch_two_phase(cs, As, bs, 200, 200)
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    states = jax.vmap(engine.make_state)(
        jnp.asarray(As), jnp.asarray(bs), jnp.asarray(res.basis)
    )
    batch = ranging_batch(jnp.asarray(cs), jnp.asarray(As),
                          jnp.asarray(bs), states)
    for i in range(4):
        one = ranging(jnp.asarray(cs[i]), jnp.asarray(As[i]),
                      jnp.asarray(bs[i]), jax.tree.map(lambda t: t[i], states))
        for a, bfield in zip(batch, one):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(bfield),
                                       rtol=1e-6, atol=1e-6)


def test_solver_class_ranging_method():
    """The standard-form solver classes expose .ranging() directly."""
    from tests.problems import PRIMAL_PROBLEMS

    from linprog_tpu import PrimalRevisedSimplexSolver

    p = PRIMAL_PROBLEMS[0]
    s = PrimalRevisedSimplexSolver(p.c, p.A, p.b, p.starting_basis)
    res = s.solve(maxiters=100)
    assert res.optimum
    r = s.ranging()
    c = np.asarray(p.c, np.float64)
    lo, hi = np.asarray(r.cost_lo), np.asarray(r.cost_hi)
    assert (lo <= c + 1e-6).all() and (c <= hi + 1e-6).all()
