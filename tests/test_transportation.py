"""Structured transportation LPs: degenerate, rank-deficient instances."""

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig
from linprog_tpu import status as st
from linprog_tpu.batch import solve_batch_two_phase
from linprog_tpu.generators import transportation_lps

scipy_opt = pytest.importorskip("scipy.optimize")


@pytest.mark.parametrize("pricing", ["dantzig", "bland"])
def test_transportation_batch_matches_highs(pricing):
    B, ns, nd = 6, 5, 7
    c, A, b = transportation_lps(B, ns, nd, seed=1)
    cfg = SolverConfig(pricing=pricing, refactor_every=32)
    res = solve_batch_two_phase(
        jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), 800, 800, cfg
    )
    status = np.asarray(res.status)
    assert (status == st.OPTIMAL).all(), status
    for i in range(B):
        ref = scipy_opt.linprog(
            c[i], A_eq=A[i], b_eq=b[i], bounds=(0, None), method="highs"
        )
        assert ref.status == 0
        assert abs(float(res.cost[i]) - ref.fun) / max(1, abs(ref.fun)) < 1e-4


def test_transportation_single_via_general_api():
    from linprog_tpu import SimplexSolver

    c, A, b = transportation_lps(1, 4, 5, seed=3)
    res = SimplexSolver(c[0], A=A[0], b=b[0]).solve(maxiters1=300, maxiters2=300)
    assert res.optimum
    ref = scipy_opt.linprog(
        c[0], A_eq=A[0], b_eq=b[0], bounds=(0, None), method="highs"
    )
    assert res.cost == pytest.approx(ref.fun, rel=1e-4)
