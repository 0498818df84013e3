"""Ruiz equilibration: scaling invariants + pipeline integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import SolverConfig
from linprog_tpu import status as st
from linprog_tpu.batch import solve_batch_two_phase
from linprog_tpu.generators import random_inequality_lps, to_standard_form_batch
from linprog_tpu.presolve import ruiz_equilibrate, unscale_solution


def test_equilibration_normalizes_norms():
    rng = np.random.default_rng(0)
    # badly scaled: rows/cols spanning 6 orders of magnitude
    A = rng.normal(size=(8, 12))
    A *= 10.0 ** rng.uniform(-3, 3, size=(8, 1))
    A *= 10.0 ** rng.uniform(-3, 3, size=(1, 12))
    c = rng.normal(size=12)
    b = rng.normal(size=8)
    c_s, A_s, b_s, sc = ruiz_equilibrate(c, A, b, iters=10)
    row_norms = np.max(np.abs(np.asarray(A_s)), axis=1)
    col_norms = np.max(np.abs(np.asarray(A_s)), axis=0)
    assert np.allclose(row_norms, 1.0, atol=0.1)
    assert np.allclose(col_norms, 1.0, atol=0.1)
    # scaling is exactly diag(r) A diag(s)
    recon = np.asarray(sc.row)[:, None] * np.asarray(A) * np.asarray(sc.col)
    np.testing.assert_allclose(np.asarray(A_s), recon, rtol=1e-5)


def test_scaled_pipeline_matches_unscaled_on_well_scaled_input():
    B, m, n = 8, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=4)
    cs, As, bs = to_standard_form_batch(c, G, h)
    cs, As, bs = jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs)
    plain = solve_batch_two_phase(cs, As, bs, 300, 300,
                                  SolverConfig(pricing="dantzig"))
    scaled = solve_batch_two_phase(
        cs, As, bs, 300, 300, SolverConfig(pricing="dantzig", scaling=True)
    )
    assert (np.asarray(scaled.status) == st.OPTIMAL).all()
    np.testing.assert_allclose(
        np.asarray(scaled.cost), np.asarray(plain.cost), rtol=2e-4, atol=2e-4
    )
    # strong duality holds in the ORIGINAL scaling
    np.testing.assert_allclose(
        np.einsum("bm,bm->b", np.asarray(bs), np.asarray(scaled.y)),
        np.asarray(scaled.cost),
        atol=2e-3,
    )


def test_scaling_rescues_badly_scaled_instances():
    scipy_opt = pytest.importorskip("scipy.optimize")
    rng = np.random.default_rng(7)
    B, m, n = 4, 10, 14
    c, G, h = random_inequality_lps(B, m, n, seed=7, dtype=np.float64)
    # distort rows by factors up to 1e4 (keeps the same solution set)
    row_f = 10.0 ** rng.uniform(0, 4, size=(B, m))
    G2 = G * row_f[:, :, None]
    h2 = h * row_f
    cs, As, bs = to_standard_form_batch(
        c.astype(np.float32), G2.astype(np.float32), h2.astype(np.float32)
    )
    res = solve_batch_two_phase(
        jnp.asarray(cs), jnp.asarray(As), jnp.asarray(bs), 500, 500,
        SolverConfig(pricing="dantzig", scaling=True),
    )
    assert (np.asarray(res.status) == st.OPTIMAL).all()
    for i in range(B):
        ref = scipy_opt.linprog(
            c[i], A_ub=G[i], b_ub=h[i], bounds=(0, None), method="highs"
        )
        assert ref.status == 0
        gap = abs(float(res.cost[i]) - ref.fun) / max(1.0, abs(ref.fun))
        assert gap < 5e-3, (i, gap)
