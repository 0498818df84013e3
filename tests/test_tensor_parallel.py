"""Tensor-parallel (column-sharded) solve must match the single-device
engine exactly on an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import PrimalRevisedSimplexSolver, SolverConfig
from linprog_tpu import status as st
from linprog_tpu.parallel import make_model_mesh, tp_solve


def _random_standard_lp(rng, m, n):
    G = rng.normal(size=(m, n - m))
    # nonnegative rhs by construction -> the slack basis is feasible
    b = np.abs(G @ rng.uniform(0.5, 1.5, size=n - m)) + rng.uniform(
        0.5, 1.5, size=m
    )
    y0 = rng.uniform(0.0, 1.0, size=m)
    s = rng.uniform(0.1, 1.0, size=n - m)
    c = np.concatenate([s - G.T @ y0, np.zeros(m)])
    A = np.concatenate([G, np.eye(m)], axis=1)
    basis = np.arange(n - m, n)
    return (
        c.astype(np.float32),
        A.astype(np.float32),
        b.astype(np.float32),
        basis,
    )


@pytest.mark.parametrize("pricing", ["bland", "dantzig"])
def test_tp_matches_single_device(pricing):
    rng = np.random.default_rng(0)
    m, n = 8, 32  # n divisible by the 8-device mesh
    c, A, b, basis = _random_standard_lp(rng, m, n)
    assert (np.linalg.inv(A[:, basis]) @ b >= 0).all()

    cfg = SolverConfig(pricing=pricing)
    ref = PrimalRevisedSimplexSolver(c, A, b, basis, config=cfg).solve(
        maxiters=200
    )
    assert ref.optimum

    mesh = make_model_mesh()
    state = tp_solve(
        jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), basis, 200, mesh, cfg
    )
    assert int(state.status) == st.OPTIMAL
    assert np.array_equal(np.asarray(state.basis), ref.basis)
    np.testing.assert_allclose(
        np.asarray(state.bfs),
        ref.x[ref.basis],
        atol=1e-4,
    )


def test_tp_rejects_indivisible_width():
    mesh = make_model_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        tp_solve(
            jnp.zeros(10), jnp.zeros((2, 10)), jnp.zeros(2),
            np.array([0, 1]), 10, mesh,
        )
