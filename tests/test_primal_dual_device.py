"""Fully on-device batched primal-dual algorithm: parity with the host
implementation and the textbook ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from linprog_tpu import forms
from linprog_tpu import status as st
from linprog_tpu.primal_dual import solve_primal_dual_batch
from tests.problems import PRIMAL_DUAL_PROBLEMS


def test_batched_device_primal_dual_textbook():
    # pad the three textbook primal-dual problems into one device batch
    m_pad = max(p.A.shape[0] for p in PRIMAL_DUAL_PROBLEMS)
    n_pad = max(p.A.shape[1] for p in PRIMAL_DUAL_PROBLEMS) + m_pad
    cs, As, bs = [], [], []
    for p in PRIMAL_DUAL_PROBLEMS:
        c0, A0, b0 = forms.preprocess_problem(p.c, p.A, p.b)
        c1, A1, b1, _, _ = forms.pad_problem(c0, A0, b0, m_pad, n_pad)
        cs.append(c1)
        As.append(A1)
        bs.append(b1)
    x, cost, iters, status, y = solve_primal_dual_batch(
        jnp.asarray(np.stack(cs)),
        jnp.asarray(np.stack(As)),
        jnp.asarray(np.stack(bs)),
        100, 100,
    )
    status = np.asarray(status)
    assert (status == st.OPTIMAL).all(), status
    for i, p in enumerate(PRIMAL_DUAL_PROBLEMS):
        n_i = p.c.shape[0]
        np.testing.assert_allclose(
            np.asarray(x)[i, :n_i], p.optimal_bfs, atol=1e-3
        )
        expected = float(p.c @ p.optimal_bfs)
        assert float(cost[i]) == pytest.approx(expected, abs=1e-3)


def test_device_primal_dual_detects_infeasible():
    # -x1 - x2 = 1 with x >= 0 infeasible (after sign-fix: x1 + x2 = -1 form)
    c = np.array([[1.0, 1.0]], np.float32)
    A = np.array([[[-1.0, -1.0]]], np.float32)
    b = np.array([[1.0]], np.float32)
    x, cost, iters, status, y = solve_primal_dual_batch(
        jnp.asarray(c), jnp.asarray(A), jnp.asarray(b), 50, 50
    )
    assert int(np.asarray(status)[0]) == st.DUAL_UNBOUNDED
