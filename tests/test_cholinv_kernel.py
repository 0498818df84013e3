"""Pallas panel Cholesky-inverse kernel (ops/cholinv_kernel.py).

Interpret-mode numerics vs the NumPy reference factor inverse, the
NaN-on-non-SPD contract, and parity of the block recursion with and
without the kernel base case.
"""

import jax.numpy as jnp
import numpy as np

from linprog_tpu.ipm import block_cholesky_inverse
from linprog_tpu.ops.cholinv_kernel import panel_cholinv


def _spd(B, mb, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(B, mb, mb)).astype(np.float32)
    return X @ np.swapaxes(X, 1, 2) + mb * np.eye(mb, dtype=np.float32)


def test_panel_cholinv_matches_numpy():
    for mb in (8, 16, 32):
        M = _spd(32, mb, seed=mb)
        W = np.asarray(panel_cholinv(jnp.asarray(M), interpret=True))
        L = np.linalg.cholesky(M)
        Wref = np.stack([np.linalg.inv(L[i]) for i in range(M.shape[0])])
        assert np.abs(W - Wref).max() / np.abs(Wref).max() < 1e-5
        # the functional contract the IPM uses: W' W == M^{-1}
        Minv = np.linalg.inv(M.astype(np.float64))
        WtW = np.einsum("bji,bjk->bik", W, W)
        assert np.abs(WtW - Minv).max() / np.abs(Minv).max() < 1e-5


def test_panel_cholinv_non_spd_is_nonfinite():
    M = _spd(4, 16)
    M[1] = -M[1]  # negative definite lane
    W = np.asarray(panel_cholinv(jnp.asarray(M), interpret=True))
    assert np.isfinite(W[0]).all()
    assert not np.isfinite(W[1]).all()  # rsqrt(<0) -> nan, like cholesky


def test_block_recursion_kernel_base_matches_lax_base():
    M = _spd(8, 128, seed=3)
    W_lax = np.asarray(block_cholesky_inverse(jnp.asarray(M)))
    W_ker = np.asarray(
        block_cholesky_inverse(jnp.asarray(M), use_panel_kernel=True)
    )
    # same algorithm, different base-case arithmetic order: f32-close
    Minv = np.linalg.inv(M.astype(np.float64))
    for W in (W_lax, W_ker):
        WtW = np.einsum("bji,bjk->bik", W, W)
        assert np.abs(WtW - Minv).max() / np.abs(Minv).max() < 1e-4
