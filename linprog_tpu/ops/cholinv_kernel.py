"""Pallas panel kernel: batched inverse Cholesky factor of small SPD blocks.

The base case of :func:`linprog_tpu.ipm.block_cholesky_inverse` is the one
place the IPM's all-matmul factorization still touches XLA's sequential
linalg: at ``[256, 32, 32]`` f32, ``jnp.linalg.cholesky`` costs 1.17 ms and
the trsm-vs-I 0.33 ms PER PANEL on v5e -- pure dispatch/latency floor (the
real arithmetic is ~3 us), and the m/32 panels are data-dependent so the
chain serializes: ~12 ms of the measured ~9.7 ms/Newton-iteration budget.

This kernel fuses the panel Cholesky and the forward substitution into one
unrolled elimination pass per batch -- for ``W = L^{-1}`` observe that
applying the elementary elimination step of column ``k`` to the identity
accumulates exactly ``L^{-1}``:

    for k in 0..mb-1:
        d   = rsqrt(A[k, k])
        col = A[k, :] * d          (row slice: A stays symmetric under the
                                    symmetric rank-1 downdate)
        A  -= col (x) col          (Schur downdate, masked to lanes >= k)
        R[k, :] *= d               (R starts at I)
        R  -= col_{>k} (x) R[k, :]

Everything is row-oriented ([B, mb] slices with ``mb`` on lanes -- the
measured-fast orientation on this chip), fully unrolled (mb static), and
vectorized over the batch on the leading dim.  Non-SPD input produces
NaN/inf via ``rsqrt`` and flows to the caller's finite guards, matching
``jnp.linalg.cholesky`` semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _cholinv_kernel(m_ref, w_ref, *, mb: int):
    A0 = m_ref[:]  # [Bt, mb, mb]
    B = A0.shape[0]
    dt = A0.dtype
    lane = lax.broadcasted_iota(jnp.int32, (1, mb), 1)  # [1, mb]
    sub = lax.broadcasted_iota(jnp.int32, (1, mb, 1), 1)  # [1, mb, 1]
    # R starts at I (built from iotas: no module-level jnp constants)
    row_i = lax.broadcasted_iota(jnp.int32, (mb, mb), 0)
    col_i = lax.broadcasted_iota(jnp.int32, (mb, mb), 1)
    R0 = jnp.broadcast_to(
        jnp.where(row_i == col_i, 1.0, 0.0).astype(dt), (B, mb, mb)
    )

    # fori_loop (NOT a python unroll: 32 unrolled [B, mb, mb] live steps
    # measured 140 MB of register spill); rows are extracted by masked
    # sublane reduction so no scatter/dynamic-slice primitives are needed
    def body(k, carry):
        A, R = carry
        rowA = jnp.sum(jnp.where(sub == k, A, 0.0), axis=1)  # [B, mb]
        dkk = jnp.sum(jnp.where(lane == k, rowA, 0.0), axis=-1,
                      keepdims=True)  # [B, 1]
        d = lax.rsqrt(dkk)
        col = jnp.where(lane >= k, rowA * d, 0.0)  # includes sqrt diag
        A = A - col[:, :, None] * col[:, None, :]
        rowR = jnp.sum(jnp.where(sub == k, R, 0.0), axis=1) * d  # [B, mb]
        R = jnp.where(sub == k, rowR[:, None, :], R)
        colb = jnp.where(lane > k, col, 0.0)  # strictly below diagonal
        R = R - colb[:, :, None] * rowR[:, None, :]
        return A, R

    _, R = lax.fori_loop(0, mb, body, (A0, R0))
    w_ref[:] = R


@functools.partial(jax.jit, static_argnames=("interpret",))
def panel_cholinv(M, interpret: bool | None = None):
    """``W = L^{-1}`` with ``M = L L'`` for batched small SPD ``M[B, mb, mb]``.

    One grid step, whole batch resident in VMEM (``mb <= 64``; 4 KB/lane at
    mb=32).  f32 only (TPU kernel); other dtypes and non-TPU backends should
    use the ``lax`` base case in ``block_cholesky_inverse``.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, mb, mb2 = M.shape
    assert mb == mb2 and mb <= 64, (B, mb, mb2)
    bt = min(B, 128)
    if B % bt:
        bt = B  # non-divisible batch: single block (small B anyway)
    return pl.pallas_call(
        functools.partial(_cholinv_kernel, mb=mb),
        out_shape=jax.ShapeDtypeStruct((B, mb, mb), M.dtype),
        grid=(B // bt,),
        in_specs=[pl.BlockSpec((bt, mb, mb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bt, mb, mb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(M)
