"""Pallas TPU kernels for the two hot ops of the batched simplex iteration.

Per pivot, the engine makes four passes over HBM-resident state:
``inv_B`` for pricing (y = c_B inv_B), ``A`` for reduced costs (r = c - yA),
``inv_B`` for the direction column (d = inv_B a_j), and ``inv_B``
read+write for the rank-1 eta update.  XLA emits each as a separate fusion;
these kernels collapse them into two grid-pipelined passes:

* :func:`price_entering` -- one streaming pass per lane-block over ``inv_B``
  and ``A``: pricing GEMV chain, column masking (as a +inf penalty), and the
  entering-column selection, all in VMEM; two scalars per lane leave the
  kernel.
* :func:`ratio_eta_pivot` -- one pass per lane-block over ``inv_B``:
  direction column, masked ratio test, leaving-row selection, and the
  in-place (input/output-aliased) rank-1 eta update, so ``inv_B`` is read
  once and written once per pivot instead of 3x.

TPU lowering notes (why the code looks the way it does):

* Mosaic requires the last two block dims to divide (8, 128) or equal the
  array dims.  Lane-vectors therefore travel as ``[B, 1, m]`` (middle dim 1
  equals the array dim), and each grid step processes ``LANES`` lanes with a
  statically unrolled inner loop.
* arg-reductions are written as min-reductions over ``iota`` (first-index
  tie-break, matching ``np.argmin`` semantics).
* booleans cross the kernel boundary as f32 penalties / i32 flags.

On non-TPU backends the kernels run in interpreter mode (CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# lanes per grid step: A-block (PRICE_LANES, m, n) must fit (double-buffered)
# in ~16MB VMEM -> 4 lanes at m=256, n=1024 is 4MB/buffer.
PRICE_LANES = 4
PIVOT_LANES = 8


def _interpret_default() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _first_index_where(mask, size):
    """Smallest index with mask True, else ``size`` (first-True semantics)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    return jnp.min(jnp.where(mask, iota, size))


# ---------------------------------------------------------------------------
# Kernel 1: pricing + entering-column selection
# ---------------------------------------------------------------------------


def _price_kernel(lanes: int, dantzig: bool, opt_tol: float,
                  cB_ref, invB_ref, A_ref, c_ref, penalty_ref,
                  enter_ref, elig_ref):
    n = A_ref.shape[-1]
    for l in range(lanes):
        y = jnp.dot(cB_ref[l], invB_ref[l], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        r = c_ref[l] - jnp.dot(y, A_ref[l], preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        r = r + penalty_ref[l]  # (1, n); +inf on masked columns
        if dantzig:
            best = jnp.min(r)
            enter = _first_index_where(r == best, n)
            eligible = best < -opt_tol
        else:  # bland: first negative reduced cost
            neg = r < -opt_tol
            enter = _first_index_where(neg, n)
            eligible = jnp.any(neg)
            enter = jnp.where(eligible, enter, 0)
        enter_ref[l, 0, 0] = enter.astype(jnp.int32)
        elig_ref[l, 0, 0] = jnp.where(eligible, 1, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("dantzig", "opt_tol", "interpret"))
def price_entering(cB, invB, A, c, penalty, *, dantzig: bool, opt_tol: float,
                   interpret: bool | None = None):
    """Entering column per lane: ``(enter[B] i32, eligible[B] i32)``.

    ``cB[B, m]``, ``invB[B, m, m]``, ``A[B, m, n]``, ``c[B, n]``,
    ``penalty[B, n]`` (+inf on columns that may not enter).
    """
    if interpret is None:
        interpret = _interpret_default()
    B, m, n = A.shape
    L = PRICE_LANES if B % PRICE_LANES == 0 else 1
    kernel = functools.partial(_price_kernel, L, dantzig, opt_tol)
    enter, elig = pl.pallas_call(
        kernel,
        grid=(B // L,),
        in_specs=[
            pl.BlockSpec((L, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, m, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(cB[:, None, :], invB, A, c[:, None, :], penalty[:, None, :])
    return enter[:, 0, 0], elig[:, 0, 0]


# ---------------------------------------------------------------------------
# Kernel 2: ratio test + in-place eta pivot
# ---------------------------------------------------------------------------


def _ratio_eta_kernel(lanes: int, pivot_tol: float,
                      invB_ref, bfs_ref, acol_ref, go_ref,
                      invB_out_ref, bfs_out_ref, leave_ref, unb_ref):
    m = invB_ref.shape[-1]
    for l in range(lanes):
        invB = invB_ref[l]  # (m, m)
        a = acol_ref[l]  # (1, m)
        bfs = bfs_ref[l]  # (1, m)
        # d as a row vector: d = (invB @ a^T)^T == a @ invB^T; keep the
        # matmul orientation (m,m)x(m,1) and transpose the small result.
        d = jnp.dot(invB, a.reshape(m, 1), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST).reshape(1, m)
        pos = d > pivot_tol
        any_pos = jnp.any(pos)
        theta = jnp.where(pos, bfs / jnp.where(pos, d, jnp.ones_like(d)), jnp.inf)
        best = jnp.min(theta)
        leave = _first_index_where(pos & (theta == best), m)
        leave = jnp.where(any_pos, leave, 0)

        go = go_ref[l, 0, 0] > 0
        do_pivot = go & any_pos
        d_l = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) == leave, d, 0.0))
        safe = jnp.where(d_l == 0, jnp.ones_like(d_l), d_l)
        u = -d / safe  # (1, m)
        at_leave = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) == leave
        u = jnp.where(at_leave, 1.0 / safe - 1.0, u)
        u = jnp.where(do_pivot, u, jnp.zeros_like(u))

        # dynamic row extraction must go through the ref (Mosaic has no
        # dynamic_slice on loaded values)
        row = invB_ref[l, pl.ds(leave, 1), :]  # (1, m)
        invB_out_ref[l] = invB + u.reshape(m, 1) * row
        bfs_l = jnp.sum(jnp.where(at_leave, bfs, 0.0))
        bfs_out_ref[l] = bfs + u * bfs_l
        leave_ref[l, 0, 0] = leave.astype(jnp.int32)
        unb_ref[l, 0, 0] = jnp.where(
            go & jnp.logical_not(any_pos), 1, 0
        ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("pivot_tol", "interpret"),
                   donate_argnums=(0, 1))
def ratio_eta_pivot(invB, bfs, acol, go, *, pivot_tol: float,
                    interpret: bool | None = None):
    """Ratio test + masked in-place eta pivot per lane.

    ``invB[B, m, m]``, ``bfs[B, m]``, ``acol[B, m]``, ``go[B, 1]`` (i32 0/1).
    Returns ``(invB', bfs', leave[B] i32, unbounded[B] i32)``; ``invB`` and
    ``bfs`` are aliased input->output (in-place HBM update).
    """
    if interpret is None:
        interpret = _interpret_default()
    B, m, _ = invB.shape
    L = PIVOT_LANES if B % PIVOT_LANES == 0 else 1
    kernel = functools.partial(_ratio_eta_kernel, L, pivot_tol)
    invB2, bfs2, leave, unb = pl.pallas_call(
        kernel,
        grid=(B // L,),
        in_specs=[
            pl.BlockSpec((L, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((L, m, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, m), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((L, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), invB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), bfs.dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(invB, bfs[:, None, :], acol[:, None, :], go[:, None, :])
    return invB2, bfs2[:, 0, :], leave[:, 0, 0], unb[:, 0, 0]
