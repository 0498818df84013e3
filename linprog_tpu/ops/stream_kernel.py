"""Streaming simplex mega-kernel: VMEM-resident factors, HBM-resident A.

The whole-segment kernel in :mod:`solve_kernel` keeps one lane's ENTIRE
working set (A, inv_B^T, vectors) in VMEM blocks managed by Mosaic's grid
pipeline.  Mosaic double-buffers every grid input and allocates separate
aliased output buffers, so the scoped allocation runs ~4x the naive operand
estimate (measured 27.2 MB at m=512 vs the 16 MB hard limit) -- the kernel
dies past m ~= 384-512 and the driver used to fall back to the ~5x-slower
per-op XLA path.

This kernel restructures the memory choreography for m in (~384, ~1152]:

* ``inv_B^T`` and ``A`` stay in **HBM** (``memory_space=ANY``) and are moved
  by explicit DMA into **scratch** buffers, which Mosaic does NOT
  double-buffer: one copy each, allocated once per lane.
* ``inv_B^T`` is DMA'd in at segment start, updated in place in VMEM for up
  to ``seg_len`` complete simplex iterations, and DMA'd back at segment end.
* ``A``:
    - *resident* mode (``a_resident=True``, m <= ~768): one DMA of the whole
      lane slab at segment start.  Per-iteration HBM traffic: zero.
    - *streaming* mode (m up to ~1152): A no longer fits, so each pricing
      pass streams A in ``(m, n_blk)`` column blocks with double-buffered
      DMA overlapped with the pricing matmul, writing reduced costs into a
      full-length VMEM row.  The entering column is fetched as ONE
      contiguous DMA of row ``enter`` of ``A^T`` (kept in HBM; a strided
      column DMA of A would issue m 4-byte descriptors).
      Per-iteration HBM traffic: m*n*4 B (pricing) + m*4 B (column) --
      ~2.5x less than the XLA path, which also re-reads ``inv_B`` (3 passes)
      and ``A`` from HBM every pivot and pays per-op launch overheads.
* small state rows (bfs, c_B, basis, penalty) remain ordinary VMEM grid
  blocks -- a few KB each, double-buffering is irrelevant.

Iteration math (pricing -> selection -> ratio test -> rank-1 eta update ->
bookkeeping) is identical to :mod:`solve_kernel`; see its docstring for the
row-layout and HIGHEST-precision rules (both learned on v5e hardware).
Capability parity: revised simplex at sizes the reference handles in NumPy
(`/root/reference/linprog/primal_solvers.py:212-263`) without the VMEM
cliff.  Devex pricing is not offered here (its weight update needs a second
full pass over A per pivot); ``pricing`` covers bland/dantzig.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import status as st

_HIGHEST = jax.lax.Precision.HIGHEST


def _interpret_default():
    if jax.default_backend() in ("tpu", "axon"):
        return False
    # CPU/testing: the TPU interpreter understands DMAs + semaphores
    return pltpu.InterpretParams()


def _dotg(a, b, a_dim, b_dim):
    """2D dot_general contracting ``a_dim`` of a with ``b_dim`` of b."""
    return lax.dot_general(
        a, b, (((a_dim,), (b_dim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _stream_kernel(seg_len: int, pricing: int, opt_tol: float,
                   pivot_tol: float, dual: bool, feas_tol: float,
                   a_resident: bool, n_blk: int, stall_limit: int,
                   # inputs
                   A_hbm, AT_hbm, c_ref, apen_ref, maxiters_ref,
                   iters_in_ref, status_in_ref, invBT_hbm,
                   bfs_in_ref, cB_in_ref, basis_in_ref, pen_in_ref,
                   # outputs (invBT_out aliased to invBT_hbm, etc.)
                   invBT_out, bfs_ref, cB_ref, basis_ref, pen_ref,
                   iters_out_ref, status_out_ref,
                   # scratch
                   invbt_buf, a_buf, arow_buf, r_buf, u_buf, sem):
    i = pl.program_id(0)
    dantzig = pricing >= 1
    m = invbt_buf.shape[0]
    n = r_buf.shape[1]
    lane_n = lax.broadcasted_iota(jnp.int32, (1, n), 1)
    lane_m = lax.broadcasted_iota(jnp.int32, (1, m), 1)
    subl_m = lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    # ---- stage state into scratch ---------------------------------------
    pltpu.make_async_copy(invBT_hbm.at[i], invbt_buf, sem.at[0]).start()
    if a_resident:
        pltpu.make_async_copy(A_hbm.at[i], a_buf, sem.at[1]).start()
        pltpu.make_async_copy(A_hbm.at[i], a_buf, sem.at[1]).wait()
    pltpu.make_async_copy(invBT_hbm.at[i], invbt_buf, sem.at[0]).wait()

    # small state rows: self-copy initializes the aliased outputs
    bfs_ref[0] = bfs_in_ref[0]
    cB_ref[0] = cB_in_ref[0]
    basis_ref[0] = basis_in_ref[0]
    pen_ref[0] = pen_in_ref[0]

    maxiters = maxiters_ref[0, 0, 0]
    nb = 0 if a_resident else n // n_blk

    def _price_rows(rows):
        """rows [k, m] @ A -> [k, n], streamed over HBM column blocks.

        Double-buffered: block j+1's DMA is in flight while block j
        multiplies.  Results land in full-length VMEM rows (r_buf/u_buf).
        """
        k = rows.shape[0]

        def a_dma(slot, j):
            return pltpu.make_async_copy(
                A_hbm.at[i, :, pl.ds(j * n_blk, n_blk)],
                a_buf.at[slot], sem.at[1 + slot],
            )

        a_dma(0, 0).start()

        def blk(j, _):
            slot = lax.rem(j, 2)
            nxt = lax.rem(j + 1, 2)

            @pl.when(j + 1 < nb)
            def _():
                a_dma(nxt, j + 1).start()

            a_dma(slot, j).wait()
            prod = _dotg(rows, a_buf[slot], 1, 0)  # (k, n_blk)
            r_buf[0, pl.ds(j * n_blk, n_blk)] = prod[0]
            if k > 1:
                u_buf[0, pl.ds(j * n_blk, n_blk)] = prod[1]
            return 0

        lax.fori_loop(0, nb, blk, 0, unroll=False)

    # stall escalation active only for the fast rules (bland is cycle-free)
    track_stall = stall_limit > 0 and pricing >= 1

    def cond(carry):
        seg, iters, status = carry[0], carry[1], carry[2]
        return (status == st.RUNNING) & (seg < seg_len) & (iters < maxiters)

    def body(carry):
        seg, iters, status, z_prev, stall, bland = carry
        invBT = invbt_buf[...]  # (m, m)
        bfs = bfs_ref[0]  # (1, m)
        cB = cB_ref[0]
        basis = basis_ref[0]
        pen = pen_ref[0]  # (1, n)

        # stalled-lane detection (see solve_kernel): no objective progress
        # over `stall_limit` pivots -> Bland's rule until progress resumes
        if track_stall:
            z = jnp.sum(cB * bfs)
            progressed = jnp.abs(z - z_prev) > 1e-6 * (jnp.abs(z) + 1.0)
            stall = jnp.where(progressed, 0, stall + 1)
            bland = jnp.where(
                progressed, 0, jnp.where(stall >= stall_limit, 1, bland)
            )
            use_bland = bland != 0
        else:
            z = z_prev
            use_bland = jnp.zeros((), jnp.bool_)

        if dual:
            # ---- dual: leaving row first, then entering column ----------
            neg = bfs < -feas_tol
            viable = jnp.any(neg)
            if dantzig:
                worst = jnp.min(bfs)
                leave = jnp.min(jnp.where(bfs == worst, lane_m, m))
                if track_stall:  # stalled: first infeasible row (Bland)
                    leave_b = jnp.min(jnp.where(neg, lane_m, m))
                    leave = jnp.where(use_bland, leave_b, leave)
            else:
                leave = jnp.min(jnp.where(neg, lane_m, m))
            leave = jnp.where(viable, leave, 0)
            # w = inv_B[leave, :] built ROW-oriented (a (m,1)->(1,m) reshape
            # would be a Mosaic transpose): contract e_leave with invBT dim 1
            onehot_lrow = jnp.where(lane_m == leave, 1.0, 0.0)  # (1, m)
            w = _dotg(onehot_lrow, invBT, 1, 1)  # (1, m)
            y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if a_resident:
                A = a_buf[...]
                urow = _dotg(w, A, 1, 0)
                r = c_ref[0] - _dotg(y, A, 1, 0)
            else:
                _price_rows(jnp.concatenate([y, w], axis=0))
                r = c_ref[0] - r_buf[...]
                urow = u_buf[...]
            cand = (urow < -pivot_tol) & (pen == 0.0)
            any_cand = jnp.any(cand)
            theta_d = jnp.where(
                cand, -r / jnp.where(cand, urow, -jnp.ones_like(urow)),
                jnp.inf,
            )
            best_d = jnp.min(theta_d)
            enter = jnp.min(jnp.where(cand & (theta_d == best_d), lane_n, n))
            enter = jnp.where(any_cand, enter, 0)
            do_pivot = viable & any_cand
            stop_status = jnp.where(
                jnp.logical_not(viable),
                st.OPTIMAL,
                jnp.where(viable & jnp.logical_not(any_cand),
                          st.DUAL_UNBOUNDED, st.RUNNING),
            )
        else:
            # ---- primal: pricing, then entering selection ---------------
            y = _dotg(cB, invBT, 1, 1)  # (1, m)
            if a_resident:
                r = c_ref[0] - _dotg(y, a_buf[...], 1, 0) + pen
            else:
                _price_rows(y)
                r = c_ref[0] - r_buf[...] + pen
            negr = r < -opt_tol
            if dantzig:
                best = jnp.min(r)
                enter = jnp.min(jnp.where(r == best, lane_n, n))
                eligible = best < -opt_tol
                if track_stall:  # stalled: first eligible column (Bland)
                    enter_b = jnp.min(jnp.where(negr, lane_n, n))
                    enter = jnp.where(use_bland, enter_b, enter)
            else:
                enter = jnp.min(jnp.where(negr, lane_n, n))
                eligible = jnp.any(negr)
            enter = jnp.where(eligible, enter, 0)

        # ---- entering column (both modes) -------------------------------
        if a_resident:
            onehot_n = jnp.where(lane_n == enter, 1.0, 0.0)
            a_row = _dotg(onehot_n, a_buf[...], 1, 1)  # (1, m) = A[:,enter]^T
        else:
            # one contiguous DMA: row `enter` of A^T
            pltpu.make_async_copy(
                AT_hbm.at[i, pl.ds(enter, 1), :], arow_buf, sem.at[3]
            ).start()
            pltpu.make_async_copy(
                AT_hbm.at[i, pl.ds(enter, 1), :], arow_buf, sem.at[3]
            ).wait()
            a_row = arow_buf[...]
        d = _dotg(a_row, invBT, 1, 0)  # (1, m) = (inv_B a)^T

        if not dual:
            pos = d > pivot_tol
            any_pos = jnp.any(pos)
            # bfs clamped at 0 (refactorization noise; see engine.primal_step)
            bfs_nn = jnp.maximum(bfs_ref[0], 0.0)
            theta = jnp.where(
                pos, bfs_nn / jnp.where(pos, d, jnp.ones_like(d)),
                jnp.inf,
            )
            best_t = jnp.min(theta)
            leave = jnp.min(jnp.where(pos & (theta == best_t), lane_m, m))
            leave = jnp.where(any_pos, leave, 0)
            do_pivot = eligible & any_pos
            stop_status = jnp.where(
                jnp.logical_not(eligible),
                st.OPTIMAL,
                jnp.where(eligible & jnp.logical_not(any_pos),
                          st.PRIMAL_UNBOUNDED, st.RUNNING),
            )

        at_leave = lane_m == leave  # (1, m)
        d_l = jnp.sum(jnp.where(at_leave, d, 0.0))
        safe = jnp.where(d_l == 0, jnp.ones_like(d_l), d_l)
        u = -d / safe
        u = jnp.where(at_leave, 1.0 / safe - 1.0, u)
        u = jnp.where(do_pivot, u, jnp.zeros_like(u))  # (1, m)

        # ---- rank-1 eta update of inv_B^T (in VMEM scratch) -------------
        onehot_l = jnp.where(subl_m == leave, 1.0, 0.0)  # (m, 1)
        col_l = _dotg(invBT, onehot_l, 1, 0)  # (m, 1)
        invbt_buf[...] = invBT + col_l * u
        bfs = bfs_ref[0]
        bfs_l = jnp.sum(jnp.where(at_leave, bfs, 0.0))
        bfs_ref[0] = bfs + u * bfs_l

        # ---- bookkeeping: basis, c_B, penalty ---------------------------
        leaving_col = jnp.sum(jnp.where(at_leave, basis, 0))
        basis_ref[0] = jnp.where(
            at_leave & do_pivot, enter, basis
        ).astype(jnp.int32)
        c_enter = jnp.sum(jnp.where(lane_n == enter, c_ref[0], 0.0))
        cB_new = jnp.where(at_leave, c_enter, cB)
        cB_ref[0] = jnp.where(do_pivot, cB_new, cB)
        pen_new = jnp.where(
            lane_n == enter,
            jnp.inf,
            jnp.where(lane_n == leaving_col, apen_ref[0], pen),
        )
        pen_ref[0] = jnp.where(do_pivot, pen_new, pen)

        return (seg + 1, iters + 1, stop_status.astype(jnp.int32),
                z, stall, bland)

    seg0 = jnp.zeros((), jnp.int32)
    iters0 = iters_in_ref[0, 0, 0]
    status0 = status_in_ref[0, 0, 0]
    carry0 = (seg0, iters0, status0, jnp.asarray(jnp.inf, jnp.float32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    out = lax.while_loop(cond, body, carry0)
    iters_out_ref[0, 0, 0] = out[1]
    status_out_ref[0, 0, 0] = out[2]

    # ---- write the factor back to HBM (aliased in/out buffer) -----------
    pltpu.make_async_copy(invbt_buf, invBT_out.at[i], sem.at[0]).start()
    pltpu.make_async_copy(invbt_buf, invBT_out.at[i], sem.at[0]).wait()


@functools.partial(
    jax.jit,
    static_argnames=("seg_len", "pricing", "opt_tol", "pivot_tol", "dual",
                     "feas_tol", "a_resident", "n_blk", "stall_limit",
                     "interpret"),
    donate_argnums=(5, 6, 7, 8, 9),
)
def solve_segment_stream(A, AT, c_row, apen, maxiters, invBT, bfs, cB, basis,
                         pen, iters, status, *, seg_len: int, pricing: int,
                         opt_tol: float, pivot_tol: float, dual: bool = False,
                         feas_tol: float = 1e-6, a_resident: bool = True,
                         n_blk: int = 256, stall_limit: int = 0,
                         interpret=None):
    """Run up to ``seg_len`` simplex iterations per lane (large-m regime).

    Shapes as :func:`solve_kernel.solve_segment` minus the devex weights:
    ``A[B, m, n]`` (HBM), ``AT[B, n, m]`` (HBM; pass a ``[B, 1, 128]`` dummy
    when ``a_resident``), ``c_row/apen/pen[B, 1, n]``, ``maxiters[1,1,1]``,
    ``invBT[B, m, m]`` (HBM-resident, updated in place), ``bfs/cB/basis
    [B, 1, m]``, ``iters/status[B, 1, 1]`` i32.  Requires ``n % n_blk == 0``
    in streaming mode.

    Returns ``(invBT, bfs, cB, basis, pen, iters, status)``.
    """
    if interpret is None:
        interpret = _interpret_default()
    B, m, n = A.shape
    if not a_resident and n % n_blk != 0:
        raise ValueError(f"n={n} not divisible by n_blk={n_blk}")
    kernel = functools.partial(
        _stream_kernel, seg_len, pricing, opt_tol, pivot_tol, dual,
        feas_tol, a_resident, n_blk, stall_limit,
    )

    def lane(i):
        return (i, 0, 0)

    def shared(i):
        return (0, 0, 0)

    vmem = pltpu.VMEM
    smem = pltpu.SMEM
    anym = pl.ANY
    a_scr = (
        pltpu.VMEM((m, n), jnp.float32) if a_resident
        else pltpu.VMEM((2, m, n_blk), jnp.float32)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=anym),  # A (full, HBM)
            pl.BlockSpec(memory_space=anym),  # AT (full, HBM / dummy)
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # c_row
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # apen
            pl.BlockSpec((1, 1, 1), shared, memory_space=smem),  # maxiters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
            pl.BlockSpec(memory_space=anym),  # invBT (full, HBM)
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # pen
        ],
        out_specs=(
            pl.BlockSpec(memory_space=anym),  # invBT
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # bfs
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # cB
            pl.BlockSpec((1, 1, m), lane, memory_space=vmem),  # basis
            pl.BlockSpec((1, 1, n), lane, memory_space=vmem),  # pen
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # iters
            pl.BlockSpec((1, 1, 1), lane, memory_space=smem),  # status
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m, m), invBT.dtype),
            jax.ShapeDtypeStruct((B, 1, m), bfs.dtype),
            jax.ShapeDtypeStruct((B, 1, m), cB.dtype),
            jax.ShapeDtypeStruct((B, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, n), pen.dtype),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, m), jnp.float32),  # invbt_buf
            a_scr,  # a_buf
            pltpu.VMEM((1, m), jnp.float32),  # arow_buf
            pltpu.VMEM((1, n), jnp.float32),  # r_buf
            pltpu.VMEM((1, n), jnp.float32),  # u_buf
            pltpu.SemaphoreType.DMA((4,)),  # [0] factor/misc, [1-2] A, [3] col
        ],
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3, 11: 4},
        interpret=interpret,
        # the default scoped-VMEM cap is 16 MB; v5e physically has 128 MiB
        # of VMEM, so let Mosaic use most of it (Mosaic's scoped allocation
        # runs ~4x the operand estimate -- body temporaries etc.)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(A, AT, c_row, apen, maxiters, iters, status, invBT, bfs, cB, basis, pen)
    return outs
