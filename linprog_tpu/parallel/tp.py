"""Tensor parallelism: one LARGE LP column-sharded across the mesh.

Data parallelism (mesh.py) scales the number of instances; this module
scales the instance itself.  The constraint matrix ``A [m, n]`` and cost
``c [n]`` are sharded column-wise over mesh axis ``"model"``; the O(m^2)
basis state (``inv_B``, ``bfs``, ``basis``) is replicated.  Per iteration:

* pricing ``r = c - (c_B inv_B) A`` is local to each shard (the only O(mn)
  work -- each device touches just its n/D columns);
* entering-column selection combines local candidates with ``lax.pmin``
  (value then lowest-global-index tie-break -- preserving NumPy first-index
  semantics across shards);
* the entering column is materialized with a local one-hot matvec +
  ``lax.psum`` (doubles as the broadcast);
* ratio test + rank-1 eta update run replicated (O(m^2), no comms).

So per pivot the collective traffic is O(m) (one psum of the column + two
scalar pmins + the c_B gather), while the O(mn) pricing is fully parallel --
the right cut for pricing-dominated dense LPs.  Built with ``shard_map``;
XLA lowers the collectives onto ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import status as st
from ..config import DEFAULT_CONFIG, SolverConfig
from ..engine import SimplexState


def make_model_mesh(n_devices=None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("model",))


def tp_solve(
    c,
    A,
    b,
    basis,
    maxiters,
    mesh: Mesh,
    cfg: SolverConfig = DEFAULT_CONFIG,
    axis: str = "model",
) -> SimplexState:
    """Primal revised simplex on one column-sharded LP.

    ``c [n]`` and ``A [m, n]`` sharded on their last axis over ``axis``;
    ``n`` must divide the mesh size.  Returns a replicated SimplexState.
    """
    m, n = A.shape
    n_dev = mesh.shape[axis]
    if n % n_dev != 0:
        raise ValueError(f"n={n} not divisible by mesh axis size {n_dev}")

    c = jax.device_put(c, NamedSharding(mesh, P(axis)))
    A = jax.device_put(A, NamedSharding(mesh, P(None, axis)))
    b = jax.device_put(b, NamedSharding(mesh, P()))
    basis = jnp.asarray(basis, jnp.int32)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, axis), P(None), P(None)),
        out_specs=P(),
        check_vma=False,
    )
    def _solve(c_l, A_l, b_rep, basis0):
        return _tp_local_solve(c_l, A_l, b_rep, basis0, maxiters, cfg, axis, n)

    return _solve(c, A, b, basis)


def tp_solve_batch(
    c,
    A,
    b,
    basis,
    maxiters,
    mesh: Mesh,
    cfg: SolverConfig = DEFAULT_CONFIG,
    batch_axis: str = "batch",
    axis: str = "model",
) -> SimplexState:
    """DP x TP: a batch of column-sharded LPs on a 2-D (batch, model) mesh.

    ``c [B, n]``, ``A [B, m, n]``, ``b [B, m]``, ``basis [B, m]``: the batch
    dim is sharded over ``batch_axis`` (pure data parallelism, no traffic)
    and columns over ``axis`` (TP collectives ride the inner mesh axis).
    This is the zero-extra-comms composition: per pivot each lane pays the
    same O(m) psum/pmin as :func:`tp_solve`, all within its model group.
    Use :func:`linprog_tpu.parallel.distributed.global_2d_mesh` to build
    the mesh.  Returns a batch-sharded, model-replicated SimplexState.
    """
    B, m, n = A.shape
    n_model = mesh.shape[axis]
    n_batch = mesh.shape[batch_axis]
    if n % n_model != 0:
        raise ValueError(f"n={n} not divisible by model axis {n_model}")
    if B % n_batch != 0:
        raise ValueError(f"B={B} not divisible by batch axis {n_batch}")

    c = jax.device_put(c, NamedSharding(mesh, P(batch_axis, axis)))
    A = jax.device_put(A, NamedSharding(mesh, P(batch_axis, None, axis)))
    b = jax.device_put(b, NamedSharding(mesh, P(batch_axis, None)))
    basis = jax.device_put(
        jnp.asarray(basis, jnp.int32), NamedSharding(mesh, P(batch_axis, None))
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(batch_axis, axis), P(batch_axis, None, axis),
                  P(batch_axis, None), P(batch_axis, None)),
        out_specs=P(batch_axis),
        check_vma=False,
    )
    def _solve(c_l, A_l, b_l, basis_l):
        def one(cc, AA, bb, bs):
            return _tp_local_solve(cc, AA, bb, bs, maxiters, cfg, axis, n)

        return jax.vmap(one)(c_l, A_l, b_l, basis_l)

    return _solve(c, A, b, basis)


def _tp_local_solve(c_l, A_l, b_rep, basis0, maxiters, cfg: SolverConfig,
                    axis: str, n: int) -> SimplexState:
    """Per-shard local solve body (shared by tp_solve / tp_solve_batch).

    Runs under ``shard_map`` (optionally inside a ``vmap`` over a local
    batch): all cross-shard traffic is ``psum``/``pmin`` over ``axis``.
    """
    n_local = c_l.shape[0]
    offset = lax.axis_index(axis) * n_local
    col_ids = offset + jnp.arange(n_local)  # global column ids

    def gather_c(basis_g):
        """Replicated c[basis] from the sharded c (one psum)."""
        local_pos = basis_g - offset
        mine = (local_pos >= 0) & (local_pos < n_local)
        vals = jnp.where(
            mine, c_l[jnp.clip(local_pos, 0, n_local - 1)], 0.0
        )
        return lax.psum(vals, axis)

    inv_B0 = jnp.linalg.inv(
        _replicated_basis_matrix(A_l, basis0, offset, n_local, axis)
    )
    bfs0 = inv_B0 @ b_rep
    state = SimplexState(
        basis=basis0,
        inv_B=inv_B0,
        bfs=bfs0,
        iters=jnp.zeros((), jnp.int32),
        status=jnp.zeros((), jnp.int32),
    )

    def in_basis_local(basis_g):
        return jnp.any(col_ids[:, None] == basis_g[None, :], axis=1)

    def step(s: SimplexState) -> SimplexState:
        cB = gather_c(s.basis)
        y = cB @ s.inv_B
        r_l = c_l - y @ A_l
        eligible = (r_l < -cfg.opt_tol) & ~in_basis_local(s.basis)

        if cfg.pricing == "dantzig":
            local_min = jnp.min(jnp.where(eligible, r_l, jnp.inf))
            gmin = lax.pmin(local_min, axis)
            cand = jnp.where(
                eligible & (r_l == gmin), col_ids, n
            )
            enter = lax.pmin(jnp.min(cand), axis)
            any_elig = jnp.isfinite(gmin)
        else:  # bland: lowest eligible global index
            cand = jnp.where(eligible, col_ids, n)
            enter = lax.pmin(jnp.min(cand), axis)
            any_elig = enter < n

        onehot = (col_ids == enter).astype(A_l.dtype)
        a_col = lax.psum(A_l @ onehot, axis)  # replicated entering column

        d = s.inv_B @ a_col
        pos = d > cfg.pivot_tol
        unbounded = any_elig & ~jnp.any(pos)
        # bfs clamped at 0 for pivot-path parity with engine.primal_step
        # (refactorization-noise guard)
        bfs_nn = jnp.maximum(s.bfs, 0.0)
        theta = jnp.where(pos, bfs_nn / jnp.where(pos, d, 1.0), jnp.inf)
        leave = jnp.argmin(theta)

        do_pivot = any_elig & ~unbounded
        d_l = d[leave]
        safe = jnp.where(d_l == 0, 1.0, d_l)
        u = -d / safe
        u = u.at[leave].set(1.0 / safe - 1.0)
        u = jnp.where(do_pivot, u, jnp.zeros_like(u))
        inv_B = s.inv_B + jnp.outer(u, s.inv_B[leave])
        bfs = s.bfs + u * s.bfs[leave]
        basis_g = jnp.where(
            do_pivot,
            s.basis.at[leave].set(jnp.asarray(enter, jnp.int32)),
            s.basis,
        )
        new_status = jnp.where(
            ~any_elig,
            st.OPTIMAL,
            jnp.where(unbounded, st.PRIMAL_UNBOUNDED, st.RUNNING),
        )
        return SimplexState(
            basis=basis_g,
            inv_B=inv_B,
            bfs=bfs,
            iters=s.iters + 1,
            status=jnp.asarray(new_status, jnp.int32),
        )

    def cond(s):
        return (s.status == st.RUNNING) & (s.iters < maxiters)

    return lax.while_loop(cond, step, state)


def _replicated_basis_matrix(A_l, basis, offset, n_local, axis):
    """Replicated ``A[:, basis]`` from column-sharded ``A_l`` (one psum)."""
    local_pos = basis - offset
    mine = (local_pos >= 0) & (local_pos < n_local)
    cols = jnp.take(A_l, jnp.clip(local_pos, 0, n_local - 1), axis=1)
    cols = jnp.where(mine[None, :], cols, 0.0)
    return jax.lax.psum(cols, axis)
