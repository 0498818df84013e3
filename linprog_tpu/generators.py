"""Random LP instance generators (benchmarking + property tests).

The reference has only a dead-code transportation-LP generator
(reference ``tests/utils.py:4-41``, unused by its tests).  These generators
produce batches of dense LPs that are *feasible and bounded by
construction*, so batched throughput benchmarks measure solve speed, not
infeasibility detection:

* primal feasibility: ``h = G @ x0 + s0`` with ``x0 >= 0``, ``s0 >= 0``;
* dual feasibility (boundedness): ``c = s - G^T y0`` with ``y0 >= 0``,
  ``s >= 0`` -- in standard form ``[G | I]`` the dual vector ``-y0 <= 0``
  satisfies ``A' y <= c``, certifying a finite optimum.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def random_inequality_lps(
    batch: int,
    m: int,
    n: int,
    seed: int = 0,
    dtype=np.float32,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch of canonical-form LPs ``min c'x s.t. Gx <= h, x >= 0``.

    Returns ``(c[B, n], G[B, m, n], h[B, m])``, each instance feasible and
    bounded by construction.
    """
    rng = np.random.default_rng(seed)
    G = rng.standard_normal(size=(batch, m, n), dtype=np.float32).astype(dtype, copy=False)
    x0 = rng.random(size=(batch, n), dtype=np.float32).astype(dtype, copy=False)
    slack = rng.random(size=(batch, m), dtype=np.float32).astype(dtype, copy=False)
    h = np.einsum("bmn,bn->bm", G, x0) + slack

    y0 = rng.random(size=(batch, m), dtype=np.float32).astype(dtype, copy=False)
    s = 0.1 + 0.9 * rng.random(size=(batch, n), dtype=np.float32).astype(dtype, copy=False)
    c = s - np.einsum("bmn,bm->bn", G, y0)
    return c.astype(dtype, copy=False), G, h.astype(dtype, copy=False)


def device_inequality_lps(key, batch: int, m: int, n: int):
    """Device-side batch generator: same construction as
    :func:`random_inequality_lps`, entirely in jitted JAX ops (no host data,
    no host->device transfer -- only a PRNG key crosses the wire).

    Returns ``(c[B, n], G[B, m, n], h[B, m])`` on device.
    """
    import jax
    import jax.numpy as jnp

    kG, kx, ks0, ky, ks = jax.random.split(key, 5)
    G = jax.random.normal(kG, (batch, m, n), jnp.float32)
    x0 = jax.random.uniform(kx, (batch, n), jnp.float32)
    slack = jax.random.uniform(ks0, (batch, m), jnp.float32)
    h = jnp.einsum("bmn,bn->bm", G, x0) + slack
    y0 = jax.random.uniform(ky, (batch, m), jnp.float32)
    s = jax.random.uniform(ks, (batch, n), jnp.float32, minval=0.1, maxval=1.0)
    c = s - jnp.einsum("bmn,bm->bn", G, y0)
    return c, G, h


def device_standard_form_batch(c, G, h):
    """Device-side ``min c'x, Gx <= h`` -> ``[G | I] x = h`` with sign fix."""
    import jax.numpy as jnp

    B, m, n = G.shape
    eye = jnp.broadcast_to(jnp.eye(m, dtype=G.dtype), (B, m, m))
    A = jnp.concatenate([G, eye], axis=2)
    neg = (h < 0)[:, :, None]
    A = jnp.where(neg, -A, A)
    b = jnp.abs(h)
    c_std = jnp.concatenate([c, jnp.zeros((B, m), G.dtype)], axis=1)
    return c_std, A, b


def transportation_lps(
    batch: int,
    n_supply: int,
    n_demand: int,
    seed: int = 0,
    dtype=np.float32,
):
    """Batch of balanced transportation problems (structured, degenerate).

    ``min sum c_ij x_ij  s.t.  sum_j x_ij = s_i,  sum_i x_ij = d_j, x >= 0``
    with ``sum s = sum d``.  The reference ships only a broken, unused
    transportation generator (``tests/utils.py:4-41``); this one produces
    solvable standard-form instances: highly degenerate, sparse incidence
    structure -- the opposite regime from the dense gaussian bench.

    Returns ``(c[B, ns*nd], A[B, ns+nd, ns*nd], b[B, ns+nd])``.  Note one
    row is redundant (rank ns+nd-1): a correct Phase I must handle it.
    """
    rng = np.random.default_rng(seed)
    ns, nd = n_supply, n_demand
    n = ns * nd
    m = ns + nd
    # incidence structure is shared; costs/supplies/demands vary per lane
    A0 = np.zeros((m, n), dtype=dtype)
    for i in range(ns):
        A0[i, i * nd : (i + 1) * nd] = 1.0  # row sums = supply
    for j in range(nd):
        A0[ns + j, j::nd] = 1.0  # column sums = demand
    A = np.broadcast_to(A0, (batch, m, n)).copy()

    c = rng.uniform(1.0, 10.0, size=(batch, n)).astype(dtype)
    # integer supplies/demands: the balance sum(s) == sum(d) must hold
    # EXACTLY (the equality rows are linearly dependent on it); float
    # rounding would make every instance infeasible at f64 tolerances.
    s = rng.integers(2, 10, size=(batch, ns)).astype(np.int64)
    d = np.empty((batch, nd), dtype=np.int64)
    for k in range(batch):
        total = int(s[k].sum())
        d[k] = 1 + rng.multinomial(total - nd, np.full(nd, 1.0 / nd))
    b = np.concatenate([s, d], axis=1).astype(dtype)
    return c, A, b


def to_standard_form_batch(c, G, h):
    """``min c'x, Gx <= h`` -> standard form ``[G | I] x = h`` batched.

    Applies the b-sign fix per instance (rows with ``h < 0`` flipped), the
    batched equivalent of the reference's preprocessing
    (``preprocessing.py:6-15``).
    """
    B, m, n = G.shape
    dtype = G.dtype
    eye = np.broadcast_to(np.eye(m, dtype=dtype), (B, m, m))
    A = np.concatenate([G, eye], axis=2).copy()
    b = h.copy()
    c_std = np.concatenate([c, np.zeros((B, m), dtype=dtype)], axis=1)
    neg = b < 0
    A[neg] *= -1
    b[neg] *= -1
    return c_std, A, b


def device_bounded_lps(key, batch: int, m: int, n: int, ub_hi: float = 2.0):
    """Device-side batch of bounded-variable LPs with a known feasible start.

    ``min c'z  s.t.  [G' | I] z = b,  0 <= x <= ub_hi-ish, 0 <= s < inf``
    where ``G'`` is row-sign-fixed so ``b >= 0``: the all-slack basis with
    every structural variable AT_LB(=0) is feasible (``bfs = b``), and the
    feasible region is compact (x box-bounded, s determined by x), so every
    instance is bounded.  Feeds the bounded-variable engine benchmark
    (reference capability: ``special_solvers.py:94-343``, never benchmarked
    there).

    Returns ``(c[B, n+m], A[B, m, n+m], b[B, m], lb[B, n+m], ub[B, n+m])``.
    """
    import jax
    import jax.numpy as jnp

    kG, kc, kx, ks, ku = jax.random.split(key, 5)
    G = jax.random.normal(kG, (batch, m, n), jnp.float32)
    x0 = jax.random.uniform(kx, (batch, n), jnp.float32)
    slack = jax.random.uniform(ks, (batch, m), jnp.float32)
    h = jnp.einsum("bmn,bn->bm", G, x0) + slack
    neg = (h < 0)[:, :, None]
    Gf = jnp.where(neg, -G, G)
    b = jnp.abs(h)
    eye = jnp.broadcast_to(jnp.eye(m, dtype=jnp.float32), (batch, m, m))
    A = jnp.concatenate([Gf, eye], axis=2)
    c = jnp.concatenate(
        [jax.random.uniform(kc, (batch, n), jnp.float32, minval=-1.0,
                            maxval=1.0),
         jnp.zeros((batch, m), jnp.float32)], axis=1,
    )
    ubx = jax.random.uniform(ku, (batch, n), jnp.float32, minval=0.5,
                             maxval=ub_hi)
    lb = jnp.zeros((batch, n + m), jnp.float32)
    ub = jnp.concatenate(
        [ubx, jnp.full((batch, m), jnp.inf, jnp.float32)], axis=1
    )
    return c, A, b, lb, ub


def random_sparse_pattern(m: int, n: int, density: float, seed: int = 0):
    """Shared COO pattern ``(rows, cols)`` with ~``density`` fill.

    Every row and every column is guaranteed at least one nonzero (an
    all-zero row makes ``Gx <= h`` trivial/degenerate; an all-zero column
    makes the variable unbounded below whenever ``c_j < 0``).
    """
    rng = np.random.default_rng(seed)
    mask = rng.random((m, n)) < density
    # guarantee coverage: one entry per empty row/column
    empty_rows = np.flatnonzero(~mask.any(axis=1))
    mask[empty_rows, rng.integers(0, n, size=empty_rows.size)] = True
    empty_cols = np.flatnonzero(~mask.any(axis=0))
    mask[rng.integers(0, m, size=empty_cols.size), empty_cols] = True
    rows, cols = np.nonzero(mask)
    return rows.astype(np.int32), cols.astype(np.int32)


def random_sparse_inequality_lps(batch: int, m: int, n: int,
                                 density: float = 0.01, seed: int = 0,
                                 dtype=np.float32):
    """Batch of feasible+bounded SPARSE canonical LPs on one shared pattern.

    Same construction as :func:`random_inequality_lps` (interior point
    ``x0`` for feasibility, dual certificate ``c = s - G'y0`` for
    boundedness) with per-lane values on a shared ``rows/cols`` pattern.
    Returns ``(c[B, n], rows[nnz], cols[nnz], vals[B, nnz], h[B, m])``.
    """
    rng = np.random.default_rng(seed + 1)
    rows, cols = random_sparse_pattern(m, n, density, seed)
    nnz = rows.shape[0]
    vals = rng.standard_normal((batch, nnz)).astype(dtype)
    x0 = rng.random((batch, n)).astype(dtype)
    slack = rng.random((batch, m)).astype(dtype)
    h = np.zeros((batch, m), dtype)
    np.add.at(h.T, rows, (vals * x0[:, cols]).T)
    h += slack
    y0 = rng.random((batch, m)).astype(dtype)
    s = (0.1 + 0.9 * rng.random((batch, n))).astype(dtype)
    gty = np.zeros((batch, n), dtype)
    np.add.at(gty.T, cols, (vals * y0[:, rows]).T)
    c = s - gty
    return c, rows, cols, vals, h


def device_sparse_inequality_lps(key, batch: int, rows, cols, m: int,
                                 n: int):
    """Device-side sparse batch generator on a HOST pattern.

    Only the ``O(nnz)`` pattern (uploaded once by the caller) and a PRNG
    key cross the wire; the ``[B, nnz]`` values and rhs/cost are generated
    on device -- same construction as
    :func:`random_sparse_inequality_lps`.  Returns
    ``(c[B, n], vals[B, nnz], h[B, m])`` on device.
    """
    import jax
    import jax.numpy as jnp

    rows = jnp.asarray(rows, jnp.int32)
    cols = jnp.asarray(cols, jnp.int32)
    nnz = rows.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    vals = jax.random.normal(k1, (batch, nnz), jnp.float32)
    x0 = jax.random.uniform(k2, (batch, n), jnp.float32)
    slack = jax.random.uniform(k3, (batch, m), jnp.float32)
    gx = jax.vmap(
        lambda v, x: jax.ops.segment_sum(
            v * x[cols], rows, num_segments=m
        )
    )(vals, x0)
    h = gx + slack
    y0 = jax.random.uniform(k4, (batch, m), jnp.float32)
    s = 0.1 + 0.9 * jax.random.uniform(k5, (batch, n), jnp.float32)
    gty = jax.vmap(
        lambda v, y: jax.ops.segment_sum(
            v * y[rows], cols, num_segments=n
        )
    )(vals, y0)
    c = s - gty
    return c, vals, h
