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
    G = rng.normal(size=(batch, m, n)).astype(dtype)
    x0 = rng.uniform(0.0, 1.0, size=(batch, n)).astype(dtype)
    slack = rng.uniform(0.0, 1.0, size=(batch, m)).astype(dtype)
    h = np.einsum("bmn,bn->bm", G, x0) + slack

    y0 = rng.uniform(0.0, 1.0, size=(batch, m)).astype(dtype)
    s = rng.uniform(0.1, 1.0, size=(batch, n)).astype(dtype)
    c = s - np.einsum("bmn,bm->bn", G, y0)
    return c.astype(dtype), G, h.astype(dtype)


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
