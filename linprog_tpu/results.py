"""Result objects.

``LinProgResult`` mirrors the reference dataclass field-for-field (reference
``linprog/data_classes.py:6-13``).  ``BatchResult`` is its batched, device-side
pytree counterpart: every field carries a leading batch dimension and the
exception taxonomy is folded into a per-lane status code.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import numpy as np

from . import status as st


@dataclasses.dataclass
class LinProgResult:
    """Single-instance solve result (API parity with the reference).

    Attributes: ``x`` full-length primal solution, ``basis`` basic column
    indices (or None when uninterpretable), ``cost`` objective value, ``iters``
    iteration count, ``optimum`` True iff converged to an optimum.
    """

    x: np.ndarray
    basis: Optional[np.ndarray]
    cost: float
    iters: int
    optimum: bool
    status: int = st.OPTIMAL
    y: Optional[np.ndarray] = None  # dual variables (simplex multipliers)

    @property
    def status_name(self) -> str:
        return st.status_name(self.status)


class BatchResult(NamedTuple):
    """Batched device-side solve result.

    ``x[B, n]``, ``basis[B, m]``, ``cost[B]``, ``iters[B]``, ``status[B]``,
    ``y[B, m]`` (dual variables / simplex multipliers at the terminal basis,
    None where not computed).  ``status`` uses the codes in
    :mod:`linprog_tpu.status`.  For ``PRIMAL_INFEASIBLE`` lanes ``y`` is a
    Farkas infeasibility certificate: ``y'A <= 0`` and ``y'b > 0``.
    """

    x: jax.Array
    basis: jax.Array
    cost: jax.Array
    iters: jax.Array
    status: jax.Array
    y: Optional[jax.Array] = None

    @property
    def optimum(self):
        return self.status == st.OPTIMAL
