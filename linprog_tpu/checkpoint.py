"""Checkpoint / resume for solver state.

The reference has no checkpointing, but its API is resumable by construction
(``solve(maxiters=1)`` continues from live state -- SURVEY.md section 5).
Here the whole solver state is an explicit pytree (:class:`SimplexState` /
:class:`BoundedState` / :class:`PDHGState`), so checkpointing is just
(de)serializing a pytree; resume is exact because each state carries its
full iteration context (PDHG: iterates, averages, restart anchors,
adapted primal weight).
Two backends:

* plain ``.npz`` (zero dependencies, host-side) -- :func:`save_state` /
  :func:`load_state`;
* `orbax` (async, sharding-aware) when available -- :func:`save_state_orbax`
  / :func:`load_state_orbax`.
"""

from __future__ import annotations

import os
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .bounded import BoundedState
from .engine import SimplexState
from .pdhg import PDHGState

_STATE_TYPES = {
    "SimplexState": SimplexState,
    "BoundedState": BoundedState,
    "PDHGState": PDHGState,
}
StateLike = Union[SimplexState, BoundedState, PDHGState]


def save_state(path: str, state: StateLike) -> None:
    """Serialize a solver state pytree to ``.npz`` (works for batched too)."""
    fields = {k: np.asarray(v) for k, v in state._asdict().items()}
    np.savez(path, __type__=type(state).__name__, **fields)


def load_state(path: str) -> StateLike:
    """Load a state saved by :func:`save_state`; arrays go back on device."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    cls = _STATE_TYPES[str(data["__type__"])]
    kwargs = {
        k: jnp.asarray(data[k]) for k in cls._fields
    }
    return cls(**kwargs)


def save_state_orbax(path: str, state: StateLike) -> None:
    """Checkpoint via orbax (preserves shardings for multi-host batches)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict())
    ckptr.wait_until_finished()


def load_state_orbax(path: str, like: StateLike) -> StateLike:
    """Restore an orbax checkpoint; ``like`` supplies structure and dtypes."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path), jax.tree.map(jnp.asarray, like._asdict())
    )
    return type(like)(**restored)
