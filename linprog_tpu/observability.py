"""Observability: structured solve summaries, residuals, profiling hooks.

The reference has no tracing/profiling/metrics at all (SURVEY.md section 5:
only an iteration counter).  This module provides:

* :func:`solution_quality` -- device-side per-instance quality metrics
  (primal residual ``||Ax - b||_inf``, bound violation, objective) reduced
  with one jitted computation; batch aggregates via ``jnp`` reductions so a
  sharded batch reduces over ICI.
* :func:`solve_report` -- host-side structured summary (dict) suitable for
  logging/JSON.
* :func:`trace` -- context manager around ``jax.profiler`` so pivots/sec
  shows up in XProf/Perfetto; :func:`annotate` names kernel regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import status as st
from .results import BatchResult


@jax.jit
def solution_quality(c, A, b, x):
    """Per-instance quality metrics for a batch: returns a dict of arrays.

    ``c[B, n], A[B, m, n], b[B, m], x[B, n]`` -> primal residual (inf-norm),
    nonnegativity violation, objective value.
    """
    Ax = jnp.einsum("bmn,bn->bm", A, x)
    resid = jnp.max(jnp.abs(Ax - b), axis=1)
    neg = jnp.maximum(0.0, -jnp.min(x, axis=1))
    obj = jnp.sum(c * x, axis=1)
    return {"primal_residual": resid, "bound_violation": neg, "objective": obj}


def solve_report(result: BatchResult, c=None, A=None, b=None) -> dict:
    """Host-side structured summary of a batched solve."""
    status = np.asarray(result.status)
    iters = np.asarray(result.iters)
    report = {
        "lanes": int(status.shape[0]),
        "status_counts": {
            st.STATUS_NAMES[code]: int((status == code).sum())
            for code in np.unique(status)
        },
        "iters": {
            "total": int(iters.sum()),
            "mean": float(iters.mean()),
            "max": int(iters.max()),
        },
    }
    if c is not None and A is not None and b is not None:
        q = solution_quality(c, A, b, result.x)
        report["quality"] = {
            "max_primal_residual": float(jnp.max(q["primal_residual"])),
            "max_bound_violation": float(jnp.max(q["bound_violation"])),
        }
    return report


@contextlib.contextmanager
def trace(logdir: Optional[str] = None, label: str = "linprog_solve"):
    """Profile a solve region; writes an XProf trace when ``logdir`` given.

    Usage::

        with observability.trace("/tmp/xprof"):
            res = solve_batch_two_phase(...)
            jax.block_until_ready(res.cost)
    """
    t0 = time.perf_counter()
    if logdir is not None:
        jax.profiler.start_trace(logdir)
    try:
        with jax.named_scope(label):
            yield
    finally:
        if logdir is not None:
            jax.profiler.stop_trace()
        trace.last_elapsed_s = time.perf_counter() - t0


trace.last_elapsed_s = None


def annotate(label: str):
    """Named scope for kernel regions (shows up in profiler timelines)."""
    return jax.named_scope(label)
