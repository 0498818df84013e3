"""Warm-started scenario re-optimization: the dual-simplex workflow, batched.

Solve a batch of LPs once, then re-solve RHS perturbations (e.g. demand
scenarios) starting from the previous optimal bases: the basis stays dual
feasible, so each re-solve needs a handful of dual pivots instead of a full
two-phase solve.

Run: python examples/warm_start.py [batch]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from linprog_tpu.batch import (
    batch_summary,
    reoptimize_batch_new_rhs,
    solve_batch_two_phase,
)
from linprog_tpu.config import SolverConfig
from linprog_tpu.generators import (
    device_inequality_lps,
    device_standard_form_batch,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    m = n = 64
    cfg = SolverConfig(pricing="dantzig", refactor_every=64)

    c, G, h = device_inequality_lps(jax.random.PRNGKey(0), B, m, n)
    cs, As, bs = device_standard_form_batch(c, G, h)

    t0 = time.time()
    base = solve_batch_two_phase(cs, As, bs, 500, 500, cfg)
    jax.block_until_ready(base.cost)
    print(f"base solve: {batch_summary(base)}  ({time.time()-t0:.2f}s incl. compile)")

    # demand scenario: rhs shifts by +/-5%
    pert = 1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), bs.shape)
    bs_new = bs * pert
    t0 = time.time()
    warm = reoptimize_batch_new_rhs(cs, As, bs_new, base.basis, 300, cfg)
    cost = np.asarray(warm.cost)
    print(f"warm re-solve: {batch_summary(warm)}  ({time.time()-t0:.2f}s incl. compile)")
    print(f"objective shift: mean {float(np.mean(cost - np.asarray(base.cost))):+.4f}")


if __name__ == "__main__":
    main()
