"""Rolling-horizon re-solves with the warm-started interior-point family.

A production pattern: the same LP structure re-solved every period with a
slightly different right-hand side (demands, capacities).  The simplex
family warm-starts from the optimal BASIS
(``examples/warm_start.py``); the IPM family -- the fastest family for
m >= 512 -- warm-starts from the previous ITERATE with complementarity
lifted back into the interior (``linprog_tpu.ipm.warm_start_point``),
cutting Newton steps roughly in half at small perturbations.

Run: python examples/warm_ipm.py [batch] [m] [periods]
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from linprog_tpu import status as st
from linprog_tpu.generators import random_inequality_lps
from linprog_tpu.ipm import (
    IPMConfig,
    ipm_solve_batch_canonical,
    reoptimize_ipm_batch_canonical,
)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    periods = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    cfg = IPMConfig(eps_rel=1e-3, maxiters=40)
    c, G, h = random_inequality_lps(B, m, m, seed=0)
    c, G, h = jnp.asarray(c), jnp.asarray(G), jnp.asarray(h)

    res, state = ipm_solve_batch_canonical(c, G, h, cfg, return_state=True)
    opt = int((np.asarray(res.status) == st.OPTIMAL).sum())
    print(f"period 0 (cold): {opt}/{B} optimal, "
          f"mean iters {np.asarray(res.iters).mean():.1f}")

    rng = np.random.default_rng(1)
    for t in range(1, periods + 1):
        h = h * jnp.asarray(
            1.0 + 0.02 * rng.standard_normal(h.shape), h.dtype
        )
        res, state = reoptimize_ipm_batch_canonical(
            c, G, h, state, cfg, return_state=True
        )
        opt = int((np.asarray(res.status) == st.OPTIMAL).sum())
        print(f"period {t} (warm): {opt}/{B} optimal, "
              f"mean iters {np.asarray(res.iters).mean():.1f}, "
              f"mean cost {float(np.asarray(res.cost).mean()):.4f}")


if __name__ == "__main__":
    main()
