"""Sparse IPM vs sparse PDHG on the SAME shared-pattern instances."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.generators import (device_sparse_inequality_lps,
                                    random_sparse_pattern)
from linprog_tpu.ipm import IPMConfig
from linprog_tpu.ipm_sparse import SparsePattern, ipm_solve_batch_sparse_canonical

m = n = 2048
B = 128
rows, cols = random_sparse_pattern(m, n, 0.01, seed=0)
pat = SparsePattern(rows, cols, m, n)
c, vals, h = jax.jit(
    lambda k: device_sparse_inequality_lps(k, B, rows, cols, m, n)
)(jax.random.PRNGKey(0))

# --- sparse PDHG at its bench settings (eps 1e-4) on the same data -------
from linprog_tpu.pdhg import PDHGConfig, pdhg_solve_batch_sparse

lb = jnp.zeros((B, n), jnp.float32)
ub = jnp.full((B, n), jnp.inf, jnp.float32)
pcfg = PDHGConfig(eps_rel=1e-4, adaptive=True, stall_reset_beta=0.95)
st8 = pdhg_solve_batch_sparse(c, rows, cols, vals, h, 0, lb, ub, (m, n),
                              maxiters=60_000, cfg=pcfg)
np.asarray(st8.x[:, 0])
t0 = time.time()
st8 = pdhg_solve_batch_sparse(c, rows, cols, vals, h, 0, lb, ub, (m, n),
                              maxiters=60_000, cfg=pcfg)
ns = int((np.asarray(st8.status) == stt.OPTIMAL).sum())
w = time.time() - t0
print(f"sparse PDHG eps1e-4: {B/w:.2f} LPs/s wall={w:.2f}s optimal={ns}/{B}",
      flush=True)

# --- sparse IPM again (cache-hot), plus a frac=0.995 arm ------------------
for frac in (0.99, 0.995):
    cfg = IPMConfig(eps_rel=1e-3, maxiters=40, frac=frac)
    res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n),
                                           cfg, pattern=pat)
    np.asarray(res.cost)
    t0 = time.time()
    res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n),
                                           cfg, pattern=pat)
    ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
    w = time.time() - t0
    med = int(np.median(np.asarray(res.iters)))
    print(f"sparse IPM frac={frac}: {B/w:.2f} LPs/s wall={w:.2f}s "
          f"optimal={ns}/{B} med_iters={med}", flush=True)
