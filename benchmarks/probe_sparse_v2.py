import os, time
import numpy as np
import jax
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from linprog_tpu import status as stt
from linprog_tpu.generators import (device_sparse_inequality_lps, random_sparse_pattern)
from linprog_tpu.ipm import IPMConfig
from linprog_tpu.ipm_sparse import SparsePattern, ipm_solve_batch_sparse_canonical
m = n = 2048; B = 128
rows, cols = random_sparse_pattern(m, n, 0.01, seed=0)
pat = SparsePattern(rows, cols, m, n)
print("half-pairs:", pat.pair_ids.shape[0], flush=True)
c, vals, h = jax.jit(lambda k: device_sparse_inequality_lps(k, B, rows, cols, m, n))(jax.random.PRNGKey(0))
for eq in (False, True):
    cfg = IPMConfig(eps_rel=1e-3, maxiters=40, frac=0.995)
    res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n), cfg, pattern=pat, equilibrate=eq)
    np.asarray(res.cost)
    t0 = time.time()
    res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n), cfg, pattern=pat, equilibrate=eq)
    ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
    w = time.time() - t0
    med = int(np.median(np.asarray(res.iters)))
    print(f"half-sym eq={eq}: {B/w:.2f} LPs/s wall={w:.2f}s optimal={ns}/{B} med={med}", flush=True)
