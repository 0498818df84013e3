"""TPU probe: shared-pattern sparse IPM at m=n=2048, 1% density.

VERDICT r3 item 4 target: beat the sparse-PDHG 35.7 LPs/s (128 lanes,
eps 1e-4) at the IPM's better accuracy class (eps 1e-3 KKT).
"""
import os, sys, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.generators import (
    device_sparse_inequality_lps, random_sparse_pattern)
from linprog_tpu.ipm import IPMConfig
from linprog_tpu.ipm_sparse import SparsePattern, ipm_solve_batch_sparse_canonical

m = n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
dens = 0.01
rows, cols = random_sparse_pattern(m, n, dens, seed=0)
print(f"pattern: nnz={rows.shape[0]} ({rows.shape[0]/(m*n):.4f} fill)",
      flush=True)
pat = SparsePattern(rows, cols, m, n)
print(f"k_row={pat.k_row} k_col={pat.k_col} pairs={pat.pair_ids.shape[0]}",
      flush=True)
c, vals, h = jax.jit(
    lambda k: device_sparse_inequality_lps(k, B, rows, cols, m, n)
)(jax.random.PRNGKey(0))
g = int(os.environ.get("GONDZIO", "0"))
cfg = IPMConfig(eps_rel=1e-3, maxiters=40, gondzio=g)
t0 = time.time()
res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n), cfg,
                                        pattern=pat)
ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
print(f"compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
res = ipm_solve_batch_sparse_canonical(c, rows, cols, vals, h, (m, n), cfg,
                                        pattern=pat)
ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
wall = time.time() - t0
med = int(np.median(np.asarray(res.iters)))
print(f"sparse ipm m={m} B={B} gondzio={cfg.gondzio}: {B/wall:.2f} LPs/s wall={wall:.2f}s "
      f"optimal={ns}/{B} median_iters={med}", flush=True)
