"""Component timing of the sparse-IPM iteration at m=2048 B=128."""
import os, time
import numpy as np
import jax, jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu.generators import (device_sparse_inequality_lps,
                                    random_sparse_pattern)
from linprog_tpu.ipm import block_cholesky_inverse, _chol_solve
from linprog_tpu.ipm_sparse import SparsePattern, _SparseSlackOp

m = n = 2048
B = 128
rows, cols = random_sparse_pattern(m, n, 0.01, seed=0)
pat = SparsePattern(rows, cols, m, n)
c, vals, h = jax.jit(
    lambda k: device_sparse_inequality_lps(k, B, rows, cols, m, n)
)(jax.random.PRNGKey(0))
pd = {k: jnp.asarray(getattr(pat, k)) for k in
      ("row_cols","row_slot","row_mask","col_rows","col_slot","col_mask",
       "pair_perm","pair_ids")}
op = _SparseSlackOp(pd, vals, m, n)
d = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, n + m))) + 0.1

normal = jax.jit(lambda dd: op.normal(dd))
cholinv = jax.jit(lambda N: block_cholesky_inverse(N, use_panel_kernel=True))
solve = jax.jit(lambda W, r: _chol_solve(W, r))

N = normal(d); float(jnp.sum(N))
t0 = time.time(); N = normal(d); s = float(jnp.sum(N)); t_n = time.time() - t0
eye = jnp.eye(m, dtype=jnp.float32)
Nr = N + 0.1 * eye[None]
W = cholinv(Nr); float(jnp.sum(W))
t0 = time.time(); W = cholinv(Nr); s = float(jnp.sum(W)); t_c = time.time() - t0
r = jax.random.normal(jax.random.PRNGKey(2), (B, m))
z = solve(W, r); float(jnp.sum(z))
t0 = time.time(); z = solve(W, r); s = float(jnp.sum(z)); t_s = time.time() - t0
print(f"normal(scatter) {t_n*1e3:.1f} ms | cholinv {t_c*1e3:.1f} ms | "
      f"solve {t_s*1e3:.1f} ms   (per itn: normal + cholinv + 4 solves)",
      flush=True)
