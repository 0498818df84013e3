"""TPU probe: sparse normal-assembly reduction (VERDICT r4 item 8).

The round-4 anatomy put the pre-sorted segment-sum scatter at 84 ms of
the 225 ms sparse Newton step (m=2048, B=128, 1%).  This measures the
round-5 alternative -- compensated prefix-sum + boundary gathers
("cumsum" assembly) -- both as an isolated op and end-to-end, plus a
re-probe of the FIXED Gondzio correctors (the round-4 negative result
was measured with a corrector that double-cancelled the residuals).

MEASURED (v5e, round 5, m=2048 B=128 1%):

* normal() isolated: segment 47.1 ms | cumsum 314.5 ms -- the
  compensated (tuple-carry) associative scan lowers as multiple full
  passes over the 105M-element pair stream and loses 6.7x.  NEGATIVE;
  "segment" stays the default.
* e2e segment: 39.0 LPs/s (124/128, med 13 iters); cumsum 13.4.
* gondzio=2 (FIXED corrector): 34.6 vs 39.0 LPs/s, med iters 13 -> 12
  and 122 vs 124 optimal -- still net-negative on the sparse path; the
  two extra GEMV solves outweigh one saved factorization.

Run: nohup python benchmarks/probe_sparse_assembly.py > /tmp/psa.log &
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.generators import (
    device_sparse_inequality_lps,
    random_sparse_pattern,
)
from linprog_tpu.ipm import IPMConfig
from linprog_tpu.ipm_sparse import (
    SparsePattern,
    _SparseSlackOp,
    ipm_solve_batch_sparse_canonical,
)

m = n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
density = 0.01

rows, cols = random_sparse_pattern(m, n, density, seed=0)
pat = SparsePattern(rows, cols, m, n)
c, vals, h = jax.jit(
    lambda k: device_sparse_inequality_lps(k, B, rows, cols, m, n)
)(jax.random.PRNGKey(0))
print(f"m={m} B={B} nnz={rows.shape[0]} k_col={pat.k_col}", flush=True)

# ---- isolated op: normal() under both assemblies ------------------------
pat_dev = {k: jnp.asarray(getattr(pat, k)) for k in
           ("row_cols", "row_slot", "row_mask", "col_rows", "col_slot",
            "col_mask", "pair_perm", "pair_ids")}
starts, ends = pat.seg_bounds()
pat_dev_cum = dict(pat_dev, seg_starts=jnp.asarray(starts),
                   seg_ends=jnp.asarray(ends))
d = jnp.asarray(
    np.random.default_rng(0).uniform(0.1, 3.0, (B, n + m)), jnp.float32
)


def timed(fn, reps=3):
    out = fn()
    np.asarray(out[:, 0, 0])  # force
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    np.asarray(out[:, 0, 0])
    return (time.time() - t0) / reps


f_seg = jax.jit(lambda dd: _SparseSlackOp(pat_dev, vals, m, n).normal(dd))
f_cum = jax.jit(
    lambda dd: _SparseSlackOp(pat_dev_cum, vals, m, n).normal(dd)
)
t_seg = timed(lambda: f_seg(d))
t_cum = timed(lambda: f_cum(d))
print(f"normal() isolated: segment {1e3*t_seg:.1f} ms | "
      f"cumsum {1e3*t_cum:.1f} ms", flush=True)
err = float(jnp.max(jnp.abs(f_cum(d) - f_seg(d))))
print(f"max assembly diff: {err:.3e}", flush=True)

# ---- end-to-end solves --------------------------------------------------
for assembly in ("segment", "cumsum"):
    for gz in (0, 2):
        cfg = IPMConfig(eps_rel=1e-3, maxiters=40, frac=0.995, gondzio=gz)

        def solve():
            return ipm_solve_batch_sparse_canonical(
                c, rows, cols, vals, h, (m, n), cfg, pattern=pat,
                assembly=assembly,
            )

        res = solve()
        np.asarray(res.cost)
        t0 = time.time()
        res = solve()
        ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
        w = time.time() - t0
        iters = np.asarray(res.iters)
        print(f"e2e {assembly} gondzio={gz}: {B/w:.1f} LPs/s wall={w:.2f}s "
              f"optimal={ns}/{B} med_iters={int(np.median(iters))} "
              f"max_iters={int(iters.max())}", flush=True)
