"""TPU probe: the small-m IPM solve chain (VERDICT r4 item 10).

ipm_m256 runs at 5.3% of f32 SOL -- this measures WHERE the Newton
iteration's time goes at m=256 (isolated ops with forced readbacks) and
probes the candidate levers:

* chunk size B (if the iteration is latency-/dispatch-bound, a bigger
  batch amortizes it ~linearly);
* gondzio=2 centrality correctors (FIXED this round -- the round-4
  negative was measured with a double-cancelling corrector): ~2 extra
  GEMV solves per iteration vs ~18% fewer iterations;
* newton_solver="minv" is NOT probed on TPU: measured on CPU f32 it
  collapses (1/32 lanes optimal at eps 1e-3) because explicitly forming
  W'W squares cond(M) into one f32 matrix.  Negative result, documented
  in IPMConfig.

MEASURED (v5e, round 5) -- all three levers NEGATIVE:

* isolated-op timings over the axon tunnel are useless: every dispatch
  costs ~7-11 ms of tunnel latency (an op.mv whose bandwidth floor is
  82 us "measures" 11.5 ms).  Only end-to-end walls mean anything here.
* single-chunk e2e: B=512 beats B=256 by +14%/lane (2708 vs 2370
  LPs/s) -- but with the bench's ASYNC DISPATCH CHAIN the ordering
  flips: chunk=256 x4 3250 LPs/s > 512x2 2842 > 1024x1 2795.  The
  pipelining across small chunks amortizes dispatch better than larger
  device batches do.  Bench config (256 x4) already optimal.
* gondzio=2 at m=256: +-5-7% wall (noise) and consistently FEWER
  optimal lanes (249 vs 254 at B=256; 997 vs 1009 at B=1024) -- the
  extra correctors push borderline f32 lanes off the central path, so
  recovery pays more downstream.  Keep off.

Conclusion: the 5.3%-of-SOL at m=256 is many small latency-bound ops in
one fused loop body; the remaining structural fix would be a Pallas
whole-Newton-iteration kernel (factor recursion included), not a
config-level lever.

Run: PYTHONPATH=... nohup python benchmarks/probe_ipm_smallm.py > log &
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linprog_tpu import status as stt
from linprog_tpu.generators import device_inequality_lps
from linprog_tpu.ipm import (
    IPMConfig,
    _chol_solve,
    _normal_factor,
    _SlackOp,
    ipm_solve_batch_canonical,
)

m = n = 256


def timed(fn, force, reps=5):
    fn()
    force()
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    force(out)
    return (time.time() - t0) / reps


# ---- isolated per-iteration pieces at B=256 -----------------------------
B = 256
c, G, h = jax.jit(lambda k: device_inequality_lps(k, B, m, n))(
    jax.random.PRNGKey(0))
op = _SlackOp(G)
d = jnp.asarray(
    np.random.default_rng(0).uniform(0.1, 3.0, (B, n + m)), jnp.float32
)
r = jnp.asarray(np.random.default_rng(1).normal(size=(B, m)), jnp.float32)

f_normal = jax.jit(lambda dd: op.normal(dd))
f_factor = jax.jit(lambda dd: _normal_factor(op, dd, 1e-7))
W = f_factor(d)
f_solve = jax.jit(lambda rr: _chol_solve(W, rr))
f_mv = jax.jit(lambda v: op.mv(v))

t_n = timed(lambda: f_normal(d), lambda *a: np.asarray((a[0] if a else f_normal(d))[:, 0, 0]))
t_f = timed(lambda: f_factor(d), lambda *a: np.asarray((a[0] if a else f_factor(d))[:, 0, 0]))
t_s = timed(lambda: f_solve(r), lambda *a: np.asarray((a[0] if a else f_solve(r))[:, 0]))
v = jnp.ones((B, n + m), jnp.float32)
t_mv = timed(lambda: f_mv(v), lambda *a: np.asarray((a[0] if a else f_mv(v))[:, 0]))
print(f"B={B} isolated: normal {1e3*t_n:.2f} ms | factor {1e3*t_f:.2f} ms "
      f"| chol_solve {1e3*t_s:.3f} ms | op.mv {1e3*t_mv:.3f} ms", flush=True)

# ---- end-to-end raw IPM across chunk sizes and gondzio ------------------
for Bc in (256, 512, 1024):
    cb, Gb, hb = jax.jit(lambda k, Bc=Bc: device_inequality_lps(k, Bc, m, n))(
        jax.random.PRNGKey(0))
    for gz in (0, 2):
        cfg = IPMConfig(eps_rel=1e-3, maxiters=40, gondzio=gz)

        def solve():
            return ipm_solve_batch_canonical(cb, Gb, hb, cfg)

        res = solve()
        np.asarray(res.cost)
        t0 = time.time()
        res = solve()
        ns = int((np.asarray(res.status) == stt.OPTIMAL).sum())
        w = time.time() - t0
        it = np.asarray(res.iters)
        print(f"e2e B={Bc} gondzio={gz}: {Bc/w:.0f} LPs/s wall={w:.3f}s "
              f"opt={ns}/{Bc} med={int(np.median(it))} max={int(it.max())}",
              flush=True)
