"""TPU probe: bounded m=256 leg with the bound-aware dd polish.

VERDICT r3 item 5 target: gap <= 1e-6 at >= 200 LPs/s.
"""
import os, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench
cfg_mod = __import__("linprog_tpu.config", fromlist=["tuned_config"])
cfg = cfg_mod.tuned_config(256)
for pp in (8,):
    out = bench.run_bounded(
        jax, 256, 256, 1024, 6000,
        cfg.replace(pricing="dantzig", polish_pivots=pp,
                    refactor_every=2048), 4)
    print(f"polish={pp}:", out, flush=True)
