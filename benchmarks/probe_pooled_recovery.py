"""TPU probe: pooled straggler recovery walls at m=512 / m=1024.

VERDICT r3 item 3 target: recovered-leg wall <= 2x raw IPM wall
(was 5.5x at m=512, 11.5x at m=1024).
"""
import os, time
import numpy as np
import jax

os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench

for m, chunk in ((512, 128), (1024, 64)):
    out = bench.run_ipm_batch(jax, m, m, chunk, chunks=4)
    ratio = out["recovered_wall_sec"] / out["wall_sec"]
    print(f"m={m}: raw {out['lps_per_sec']} LPs/s ({out['wall_sec']}s) -> "
          f"recovered {out['recovered_lps_per_sec']} LPs/s "
          f"({out['recovered_wall_sec']}s)  ratio {ratio:.2f}x  "
          f"optimal {out['optimal']} -> {out['recovered_optimal']} "
          f"/ {out['lanes']}", flush=True)
