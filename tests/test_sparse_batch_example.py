"""The sparse-batch example must run end-to-end: all lanes optimal,
HiGHS agreement (the shared-pattern sparse PDHG path on a structured,
degenerate family with a redundant equality row)."""

import runpy
import sys


def test_sparse_batch_example(capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["sparse_batch.py", "16", "6", "8"])
    runpy.run_path("examples/sparse_batch.py", run_name="__main__")
    out = capsys.readouterr().out
    assert "optimal: 16/16" in out
