"""Compat: reference ``linprog/data_classes.py``."""

from linprog_tpu.results import LinProgResult

__all__ = ["LinProgResult"]
