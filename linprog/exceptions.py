"""Compat: reference ``linprog/exceptions.py`` (same six exception classes)."""

from linprog_tpu.status import (
    BasisIsDualInfeasibleError,
    BasisIsPrimalInfeasibleError,
    DualIsInfeasibleError,
    DualIsUnboundedError,
    PrimalIsInfeasibleError,
    PrimalIsUnboundedError,
)

__all__ = [
    "BasisIsPrimalInfeasibleError",
    "BasisIsDualInfeasibleError",
    "PrimalIsUnboundedError",
    "PrimalIsInfeasibleError",
    "DualIsUnboundedError",
    "DualIsInfeasibleError",
]
