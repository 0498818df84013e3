from .pallas_kernels import price_entering, ratio_eta_pivot

__all__ = ["price_entering", "ratio_eta_pivot"]
