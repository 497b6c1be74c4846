from .bsr_spmm_pallas import bsr_spmm_pallas  # noqa: F401
