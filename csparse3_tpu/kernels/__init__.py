from .bsr_spmm_pallas import bsr_spmm_pallas  # noqa: F401
from .dia_pallas import PallasDIA, SplitPallasDIA, dia_spmv_pallas  # noqa: F401
from .bandpoints import OffsetsPlan, SplitBandPoints, points_spmv_pallas  # noqa: F401
