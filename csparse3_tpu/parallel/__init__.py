from .partition import RowPartition, partition_rows  # noqa: F401
from .spmv import dist_spmm, dist_spmv, spmv_local  # noqa: F401
from .solve import BlockJacobi, dist_bicgstab, dist_cg  # noqa: F401
from .schur import SchurLU, SchurSolvePlan  # noqa: F401
from .banded import DistBandedLU  # noqa: F401
