from .cholesky import LDLTSolvePlan, SparseLDLT, ldlt  # noqa: F401
from .lu import SolvePlan, SparseLU, splu, spsolve  # noqa: F401
from .ordering import amd, get_ordering, mindeg, natural, nd, rcm  # noqa: F401
from .btf import BTFLU, btf, btf_splu, max_transversal  # noqa: F401
from .trisolve import (  # noqa: F401
    TriSolvePlan,
    level_schedule,
    lsolve,
    ltsolve,
    usolve,
    utsolve,
)
from .iterative import (  # noqa: F401
    bicgstab,
    cg,
    gmres,
    ilu0_prec,
    jacobi_prec,
    refine,
)
from .refactor import RefactorPlan  # noqa: F401
from .supernodal import SupernodalRefactor  # noqa: F401
from .multifrontal import MultifrontalLU, MultifrontalRefactor  # noqa: F401
from .banded import (  # noqa: F401
    BandedLU,
    BandedRefactor,
    BandedSolvePlan,
    ComplexBandedSolve,
    bandwidth,
)
from .spike_stream import StreamedSPIKE  # noqa: F401
