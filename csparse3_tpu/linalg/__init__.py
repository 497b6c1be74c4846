from .lu import SolvePlan, SparseLU, splu, spsolve  # noqa: F401
from .ordering import get_ordering, mindeg, natural, rcm  # noqa: F401
from .trisolve import (  # noqa: F401
    TriSolvePlan,
    level_schedule,
    lsolve,
    ltsolve,
    usolve,
    utsolve,
)
from .iterative import bicgstab, cg, gmres, ilu0_prec, jacobi_prec  # noqa: F401
from .refactor import RefactorPlan  # noqa: F401
from .banded import BandedSolvePlan, bandwidth  # noqa: F401
