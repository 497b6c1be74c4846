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
