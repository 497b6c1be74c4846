from .contingency import ACContingency, DCContingency  # noqa: F401
from .grids import Grid, connectivity, ieee14, synthetic_grid, ybus  # noqa: F401
from .matpower import load_case, parse_case  # noqa: F401
from .powerflow import FastDecoupled, dc_power_flow, newton_raphson, sbus  # noqa: F401
