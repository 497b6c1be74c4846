from . import arithmetic, construct, graph, matvec, norms, reductions, slicing, spgemm, stacking  # noqa: F401
