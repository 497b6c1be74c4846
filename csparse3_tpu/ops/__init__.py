from . import arithmetic, bsr_ops, construct, graph, matvec, norms, reductions, slicing, spgemm, spgemm_device, stacking  # noqa: F401
