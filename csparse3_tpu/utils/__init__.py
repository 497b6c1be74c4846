from .hostmem import flush_subnormals  # noqa: F401
from .misc import dense_to_str, slice_to_range  # noqa: F401
from .xfer import split, splitc, unsplit  # noqa: F401
