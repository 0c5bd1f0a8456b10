from .na import na_agg, nafilter, nareplace  # noqa: F401
from .scalar import FUNCTION_TABLE, lift  # noqa: F401
