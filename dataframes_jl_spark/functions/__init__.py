from .na import na_agg, nafilter, nareplace  # noqa: F401
from .scalar import FUNCTION_TABLE, lift  # noqa: F401
from .stats import roc_auc  # noqa: F401
from .timeseries import interpolate_linear  # noqa: F401
from .stats import average_precision  # noqa: F401
from .survival import kaplan_meier  # noqa: F401
