from .joins import join  # noqa: F401
from .grouping import by, colwise, groupby  # noqa: F401
from .sorting import order, sort  # noqa: F401
from .setops import hcat, vcat  # noqa: F401
from .reshape import cut, melt, paste_columns, pivot_table, stack, unstack  # noqa: F401
