"""dataframes_jl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference DataFrames.jl fork,
re-expressed Spark-first (DataFrame / SQL / Catalyst / Structured
Streaming), plus large-scale training-data-pipeline operators.
"""

__version__ = "0.1.0"

from .core.cache import hold, release  # noqa: F401
from .core.frame import JlDataFrame  # noqa: F401
from .session import get_spark, load_table, load_tables, register_tables  # noqa: F401
