from .readtable import getseparator, readtable, writetable  # noqa: F401
from .parquet import load_df, save  # noqa: F401
