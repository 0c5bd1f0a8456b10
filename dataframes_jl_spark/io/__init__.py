from .readtable import getseparator, read_rda, readtable, writetable  # noqa: F401
from .parquet import load_df, save  # noqa: F401
from .layout import file_prune_stats, zorder_code, zorder_write  # noqa: F401
