from .datastream import (  # noqa: F401
    DataStream,
    openstream,
    read_minibatch,
    stream_aggregate,
    stream_stream_join,
)
from .datastream import dedup_stream  # noqa: F401
from .sessionize import sessionize, sessionize_stream  # noqa: F401
from .datastream import curate_stream  # noqa: F401
from .topk import heavy_hitters_stream, merge_hh_snapshots  # noqa: F401
from .distinct import distinct_stream, merge_distinct_snapshots  # noqa: F401
from .drift import drift_stream, merge_drift_snapshots  # noqa: F401
from .quantile import merge_sample_snapshots, quantile_sample_stream  # noqa: F401
