from .datastream import (  # noqa: F401
    DataStream,
    openstream,
    read_minibatch,
    stream_aggregate,
    stream_stream_join,
)
from .sessionize import sessionize, sessionize_stream  # noqa: F401
