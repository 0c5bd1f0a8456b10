from .datastream import DataStream, openstream, read_minibatch, stream_aggregate  # noqa: F401
from .sessionize import sessionize, sessionize_stream  # noqa: F401
