from .datastream import DataStream, openstream, read_minibatch, stream_aggregate  # noqa: F401
