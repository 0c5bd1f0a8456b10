from .index import Index, gennames, make_unique  # noqa: F401
from .frame import JlDataFrame  # noqa: F401
