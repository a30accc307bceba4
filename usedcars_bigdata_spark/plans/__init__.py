from .registry import ORACLES, QUERIES, query

# Import modules for their registration side effects.
from . import queries as _queries  # noqa: E402,F401
from . import extensions as _extensions  # noqa: E402,F401
from . import vehicles as _vehicles  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
