from . import scalar, vector  # noqa: F401
