from . import features, regress, textsim  # noqa: F401
