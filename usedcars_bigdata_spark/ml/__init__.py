from . import features, prep, regress, textsim  # noqa: F401
