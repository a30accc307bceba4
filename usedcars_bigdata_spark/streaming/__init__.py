from . import events, sinks, stateful  # noqa: F401
