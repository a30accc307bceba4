from . import events, joins, sinks, stateful  # noqa: F401
