from . import dedup, events, joins, sinks, stateful  # noqa: F401
