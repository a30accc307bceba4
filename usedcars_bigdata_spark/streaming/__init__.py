from . import dedup, events, joins, sinks, stateful, statestore  # noqa: F401
