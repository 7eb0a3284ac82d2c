from .collapse import latest_state  # noqa: F401
