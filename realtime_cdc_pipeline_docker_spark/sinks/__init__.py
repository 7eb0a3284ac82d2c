from .mart import read_mart, write_mart  # noqa: F401
