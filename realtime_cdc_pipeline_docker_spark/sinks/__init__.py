from .mart import compact_mart_partitions, read_mart, write_mart  # noqa: F401
