from .pipeline import run_cdc_stream, run_multi_table_streams  # noqa: F401
