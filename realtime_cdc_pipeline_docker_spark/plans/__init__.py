"""Query library: every operator from SURVEY.md §2, registered with its
DuckDB oracle SQL for the driver's correctness gate.

Importing this package populates ``REGISTRY``.
"""

from .registry import REGISTRY, QuerySpec, oracle_sql_map, queries_map  # noqa: F401

# Modules register queries at import time.
from . import relational  # noqa: F401, E402
from . import cdc_queries  # noqa: F401, E402
from . import events_queries  # noqa: F401, E402
from . import text_queries  # noqa: F401, E402
from . import similarity_queries  # noqa: F401, E402
from . import temporal_queries  # noqa: F401, E402
from . import pipeline_queries  # noqa: F401, E402
