from .catalog import QUERIES, Query, get_queries, get_oracles, query

# Importing these modules populates the registry via the @query decorator.
from . import relational  # noqa: E402,F401
from . import windows  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import opensky  # noqa: E402,F401
from . import streaming_queries  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import extended  # noqa: E402,F401

__all__ = ["QUERIES", "Query", "get_queries", "get_oracles", "query"]
