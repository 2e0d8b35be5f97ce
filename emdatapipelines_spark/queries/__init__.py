"""Driver-facing query suite: one named query per implemented operator from
SURVEY §2 (+ LLM-data extensions), each paired with an ANSI-SQL oracle that
DuckDB can run over the same parquet fixtures.

Import side effect: importing this package registers every query.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401
from . import relational  # noqa: F401,E402
from . import relational_ext  # noqa: F401,E402
from . import quality_queries  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
