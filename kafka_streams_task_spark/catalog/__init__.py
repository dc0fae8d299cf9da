"""Query catalog: every operator the engine claims, as a named query over the
driver test tables, paired with an ANSI-SQL DuckDB oracle where the semantics
are SQL-expressible (driver contract, __spark_entry__.py).
"""

from __future__ import annotations

from .registry import CATALOG, QuerySpec, query

# import for side effect: each module registers its queries into CATALOG
from . import relational  # noqa: E402,F401
from . import pipeline  # noqa: E402,F401
from . import llm  # noqa: E402,F401

__all__ = ["CATALOG", "QuerySpec", "query"]
