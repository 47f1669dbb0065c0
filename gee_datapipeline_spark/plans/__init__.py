"""Query catalog: every implemented operator registered as a named query
with (where SQL-expressible) a DuckDB oracle for differential testing."""

from .registry import QUERIES, Query, queries, oracle_sql  # noqa: F401
