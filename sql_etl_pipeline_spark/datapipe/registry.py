"""Query registry for the datapipe operators (same shape as
``analytics.queries``: Spark callable + ANSI-SQL DuckDB oracle)."""

from __future__ import annotations

from ..analytics.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, description=description)
        return fn

    return deco
