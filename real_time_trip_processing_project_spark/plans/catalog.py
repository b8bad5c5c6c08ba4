"""Query registry: one entry per declared operator (SURVEY.md §2).

Each :class:`QueryDef` couples the Spark DataFrame builder with the
equivalent ANSI-SQL oracle that DuckDB runs on the same parquet tables.
Conventions that keep the driver's order-insensitive value-hash stable
across the two engines:

- Every computed/aggregate column is aliased identically on both sides.
- Float aggregates are rounded on BOTH sides (2 decimals for money-scale
  values, more for ratios/cosines) so summation-order double noise cannot
  flip the hash.
- No nondeterministic outputs (no current_timestamp in declared queries;
  top-k queries carry a total tie-break key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: list[str] = field(default_factory=list)  # SURVEY §2 operator ids
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(
    name: str, oracle: str | None, tags: list[str] | None = None, doc: str = ""
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name, fn=fn, oracle=oracle, tags=tags or [], doc=doc or (fn.__doc__ or "")
        )
        return fn

    return wrap
