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
- Every integer aggregate in an oracle is wrapped in
  ``CAST(... AS BIGINT)``: DuckDB widens ``SUM(BIGINT)`` and windowed
  integer sums to HUGEINT (int128), which the driver's type-aware
  value-hash encodes differently from Spark's int64 even when every
  value is bit-identical — r6 shipped seven red rows this way while the
  local comparator (which collapses integer widths) stayed green.
  Enforced statically by the DESCRIBE-type allowlist gate in
  ``tests/test_queries_oracle.py`` (no HUGEINT/DECIMAL/LIST output
  columns in any hash-compared oracle).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# --- ns-robust events oracles -------------------------------------------
#
# The driver fixture's ``events.ts`` has drifted between parquet
# TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across generations.  The Spark
# loader truncates ns -> us at read time (sources/readers.py), but DuckDB
# reads the parquet natively, so on an ns fixture its timestamp
# inequality predicates (``ts >= t_click`` etc.) would compare at ns
# precision and diverge on boundary rows.  Every oracle reference to the
# ``events`` view is therefore rewritten at registration time into an
# inline subquery that casts ``ts`` to microsecond TIMESTAMP — DuckDB's
# TIMESTAMP_NS -> TIMESTAMP cast truncates, matching the Spark loader
# exactly, and is a no-op on a us-unit fixture.  (A shadowing CTE named
# ``events`` would be cleaner but DuckDB rejects self-named CTEs.)

_EVENTS_US = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"

#: tokens after ``FROM events`` that are NOT an alias
_NOT_ALIAS = frozenset(
    """where group order window left right inner outer full cross join on
    union lateral limit having qualify using natural semi anti positional
    asof intersect except select with""".split()
)


def _ns_robust(oracle: str | None) -> str | None:
    """Rewrite ``FROM/JOIN events [AS] [alias]`` to scan a us-normalized
    inline subquery.  Preserves any alias; supplies ``AS events`` when
    the reference is unaliased so downstream qualified names still bind."""
    if oracle is None or not re.search(r"\b(?:FROM|JOIN)\s+events\b", oracle, re.I):
        return oracle

    def repl(m: re.Match) -> str:
        kw, nxt = m.group(1), m.group(2)
        if nxt and nxt.lower() not in _NOT_ALIAS:
            return f"{kw} {_EVENTS_US} AS {nxt}"
        tail = f" {nxt}" if nxt else ""
        return f"{kw} {_EVENTS_US} AS events{tail}"

    return re.sub(
        r"\b(FROM|JOIN)\s+events\b(?:\s+(?:AS\s+)?(\w+))?",
        repl,
        oracle,
        flags=re.IGNORECASE,
    )


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    tags: list[str] = field(default_factory=list)  # SURVEY §2 operator ids
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}

#: Queries RETIRED from the driver-facing registry (r13, rotation-slack
#: budget: 199 queries in a 50-slot verification window left zero slack,
#: so registering anything new pushed an already-4-round freshness tail
#: past the staleness bound).  Retirees are near-duplicate twins whose
#: capability claim another registered query carries; they keep their
#: oracle and stay LOCALLY verified (tests/test_queries_oracle.py
#: parametrizes REGISTRY ∪ RETIRED) — only the driver's rotated window
#: no longer spends slots on them.
RETIRED: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    tags: list[str] | None = None,
    doc: str = "",
    retired: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry (or the RETIRED shelf)."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY or name in RETIRED:
            raise ValueError(f"duplicate query name: {name}")
        (RETIRED if retired else REGISTRY)[name] = QueryDef(
            name=name,
            fn=fn,
            oracle=_ns_robust(oracle),
            tags=tags or [],
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return wrap
