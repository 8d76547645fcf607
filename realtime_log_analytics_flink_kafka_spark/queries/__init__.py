"""Query registry: every implemented operator from SURVEY.md §2 (plus the
§7 scale extensions) as a named (Spark builder, DuckDB oracle SQL) pair.

The driver runs both sides at sf0.01 and compares row-count + schema +
order-insensitive value hash, so:

- every computed column is aliased identically in both dialects;
- float outputs are made cross-engine-deterministic (integer/decimal
  arithmetic inside aggregates, doubles only at the outermost step);
- timestamps are projected as epoch seconds (long) or formatted strings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One registry entry: a Spark query builder + its DuckDB oracle.

    ``sql=None`` marks genuinely non-SQL-expressible ops (the driver then
    records a weaker rows-only check).
    """
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]


def all_queries() -> dict[str, QuerySpec]:
    from . import advanced, reference, relational, pipeline
    out: dict[str, QuerySpec] = {}
    for mod in (reference, relational, pipeline, advanced):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
