"""PII detection and redaction over text columns — the scrub step of a
training-data pipeline (emails, IPv4s, SSN-shaped ids, phone numbers).

Pure Catalyst: ``regexp_count`` / ``regexp_replace`` chains, JVM-side and
codegen'd — the whole scan rides the parquet reader with column pruning,
no Python in the hot path, trivially partition-parallel at 100 TB.

Pattern dialect discipline: every pattern below uses only syntax with
IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB oracle) — no
backreferences, no lookaround, ``\\b`` word boundaries (both engines
define word chars as [A-Za-z0-9_]), bounded repetition, plain character
classes.  Counts are taken BEFORE redaction; redaction applies the
patterns in a fixed order (emails, SSNs, IPv4s, phones) so overlapping
matches resolve identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, replacement) — order is the redaction order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}",
     "<PHONE>"),
]


def _redacted(col: Column) -> Column:
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return col


def pii_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-row PII match counts (``n_email``/``n_ssn``/``n_ipv4``/
    ``n_phone``), a ``has_pii`` flag, and the redacted text."""
    t = F.col(text_col)
    counts = {name: F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
              for name, pat, _ in PII_PATTERNS}
    out = df.select("*", *counts.values())
    any_hit = None
    for name in counts:
        c = F.col(f"n_{name}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    return out.select(
        "*",
        any_hit.alias("has_pii"),
        _redacted(t).alias("redacted"),
    )


def pii_metrics_sql(text_expr: str = "text") -> dict[str, str]:
    """The DuckDB rendering of the same metrics, one SQL expression per
    output column, built from the SAME pattern table so the dialects
    cannot drift."""
    exprs = {}
    for name, pat, _ in PII_PATTERNS:
        exprs[f"n_{name}"] = (
            f"len(regexp_extract_all({text_expr}, '{pat}'))")
    exprs["has_pii"] = " OR ".join(
        f"({e} > 0)" for e in
        (exprs[f"n_{n}"] for n, _, _ in PII_PATTERNS))
    red = text_expr
    for _, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    exprs["redacted"] = red
    return exprs
