"""Data-layout operators: Morton (Z-order) keys and Z-ordered writes.

At 100 TB the scan pattern is decided before the first query runs — by
how files are laid out.  Sorting on a single column clusters one
predicate dimension and shreds the other; interleaving the bits of two
bucketized columns (the Morton / Z-order curve) bounds the spread of
BOTH dimensions inside every contiguous key range, which is what makes
``WHERE x BETWEEN … AND y BETWEEN …`` prune files on either predicate.
This is the layout trick behind Delta/Iceberg ``ZORDER BY`` — here as a
plain Catalyst expression plus a range-partitioned sorted write, no
table format required.

The key is built from shift-free integer arithmetic (``div``/``%``/
``·2^k``) so the identical expression runs on any engine (DuckDB's
oracle twin uses the same ANSI operators; no engine-specific bit
intrinsics), stays inside whole-stage codegen, and is trivially
deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.detmath import int_div

#: Default per-dimension resolution: 8 bits = 256 buckets per axis,
#: 65536 cells — file-count-scale, not row-scale, which is the right
#: granularity for layout keys (finer keys buy nothing once a key range
#: maps to less than one file).
DEFAULT_BITS = 8


def morton_key(x: Column, y: Column, bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Z-order key: bit i of ``x`` lands at position 2i,
    bit i of ``y`` at 2i+1.  Inputs must already be bucketized to
    ``[0, 2^bits)`` — compose with a width-bucket expression.

    Arithmetic form (no shift intrinsics): bit i of v is
    ``(v div 2^i) % 2``; its contribution is that times ``2^(2i)`` (or
    ``2^(2i+1)``).  2·bits literal terms, folded left-to-right — the
    same expression text the DuckDB oracle runs (see
    :func:`morton_key_sql`).
    """
    def bit_terms(v: Column, offset: int) -> list[Column]:
        return [
            (int_div(v, F.lit(1 << i)) % F.lit(2)) * F.lit(1 << (2 * i + offset))
            for i in range(bits)
        ]

    terms = bit_terms(x.cast("long"), 0) + bit_terms(y.cast("long"), 1)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_key_sql(x: str, y: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB twin of :func:`morton_key` — same arithmetic, same term
    order.  ``x``/``y`` are SQL expressions for non-negative BIGINTs in
    ``[0, 2^bits)``; keep them aliases, each is referenced ``bits``
    times."""
    terms = [
        f"((({x}) // {1 << i}) % 2) * {1 << (2 * i)}" for i in range(bits)
    ] + [
        f"((({y}) // {1 << i}) % 2) * {1 << (2 * i + 1)}" for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def write_zordered(df: DataFrame, x: Column, y: Column, path: str,
                   bits: int = DEFAULT_BITS, num_files: int = 0) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    ``(x, y)``: range-partition on the Morton key (contiguous key
    ranges per file — a RangePartitioner sample pass, not a hash
    shuffle) and sort within partitions, so every output file covers a
    bounded rectangle of the (x, y) space and min/max column statistics
    prune on either predicate.

    ``num_files=0`` keeps the session's shuffle parallelism.
    """
    keyed = df.withColumn("_zkey", morton_key(x, y, bits))
    parts = [F.col("_zkey")]
    ranged = (keyed.repartitionByRange(num_files, *parts) if num_files
              else keyed.repartitionByRange(*parts))
    (ranged.sortWithinPartitions("_zkey").drop("_zkey")
     .write.mode("overwrite").parquet(path))
