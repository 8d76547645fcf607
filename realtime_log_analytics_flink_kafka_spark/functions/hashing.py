"""Deterministic, cross-engine-reproducible hashing.

Spark's native hash()/xxhash64 and DuckDB's hash() are different
algorithms, so oracle-checked dedup/similarity operators hash via md5 —
identical bytes on both engines — then fold 15 hex chars (60 bits, fits a
signed 64-bit int) to a bigint:

  Spark : conv(substr(md5(x), 1, 15), 16, 10)::bigint
  DuckDB: ('0x' || substr(md5(x), 1, 15))::bigint

At 100 TB scale md5 is ~2-3x slower than xxhash64; production would flip
``md5_long`` to xxhash64 (one line) and drop oracle parity — determinism
across engines is a test-harness property, not an engine property.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1; affine MinHash permutations mod this keep
#: products within 62 bits (no 64-bit overflow on either engine).
HASH_PRIME = 2_147_483_647


def md5_long(col: Column) -> Column:
    """String -> deterministic 60-bit positive bigint (md5-folded)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long` for oracle SQL."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _md5_int(s: str) -> int:
    """Driver-side twin of md5_long for generating deterministic
    constants (e.g. Rademacher hyperplanes) — folds the same 15 hex
    chars, so a SQL oracle can regenerate identical values."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def affine_hashes(n: int) -> list[tuple[int, int]]:
    """n fixed affine permutations (a, b) for MinHash: h_i(x) = (a_i*(x mod P) + b_i) mod P.

    Deterministic small odd constants — seeded once, identical in the
    Spark operator and the SQL oracle.
    """
    return [(2 * i + 3, 5 * i + 1) for i in range(n)]
