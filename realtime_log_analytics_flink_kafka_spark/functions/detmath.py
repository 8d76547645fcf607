"""Deterministic cross-engine float arithmetic.

The driver's correctness gate hashes query output values, so every float
an operator emits must be BIT-IDENTICAL between Spark (JVM) and the
DuckDB oracle.  Two primitive classes break that:

1. ``round(int/int, k)`` — Spark rounds doubles through BigDecimal's
   shortest-repr HALF_UP; DuckDB scales-and-rounds the raw double.  They
   disagree on quotients a few ulp from a half boundary (real sf0.01
   corpora contain such documents; see VERDICT r3 on curation_report).
   Fix: :func:`exact_round_div` — do the rounding in BIGINT arithmetic,
   where both engines are exact, and divide by the power of ten at the
   very end (IEEE division of identical integers is correctly rounded,
   hence identical).

2. ``ln`` — JVM ``Math.log`` and DuckDB's libm ``log`` differ by 1 ulp
   on ~7.5% of inputs (measured on 200k corpus-like ratios in this
   image).  No amount of post-rounding fully absorbs that: ``round(x, 12)``
   itself diverges cross-engine on ~0.1% of values.  Fix:
   :func:`det_ln_ratio` — evaluate ln as an IDENTICAL arithmetic DAG on
   both engines: integer power-of-two range reduction (BIGINT compare
   ladder), then the atanh Taylor series with literal double
   coefficients.  Per-operation IEEE doubles are exact-rounded and both
   engines interpret one expression node at a time (no FMA contraction
   across nodes), so identical DAG in, identical 64 bits out.

Every generator here emits BOTH dialects from the same constants, so the
Spark expression and the oracle SQL cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: repr of the double nearest ln 2 — the literal is embedded in both
#: dialects, parsing to the identical binary64 on both engines.
LN2 = 0.6931471805599453

#: atanh series 1/(2i+1) terms: with the argument t = (m-1)/(m+1) bounded
#: by 1/3 (m in [1,2)), 19 terms truncate below 3^-39/39 ~ 6e-21 — far
#: under double precision.  More terms would change nothing; fewer would
#: make the value depend on the truncation point visibly.
_N_TERMS = 19
_COEFFS = [1.0 / (2 * i + 1) for i in range(_N_TERMS)]

#: Highest bit position probed by the range-reduction ladder; 62 covers
#: every positive int64 quotient.
_MAX_BIT = 62


def int_div(a: Column, b: Column) -> Column:
    """Integral division (Spark's ``div``) — truncates toward zero,
    exactly like DuckDB's ``//`` on BIGINT, so both engines agree on
    every operand sign."""
    return F.call_function("div", a, b)


def exact_round_div(num: Column, den: Column, scale: int = 4) -> Column:
    """``round(num / den, scale)`` for integer columns, computed entirely
    in BIGINT arithmetic: ``(2·num·10^scale + sign(num)·den) div (2·den)``
    is the half-away-from-zero rounding of the exact rational, and the
    final ``/10^scale`` double division is IEEE-correctly-rounded from
    identical integers in every engine.  NULL when ``den`` is 0/NULL.

    Overflow bound: |num|·2·10^scale must fit in int64, i.e.
    |num| < 4.6e14 at scale 4 — per-document counts stay orders of
    magnitude below that even for gigabyte documents.
    """
    p = 10 ** scale
    num = num.cast("long")
    den = den.cast("long")
    sgn = F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
    s = int_div(2 * num * F.lit(p) + sgn * den, 2 * den)
    return F.when(den > 0, s.cast("double") / F.lit(float(p)))


def exact_round_div_sql(num: str, den: str, scale: int = 4) -> str:
    """DuckDB mirror of :func:`exact_round_div` — sign-aware by default.

    The negative branch routes through ``-(round(-num/den))`` so every
    ``//`` operand stays non-negative, where floor and truncation agree;
    this sidesteps the floor-vs-trunc divergence between DuckDB ``//``
    and Spark ``div`` on negative operands entirely (r5 driver red:
    ``curation_report``'s ``sum(q_e4)`` went negative for an
    all-punctuation source and the former non-negative-only form gave
    -0.1757 vs Spark's -0.1758).  For ``num >= 0`` the CASE picks the
    exact expression the pre-r6 generator emitted, so non-negative call
    sites are value-identical.  Emit inside a ``CASE WHEN den > 0``
    guard if the denominator can be zero."""
    p = 10 ** scale
    pos = f"(2*({num})*{p} + ({den})) // (2*({den}))"
    neg = f"-((2*(-({num}))*{p} + ({den})) // (2*({den})))"
    return (f"(CAST(CASE WHEN ({num}) < 0 THEN {neg} ELSE {pos} END"
            f" AS DOUBLE) / {p}.0)")


def with_det_ln(df: "DataFrame", num: Column, den: Column, out: str,
                pfx: str = "_dl") -> "DataFrame":
    """Add column ``out`` = deterministic ``ln(num/den)`` (see
    :func:`det_ln_ratio` for the algorithm and the bit-parity contract).

    STAGED through named intermediate columns, which is the form every
    hot path must use: the single-Column variant duplicates subtrees
    combinatorially (the Horner chain references t² 18×, t² references t
    twice, t embeds the 62-way CASE ladder twice → a ~40k-node tree),
    whole-stage codegen hits the JVM method-size limit and falls back to
    interpreted evaluation — measured 5-25× slowdowns at sf0.1.  Here
    each intermediate is evaluated ONCE per row; Catalyst's
    CollapseProject keeps multiply-referenced non-cheap aliases staged
    rather than re-inlining them.
    """
    c = {
        f"{pfx}_num": num.cast("long"),
        f"{pfx}_den": den.cast("long"),
    }
    df = df.withColumns(c)
    n, d = F.col(f"{pfx}_num"), F.col(f"{pfx}_den")
    df = df.withColumns({
        f"{pfx}_a": F.greatest(n, d),
        f"{pfx}_b": F.least(n, d),
        f"{pfx}_s": F.when(n < d, F.lit(-1.0)).otherwise(F.lit(1.0)),
    })
    a, b = F.col(f"{pfx}_a"), F.col(f"{pfx}_b")
    df = df.withColumn(f"{pfx}_q", int_div(a, b))
    q = F.col(f"{pfx}_q")
    p2 = F.when(q >= F.lit(2 ** _MAX_BIT), F.lit(float(2 ** _MAX_BIT)))
    kd = F.when(q >= F.lit(2 ** _MAX_BIT), F.lit(float(_MAX_BIT)))
    for j in range(_MAX_BIT - 1, 0, -1):
        p2 = p2.when(q >= F.lit(2 ** j), F.lit(float(2 ** j)))
        kd = kd.when(q >= F.lit(2 ** j), F.lit(float(j)))
    df = df.withColumns({
        f"{pfx}_p2": p2.otherwise(F.lit(1.0)),
        f"{pfx}_k": kd.otherwise(F.lit(0.0)),
    })
    df = df.withColumn(
        f"{pfx}_m",
        a.cast("double") / (b.cast("double") * F.col(f"{pfx}_p2")))
    m = F.col(f"{pfx}_m")
    df = df.withColumn(f"{pfx}_t", (m - F.lit(1.0)) / (m + F.lit(1.0)))
    t = F.col(f"{pfx}_t")
    df = df.withColumn(f"{pfx}_t2", t * t)
    t2 = df[f"{pfx}_t2"]
    poly = F.lit(_COEFFS[-1])
    for cf in reversed(_COEFFS[:-1]):
        poly = F.lit(cf) + t2 * poly
    df = df.withColumn(
        out,
        F.col(f"{pfx}_s")
        * (F.col(f"{pfx}_k") * F.lit(LN2) + F.lit(2.0) * t * poly))
    return df.drop(*[name for name in df.columns
                     if name.startswith(pfx + "_")])


def det_ln_ratio(num: Column, den: Column) -> Column:
    """Bit-identical-across-engines ``ln(num/den)`` for POSITIVE integer
    columns (either side may be larger; ``ln(x<1)`` comes out negative
    via swap-and-negate).

    Pipeline (every step an exact or correctly-rounded IEEE operation on
    values both engines hold identically):

    - a, b = max/min(num, den); s = ±1 — so the reduced ratio is ≥ 1
    - q = a div b; k = floor(log2 q) and 2^k via a BIGINT compare ladder
      (no libm); since b·2^k ≤ a ≤ 2^62, nothing overflows
    - m = a / (b·2^k) ∈ [1, 2): the casts are exact (counts < 2^53) and
      multiplying by a power of two only shifts the exponent
    - t = (m−1)/(m+1) ∈ [0, 1/3); ln m = 2t·Σ t^(2i)/(2i+1) by Horner
      with literal coefficients
    - ln(num/den) = s·(k·ln2 + ln m)

    The result differs from the correctly-rounded ln by a few ulp — and
    by ZERO ulp between the two engines, which is what the oracle hash
    needs.  See the SQL twin :func:`det_ln_sql_items`.
    """
    num = num.cast("long")
    den = den.cast("long")
    a = F.greatest(num, den)
    b = F.least(num, den)
    s = F.when(num < den, F.lit(-1.0)).otherwise(F.lit(1.0))
    q = int_div(a, b)

    p2 = F.when(q >= F.lit(2 ** _MAX_BIT), F.lit(float(2 ** _MAX_BIT)))
    kd = F.when(q >= F.lit(2 ** _MAX_BIT), F.lit(float(_MAX_BIT)))
    for j in range(_MAX_BIT - 1, 0, -1):
        p2 = p2.when(q >= F.lit(2 ** j), F.lit(float(2 ** j)))
        kd = kd.when(q >= F.lit(2 ** j), F.lit(float(j)))
    p2 = p2.otherwise(F.lit(1.0))
    kd = kd.otherwise(F.lit(0.0))

    m = a.cast("double") / (b.cast("double") * p2)
    t = (m - F.lit(1.0)) / (m + F.lit(1.0))
    t2 = t * t
    poly = F.lit(_COEFFS[-1])
    for c in reversed(_COEFFS[:-1]):
        poly = F.lit(c) + t2 * poly
    return s * (kd * F.lit(LN2) + F.lit(2.0) * t * poly)


#: repr of the double nearest 1/ln2 — same literal embedded in both
#: dialects (see LN2).
INV_LN2 = 1.4426950408889634

#: exp(r) Taylor terms 1/i!.  |r| ≤ ln2/2 ≈ 0.3466 after range
#: reduction, so the i=15 tail is below 0.3466^15/15! ≈ 9e-20 — far
#: under double precision; more terms would change nothing.
_EXP_N_TERMS = 15
_EXP_COEFFS: list[float] = []
_f = 1.0
for _i in range(_EXP_N_TERMS):
    _EXP_COEFFS.append(1.0 / _f)
    _f *= _i + 1

#: |k| bound for the 2^k reconstruction ladder: exp arguments beyond
#: ±44·ln2 ≈ ±30.5 do not arise from α·ln(int64 counts); the guard keeps
#: the CASE ladder small and makes out-of-range inputs NULL, not wrong.
_EXP_MAX_K = 64


def with_det_exp(df: "DataFrame", x: Column, out: str,
                 pfx: str = "_de") -> "DataFrame":
    """Add column ``out`` = deterministic ``exp(x)`` — the inverse twin
    of :func:`with_det_ln`, evaluated as an IDENTICAL arithmetic DAG on
    both engines so the 64-bit result matches bit for bit:

    - k = floor(x·(1/ln2) + 1/2) — nearest integer; multiply/add are
      correctly-rounded IEEE ops on identical doubles, floor is exact
    - r = x − k·ln2 ∈ ~[−ln2/2, ln2/2]
    - exp(r) by the 15-term Taylor series with literal 1/i! coefficients
      (Horner), exp(x) = 2^k·exp(r); 2^k is a literal-double CASE ladder
      on the BIGINT k (cf. det_ln_ratio's range reduction, run backward)

    The result differs from correctly-rounded exp by a few ulp — and by
    ZERO ulp between engines.  |k| > 64 yields NULL (arguments that
    large don't arise from α·ln over int64 counts).  STAGED through
    named columns like with_det_ln — the Horner chain references r 14×,
    so the inline form would duplicate the k/r subtrees combinatorially.

    Composition ``exp(α · ln(num/den))`` — via with_det_ln then this —
    is the deterministic power ``(num/den)^α`` for arbitrary α, e.g.
    temperature-scaled mixture weights (queries/pipeline.py:
    mixture_temperature_sweep)."""
    df = df.withColumn(f"{pfx}_x", x)
    xv = F.col(f"{pfx}_x")
    df = df.withColumn(
        f"{pfx}_k",
        F.floor(xv * F.lit(INV_LN2) + F.lit(0.5)).cast("long"))
    k = F.col(f"{pfx}_k")
    df = df.withColumn(f"{pfx}_r", xv - k.cast("double") * F.lit(LN2))
    r = F.col(f"{pfx}_r")
    poly = F.lit(_EXP_COEFFS[-1])
    for c in reversed(_EXP_COEFFS[:-1]):
        poly = F.lit(c) + r * poly
    df = df.withColumn(f"{pfx}_p", poly)
    p2 = F.when(k == F.lit(-_EXP_MAX_K), F.lit(float(2.0 ** -_EXP_MAX_K)))
    for j in range(-_EXP_MAX_K + 1, _EXP_MAX_K + 1):
        p2 = p2.when(k == F.lit(j), F.lit(float(2.0 ** j)))
    df = df.withColumn(out, F.col(f"{pfx}_p") * p2)
    return df.drop(*[name for name in df.columns
                     if name.startswith(pfx + "_")])


def det_exp_sql_items(x: str, out: str, pfx: str = "_de") -> str:
    """DuckDB select-list fragment mirroring :func:`with_det_exp` via
    lateral column aliases — identical literals and operation order
    (same constants), which is the bit-parity contract."""
    def dlit(v: float) -> str:
        return f"CAST('{v!r}' AS DOUBLE)"

    p2_case = ("CASE " + " ".join(
        f"WHEN {pfx}_k = {j} THEN {dlit(float(2.0 ** j))}"
        for j in range(-_EXP_MAX_K, _EXP_MAX_K + 1)) + " ELSE NULL END")
    poly = dlit(_EXP_COEFFS[-1])
    for c in reversed(_EXP_COEFFS[:-1]):
        poly = f"({dlit(c)} + ({pfx}_r * {poly}))"
    return ",\n           ".join([
        f"({x}) AS {pfx}_x",
        f"CAST(floor(({pfx}_x * {dlit(INV_LN2)}) + {dlit(0.5)}) AS BIGINT)"
        f" AS {pfx}_k",
        f"{pfx}_x - (CAST({pfx}_k AS DOUBLE) * {dlit(LN2)}) AS {pfx}_r",
        f"{poly} AS {pfx}_p",
        f"{pfx}_p * ({p2_case}) AS {out}",
    ])


def det_ln_sql_items(num: str, den: str, out: str, pfx: str = "_ln") -> str:
    """DuckDB select-list fragment computing :func:`det_ln_ratio` via
    lateral column aliases — append to a SELECT list; the final item is
    aliased ``out``.  ``num``/``den`` are SQL expressions for positive
    BIGINTs.  The emitted literals and operation order mirror the Spark
    expression exactly (same constants module), which is the whole point.
    """
    def dlit(v: float) -> str:
        # string-quoted cast: DuckDB parses bare numeric literals as
        # DECIMAL (wrong arithmetic type) and truncates past ~16
        # fractional digits; the string path is correctly-rounded strtod
        return f"CAST('{v!r}' AS DOUBLE)"

    p2_case = ("CASE " + " ".join(
        f"WHEN {pfx}_q >= {2 ** j} THEN {dlit(float(2 ** j))}"
        for j in range(_MAX_BIT, 0, -1)) + f" ELSE {dlit(1.0)} END")
    kd_case = ("CASE " + " ".join(
        f"WHEN {pfx}_q >= {2 ** j} THEN {dlit(float(j))}"
        for j in range(_MAX_BIT, 0, -1)) + f" ELSE {dlit(0.0)} END")
    poly = dlit(_COEFFS[-1])
    for c in reversed(_COEFFS[:-1]):
        poly = f"({dlit(c)} + ({pfx}_t2 * {poly}))"
    return ",\n           ".join([
        f"greatest(({num}), ({den})) AS {pfx}_a",
        f"least(({num}), ({den})) AS {pfx}_b",
        f"CASE WHEN ({num}) < ({den}) THEN {dlit(-1.0)}"
        f" ELSE {dlit(1.0)} END AS {pfx}_s",
        f"{pfx}_a // {pfx}_b AS {pfx}_q",
        f"{p2_case} AS {pfx}_p2",
        f"{kd_case} AS {pfx}_k",
        f"CAST({pfx}_a AS DOUBLE) / (CAST({pfx}_b AS DOUBLE) * {pfx}_p2)"
        f" AS {pfx}_m",
        f"({pfx}_m - {dlit(1.0)}) / ({pfx}_m + {dlit(1.0)}) AS {pfx}_t",
        f"{pfx}_t * {pfx}_t AS {pfx}_t2",
        f"{pfx}_s * (({pfx}_k * {dlit(LN2)}) + (({dlit(2.0)} * {pfx}_t)"
        f" * {poly})) AS {out}",
    ])


def det_round(x: Column, scale: int) -> Column:
    """Cross-engine-exact ``round(x, scale)`` (half away from zero) for a
    DOUBLE whose bits are already identical on both engines.

    Engine-native rounding is NOT cross-engine exact even then: Spark
    routes doubles through BigDecimal-of-shortest-repr HALF_UP while
    DuckDB scales-and-rounds the raw binary64, and they disagree on
    values a few ulp from a half boundary (measured ~0.1% at scale 12;
    the module docstring's class 1).  This twin evaluates the SAME IEEE
    DAG on both engines instead: ``s * floor(|x|*10^k + 0.5) / 10^k`` —
    multiply, add, floor, divide are all individually correctly-rounded
    operations on identical inputs, so the 64-bit result matches bit for
    bit.  (It may differ from either engine's native round on exactly
    those boundary values — consistently on both sides, which is what
    the oracle hash needs.)

    Precondition: |x|*10^scale < 2^53 (float-exact integer range) — true
    for every score/ratio/similarity this repo rounds.
    """
    p = F.lit(float(10 ** scale))
    # signum, not a CASE on x: references x twice instead of three
    # times, and the argument is often an expensive subtree (a full
    # vector fold in the similarity family — the r5 determinism tax).
    # The trailing +0.0 normalizes the sign of zero: signum(-0.0) is
    # -0.0 on Spark (so a zero-magnitude result would be -0.0) while
    # the SQL twin's CASE ('x < 0' is false for -0.0) yields +0.0 —
    # IEEE (-0.0 + 0.0) == +0.0 and x + 0.0 == x for every other x,
    # so both dialects carry the same +0.0 term and emit +0.0 for ANY
    # zero-magnitude result (including a tiny-negative x that floors
    # to zero, where BOTH engines would otherwise emit -0.0).
    return (F.signum(x)
            * F.floor(F.abs(x) * p + F.lit(0.5)).cast("double") / p
            + F.lit(0.0))


def det_round_sql(x: str, scale: int) -> str:
    """DuckDB twin of :func:`det_round` — same constants, same operation
    order.  ``x`` is interpolated three times; keep it an alias (CTE /
    lateral column) when it is expensive."""
    p = f"CAST('{float(10 ** scale)!r}' AS DOUBLE)"
    return (f"(((CASE WHEN ({x}) < 0 THEN CAST('-1.0' AS DOUBLE)"
            f" ELSE CAST('1.0' AS DOUBLE) END"
            f" * floor(abs({x}) * {p} + CAST('0.5' AS DOUBLE))) / {p})"
            f" + CAST('0.0' AS DOUBLE))")


#: Highest bit the ceil_pow2 ladder covers: 2^42 prefix positions is
#: ~4.4e12 documents — beyond any corpus while keeping the CASE ladder
#: short enough for codegen.
_CEIL_POW2_MAX_BIT = 42


def ceil_pow2(x: Column) -> Column:
    """Smallest power of two ≥ ``x`` for a POSITIVE BIGINT column, as a
    literal BIGINT compare ladder — no libm log2 (whose rounding could
    put an exact power on the wrong side on one engine).  Used to
    range-bucket monotone positions into log-spaced prefix checkpoints
    (operators/text.heaps_law_fit).  See :func:`ceil_pow2_sql`."""
    out = F.when(x <= 1, F.lit(1))
    for j in range(1, _CEIL_POW2_MAX_BIT + 1):
        out = out.when(x <= F.lit(2 ** j), F.lit(2 ** j))
    return out.otherwise(F.lit(2 ** (_CEIL_POW2_MAX_BIT + 1))).cast("long")


def ceil_pow2_sql(x: str) -> str:
    """DuckDB twin of :func:`ceil_pow2` (same ladder constants)."""
    branches = " ".join(
        f"WHEN ({x}) <= {2 ** j} THEN {2 ** j}"
        for j in range(0, _CEIL_POW2_MAX_BIT + 1))
    return (f"CAST(CASE WHEN ({x}) <= 1 THEN 1 {branches}"
            f" ELSE {2 ** (_CEIL_POW2_MAX_BIT + 1)} END AS BIGINT)")
