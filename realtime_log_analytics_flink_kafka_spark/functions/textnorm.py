"""Cross-engine-exact text normalization primitives.

The correctness gate hashes query values across Spark (Java regex, JVM
case mapping) and the DuckDB oracle (RE2 regex, utf8proc case mapping).
Two engine-native primitives are NOT cross-engine exact, measured on
this image (VERDICT r4):

1. ``\\s`` — Java's default ``\\s`` is ``[ \\t\\n\\x0B\\f\\r]`` (includes
   vertical tab U+000B); RE2's ``\\s`` is ``[ \\t\\n\\f\\r]`` (excludes
   it).  A document containing U+000B tokenizes differently per engine,
   and every downstream count (n_tokens, n_punct, segment texts, shingle
   hashes) diverges.
2. ``lower()`` — Java implements full Unicode SpecialCasing:
   ``lower('İ')`` (U+0130) is ``i`` + COMBINING DOT ABOVE (2 codepoints)
   and final-sigma Σ is contextual; DuckDB's utf8proc does simple 1:1
   folding (``lower('İ') = 'i'``).  Token strings diverge on such input.

Fix by construction, not by patching examples: every tokenization /
normalization path in BOTH dialects uses

- an EXPLICIT whitespace class :data:`WS_REGEX` — ``[ \\t\\n\\f\\r\\x0B]``
  spelled out, so both regex engines see the identical set (the escape
  sequences ``\\t \\n \\f \\r \\x0B`` parse identically in Java regex and
  RE2); no engine-default ``\\s`` anywhere in an oracle-paired path;
- ASCII-only lowercasing :func:`ascii_lower` / :func:`ascii_lower_sql`
  via ``translate`` over the 26 ASCII letters — a pure codepoint map
  with no locale/contextual behavior in either engine.  Non-ASCII
  letters keep their case (identically on both sides), which is the
  price of determinism; stopword lists and the quality regexes are
  ASCII anyway.

Both dialects are generated from the SAME Python constants below, so
they cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UPPER_ASCII = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
LOWER_ASCII = "abcdefghijklmnopqrstuvwxyz"

#: Characters both engines must treat as token separators, as an
#: in-class regex fragment.  U+000B is listed explicitly — it is the one
#: code point on which Java ``\s`` and RE2 ``\s`` disagree.  Unicode
#: spaces outside this set (NBSP, U+0085, U+2028, ...) are deliberately
#: NOT separators: neither engine's ``\s`` matched them before either,
#: so they keep their (consistent) in-token / punctuation behavior.
WS_CLASS = r" \t\n\f\r\x0B"

#: Token-separator run — the ONLY whitespace-splitting regex allowed in
#: oracle-paired paths (Spark ``F.split`` / ``regexp_replace`` and
#: DuckDB ``regexp_split_to_array`` / ``regexp_replace`` alike).
WS_REGEX = rf"[{WS_CLASS}]+"

#: Punctuation = anything that is not alphanumeric and not a separator.
PUNCT_REGEX = rf"[^A-Za-z0-9{WS_CLASS}]"

#: BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{WS_CLASS}]"


def ascii_lower(col: Column) -> Column:
    """A→a codepoint map (``translate``): the cross-engine-exact
    lowercase.  See module docstring for why ``F.lower`` is banned in
    oracle-paired tokenization paths."""
    return F.translate(col, UPPER_ASCII, LOWER_ASCII)


def ascii_lower_sql(x: str) -> str:
    """DuckDB twin of :func:`ascii_lower` (same constants)."""
    return f"translate({x}, '{UPPER_ASCII}', '{LOWER_ASCII}')"
