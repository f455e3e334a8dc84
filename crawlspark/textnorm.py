"""Whitespace normalization (T1) — reference transform/transform.go:9-42.

Semantics (codepoint-level; the reference transducer is byte-level, which
mangles multi-byte UTF-8 whitespace like U+00A0 — documented divergence, we
use codepoint semantics as SURVEY.md §2.6 prescribes):

1. ``\r\n`` → ``\n`` and lone ``\r`` → ``\n``  (CR normalization; note
   ``\n\r`` → ``\n\n``).
2. A run of blank characters ``{' ', \t, \v, \f, U+0085, U+00A0}``
   collapses to a single ``' '``. Runs do NOT absorb ``\n``.

Two interchangeable implementations with identical output (pinned by
tests/test_textnorm.py over the reference corpus transform_test.go:10-31):

- ``normalize_text``    — pure Python (used inside Arrow batches / oracle).
- ``normalize_text_col``— native Catalyst ``regexp_replace`` chain (used in
  declarative plans; JVM-side, whole-stage-codegen'd — the fast path).
"""

from __future__ import annotations

import re

BLANKS = " \t\v\f\x85\xa0"
_BLANK_RUN = re.compile("[" + re.escape(BLANKS) + "]+")

# Spark SQL regexes (Java syntax); the class is identical.
_SQL_BLANK_CLASS = "[ \\t\\x0B\\f\\u0085\\u00A0]+"


def normalize_text(s: str) -> str:
    """Pure-Python T1. Order matters: CR normalization first, then blank-run
    collapse (a run like ``" \\t "`` becomes one space; ``\\n`` breaks runs
    because it is replaced before the collapse and is not in the class)."""
    if not s:
        return s
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    return _BLANK_RUN.sub(" ", s)


def normalize_text_col(col):
    """Native Catalyst equivalent of :func:`normalize_text` — a
    ``regexp_replace`` chain that stays JVM-side (no Python in the hot
    path). ``col`` is a pyspark Column (or name)."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, "\r\n", "\n")
    c = F.regexp_replace(c, "\r", "\n")
    return F.regexp_replace(c, _SQL_BLANK_CLASS, " ")


# DuckDB-compatible SQL expression used by __spark_entry__.oracle_sql for
# the cross-check of this operator. DuckDB regexp_replace needs the 'g'
# flag, and its regex engine is RE2: codepoints must be \x{0085}, not
# Java-style backslash-u escapes (which RE2 silently treats as literal
# characters, corrupting the class).
def duckdb_normalize_sql(expr: str) -> str:
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, '\\r\\n', '\\n', 'g'), '\\r', '\\n', 'g'), "
        "'[ \\t\\x0B\\f\\x{0085}\\x{00A0}]+', ' ', 'g')"
    )
