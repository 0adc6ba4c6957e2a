"""Mojibake (encoding-artifact) detection and repair — the ftfy stage.

Web crawls are full of UTF-8 text that was decoded as cp1252 and re-encoded
(curly quote ``’`` → ``â€™``, ``é`` → ``Ã©``, NBSP → ``Â ``). Every serious
corpus pipeline counts and repairs these before tokenization; this operator
grafts the deterministic core of that stage (ftfy's fixed confusion table,
not its heuristics):

* a fixed artifact table ``_ARTIFACTS`` of (mojibake, repaired) pairs — the
  classic cp1252 double-encodings. The entries are chosen mutually
  non-substring (all the ``â€x`` forms are length 3 with distinct third
  chars; the ``Ã·``/``Â·`` forms are length 2 and disjoint from them), so
  per-artifact occurrence counts are well-defined independent of replace
  order, and no replacement can create a new artifact (outputs are clean
  chars outside the artifact alphabet);
* ``n_bad`` = Σ per-artifact ``regexp_count`` (plain unicode literals —
  valid in both Java regex and RE2); repair = chained ``replace`` calls;
* the repaired text is md5-fingerprinted, so the whole detect+repair path
  is hash-gated bit-exactly.

The synthetic corpus is ASCII word salad, so — the :mod:`.pii` /
:mod:`.qualityrules` idiom — :func:`with_synthetic_mojibake` derives a
deterministic corruption from ``doc_id`` (quote/ellipsis artifacts every
3rd doc, accent artifacts every 4th, NBSP runs every 5th; other docs stay
clean) with ONE SQL string valid in both engines.

Pure per-row codegen projection: no shuffle, no UDF, no state. At 100 TB it
rides the scan like :mod:`.pii`.

Reference analogue: `/root/reference/osm/src/main/groovy/org/orbisgis/
geoclimate/osm/InputDataFormatting.groovy` normalizes malformed attribute
encodings with fixed replacement rules before indicators run — the same
fixed-confusion-table-per-row shape applied to tag text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (mojibake, repaired) — mutually non-substring; see module docstring.
_ARTIFACTS = (
    ("â€™", "’"),   # â€™  → ’
    ("â€œ", "“"),   # â€œ  → “
    ("â€“", "–"),   # â€“  → –
    ("â€”", "—"),   # â€”  → —
    ("â€¦", "…"),   # â€¦  → …
    ("Ã©", "é"),         # Ã©   → é
    ("Ã¯", "ï"),         # Ã¯   → ï
    ("Ã±", "ñ"),         # Ã±   → ñ
    ("Ã¼", "ü"),         # Ã¼   → ü
    ("Â ", " "),              # Â +NBSP → space
)

# deterministic corruption; shared-dialect SQL (||, CASE, chr())
_INJ_SQL = (
    "(text"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    "   ' itâ€™s â€œquotedâ€¦'"
    "   ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN"
    "   ' naÃ¯ve rÃ©sumÃ© seÃ±or'"
    "   ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN"
    "   ' gapÂ hereÂ twice â€“dash"
    "â€”' ELSE '' END)")


def with_synthetic_mojibake(docs: DataFrame) -> DataFrame:
    """documents + a deterministically corrupted ``raw`` column."""
    return docs.withColumn("raw", F.expr(_INJ_SQL))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _fixed_expr(col: str) -> str:
    e = col
    for bad, good in _ARTIFACTS:
        e = f"replace({e}, {_sql_quote(bad)}, {_sql_quote(good)})"
    return e


def _nbad_expr(col: str) -> str:
    return " + ".join(
        f"regexp_count({col}, {_sql_quote(bad)})" for bad, _ in _ARTIFACTS)


def repair_mojibake(docs: DataFrame) -> DataFrame:
    """Per-doc mojibake report over the corrupted page:
    (doc_id, raw_len, n_bad, had_mojibake, fixed_len, fixed_md5)."""
    return with_synthetic_mojibake(docs).selectExpr(
        "doc_id",
        "CAST(length(raw) AS BIGINT) AS raw_len",
        f"CAST({_nbad_expr('raw')} AS BIGINT) AS n_bad",
        f"CAST({_nbad_expr('raw')} > 0 AS INT) AS had_mojibake",
        f"CAST(length({_fixed_expr('raw')}) AS BIGINT) AS fixed_len",
        f"md5({_fixed_expr('raw')}) AS fixed_md5")


def repair_mojibake_sql(rel: str = "documents") -> str:
    """DuckDB dual of :func:`repair_mojibake` (regexp_count → the
    ``len(regexp_extract_all)`` surrogate)."""
    nbad = " + ".join(
        f"len(regexp_extract_all(raw, {_sql_quote(bad)}))"
        for bad, _ in _ARTIFACTS)
    return f"""WITH raws AS (SELECT doc_id, {_INJ_SQL} AS raw FROM {rel})
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS raw_len,
       CAST({nbad} AS BIGINT) AS n_bad,
       CAST({nbad} > 0 AS INT) AS had_mojibake,
       CAST(length({_fixed_expr('raw')}) AS BIGINT) AS fixed_len,
       md5({_fixed_expr('raw')}) AS fixed_md5
FROM raws"""
