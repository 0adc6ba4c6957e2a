"""Branded web-corpus quality rulesets: Gopher rules and the C4 line filter.

Two curation stages every large-scale text pipeline runs before training:

* **Gopher rules** (Rae et al. 2021, appendix A) — per-document heuristic
  flags: word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  bullet-line and ellipsis-line fractions, alphabetic-word fraction, and a
  minimum-stopword requirement. Each rule is reported as its own flag (so a
  user can ablate rules), plus the AND of all of them.
* **C4 line filter** (Raffel et al. 2020, §2.2) — line-wise cleaning: keep
  only lines that end in terminal punctuation, have at least
  ``C4_MIN_LINE_WORDS`` words and do not mention javascript; drop the whole
  document if it contains ``lorem ipsum`` or a curly brace, or if fewer than
  ``C4_MIN_KEPT_LINES`` lines survive. The cleaned text is reassembled in
  original line order and fingerprinted.

Both are PURE per-row codegen projections — split / filter / lambda over the
line and word arrays, no UDF, no shuffle, no state. At 100 TB they ride the
scan projection and are I/O-bound on the text column, exactly like
:mod:`.pii`. Expressions are restricted to the Spark-SQL / DuckDB agreement
subset (shared ``LIKE`` patterns, char-semantics ``length``, non-overlapping
``regexp_extract_all`` counts, dedup'ing array intersection), so every count,
ratio surrogate and reassembled string is bit-identical in the oracle.

The synthetic corpus is single-line word salad with no punctuation, so —
as with :func:`.pii.with_synthetic_pii` — :func:`with_synthetic_page`
deterministically derives a multi-line page from ``(doc_id, text)`` (bullet
lines every 4th doc, ellipsis lines every 3rd, symbol runs every 5th,
digit-only lines every 7th, javascript notices every 6th, curly-brace CSS
every 11th, ``lorem ipsum`` every 13th…), byte-identically in both engines;
the rules therefore fire on a known mix and the whole path is hash-gated,
including the C4-cleaned text md5.

Ratio thresholds are exact integer cross-multiplications (``10*symbols <
words`` …), never float divisions; the only division is the ``mean word
length × 100`` surrogate via exact int division. Word/line-count thresholds
are scaled to the fixture's ~50-word docs (the published 50..100k word gate
would reject every fixture doc); the constants are module-level so a real
deployment sets the paper values.

No reference analogue (GeoClimate filters geometries by tag/area rules —
`/root/reference/osm/src/main/groovy/org/orbisgis/geoclimate/osm/
InputDataFormatting.groovy:48-193` is the same fixed-rule-table-per-row
shape applied to buildings instead of documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---- Gopher thresholds (fixture-scaled; paper values in comments)
MIN_WORDS = 20          # paper: 50
MAX_WORDS = 100_000     # paper: 100,000
MIN_MEAN_WLEN_X100 = 300   # paper: mean word length >= 3
MAX_MEAN_WLEN_X100 = 1000  # paper: <= 10
# symbol/word < 0.1 ; bullet lines < 0.9 ; ellipsis-end lines < 0.3 ;
# alpha words > 0.8 ; >= 2 distinct stopwords
MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# ---- C4 thresholds (fixture-scaled; paper: >=5 words/line, >=3 sentences)
C4_MIN_LINE_WORDS = 3
C4_MIN_KEPT_LINES = 2

# Deterministic page derivation — ONE SQL string valid in BOTH engines
# (||, chr(10), repeat, %, CAST(.. AS STRING) are shared dialect).
_RAW_SQL = (
    "(text"
    " || chr(10) || 'this is sentence number '"
    "   || CAST(doc_id % 100 AS STRING) || ' of the page.'"
    " || CASE WHEN doc_id % 2 = 0 THEN chr(10)"
    "   || 'another good sentence ends right here!' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet item '"
    "   || CAST(doc_id % 9 AS STRING) ELSE '' END"
    " || CASE WHEN doc_id % 4 = 1 THEN chr(10)"
    "   || '• starred item in a list' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN chr(10)"
    "   || 'the story continues and trails off...' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '# ## '"
    "   || repeat('#', 1 + CAST(doc_id % 5 AS INT)) ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(10)"
    "   || '1234 5678 90 42 777' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN chr(10)"
    "   || 'please enable javascript to view this page.' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10)"
    "   || 'template { padding: 0 }' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN chr(10)"
    "   || 'lorem ipsum dolor sit amet.' ELSE '' END)")

_STOP_ARR_SPARK = "array(" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + ")"
_STOP_ARR_DUCK = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"

_BULLET_PRED = "l LIKE '- %' OR l LIKE '• %'"
_C4_LINE_PRED = ("(l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?')"
                 f" AND size(split(l, ' ')) >= {C4_MIN_LINE_WORDS}"
                 " AND NOT l LIKE '%javascript%'")
_C4_LINE_PRED_DUCK = ("(l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?')"
                      f" AND len(str_split(l, ' ')) >= {C4_MIN_LINE_WORDS}"
                      " AND l NOT LIKE '%javascript%'")


def with_synthetic_page(docs: DataFrame) -> DataFrame:
    """documents + a deterministic multi-line ``raw`` page column."""
    return docs.withColumn("raw", F.expr(_RAW_SQL))


# ------------------------------------------------------------- Gopher flags
def gopher_flags(docs: DataFrame) -> DataFrame:
    """Per-doc Gopher rule flags over the derived page:
    (doc_id, n_words, mean_wlen_x100, n_lines, ok_* per rule, keep)."""
    d = with_synthetic_page(docs).selectExpr(
        "doc_id",
        "split(trim(raw), '\\\\s+') AS words",
        "split(raw, '\\\\n') AS lines",
        "length(regexp_replace(raw, '\\\\s+', '')) AS word_chars",
        "CAST(regexp_count(raw, '#') + regexp_count(raw, '\\\\.\\\\.\\\\.')"
        " AS BIGINT) AS n_symbols")
    d = d.selectExpr(
        "doc_id", "n_symbols", "word_chars",
        "CAST(size(words) AS BIGINT) AS n_words",
        "CAST(size(lines) AS BIGINT) AS n_lines",
        f"CAST(size(filter(lines, l -> {_BULLET_PRED})) AS BIGINT)"
        " AS n_bullet",
        "CAST(size(filter(lines, l -> l LIKE '%...')) AS BIGINT)"
        " AS n_ell_end",
        "CAST(size(filter(words, w -> w RLIKE '[a-zA-Z]')) AS BIGINT)"
        " AS n_alpha",
        f"CAST(size(array_intersect(words, {_STOP_ARR_SPARK})) AS BIGINT)"
        " AS n_stop")
    return d.selectExpr(
        "doc_id", "n_words",
        "CAST((word_chars * 100) div n_words AS BIGINT) AS mean_wlen_x100",
        "n_lines",
        f"CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} AS INT)"
        " AS ok_words",
        f"CAST((word_chars * 100) div n_words >= {MIN_MEAN_WLEN_X100}"
        f" AND (word_chars * 100) div n_words <= {MAX_MEAN_WLEN_X100}"
        " AS INT) AS ok_wlen",
        "CAST(n_symbols * 10 < n_words AS INT) AS ok_symbols",
        "CAST(n_bullet * 10 < n_lines * 9 AS INT) AS ok_bullets",
        "CAST(n_ell_end * 10 < n_lines * 3 AS INT) AS ok_ellipsis",
        "CAST(n_alpha * 10 > n_words * 8 AS INT) AS ok_alpha",
        f"CAST(n_stop >= {MIN_STOP_HITS} AS INT) AS ok_stop",
        f"CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}"
        f" AND (word_chars * 100) div n_words >= {MIN_MEAN_WLEN_X100}"
        f" AND (word_chars * 100) div n_words <= {MAX_MEAN_WLEN_X100}"
        " AND n_symbols * 10 < n_words"
        " AND n_bullet * 10 < n_lines * 9"
        " AND n_ell_end * 10 < n_lines * 3"
        " AND n_alpha * 10 > n_words * 8"
        f" AND n_stop >= {MIN_STOP_HITS} AS INT) AS keep")


def gopher_flags_sql(rel: str = "documents") -> str:
    """DuckDB dual of :func:`gopher_flags`."""
    return f"""WITH raws AS (SELECT doc_id, {_RAW_SQL} AS raw FROM {rel}),
parts AS (
  SELECT doc_id,
         regexp_split_to_array(trim(raw), '\\s+') AS words,
         str_split(raw, chr(10)) AS lines,
         length(regexp_replace(raw, '\\s+', '', 'g')) AS word_chars,
         CAST(len(regexp_extract_all(raw, '#'))
              + len(regexp_extract_all(raw, '\\.\\.\\.')) AS BIGINT)
           AS n_symbols
  FROM raws),
counts AS (
  SELECT doc_id, n_symbols, word_chars,
         CAST(len(words) AS BIGINT) AS n_words,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines, l -> {_BULLET_PRED})) AS BIGINT)
           AS n_bullet,
         CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT)
           AS n_ell_end,
         CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
              AS BIGINT) AS n_alpha,
         CAST(len(list_intersect(words, {_STOP_ARR_DUCK})) AS BIGINT)
           AS n_stop
  FROM parts)
SELECT doc_id, n_words,
       CAST((word_chars * 100) // n_words AS BIGINT) AS mean_wlen_x100,
       n_lines,
       CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} AS INT)
         AS ok_words,
       CAST((word_chars * 100) // n_words >= {MIN_MEAN_WLEN_X100}
            AND (word_chars * 100) // n_words <= {MAX_MEAN_WLEN_X100}
            AS INT) AS ok_wlen,
       CAST(n_symbols * 10 < n_words AS INT) AS ok_symbols,
       CAST(n_bullet * 10 < n_lines * 9 AS INT) AS ok_bullets,
       CAST(n_ell_end * 10 < n_lines * 3 AS INT) AS ok_ellipsis,
       CAST(n_alpha * 10 > n_words * 8 AS INT) AS ok_alpha,
       CAST(n_stop >= {MIN_STOP_HITS} AS INT) AS ok_stop,
       CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
            AND (word_chars * 100) // n_words >= {MIN_MEAN_WLEN_X100}
            AND (word_chars * 100) // n_words <= {MAX_MEAN_WLEN_X100}
            AND n_symbols * 10 < n_words
            AND n_bullet * 10 < n_lines * 9
            AND n_ell_end * 10 < n_lines * 3
            AND n_alpha * 10 > n_words * 8
            AND n_stop >= {MIN_STOP_HITS} AS INT) AS keep
FROM counts"""


# ------------------------------------------------------------ C4 line filter
def c4_line_filter(docs: DataFrame) -> DataFrame:
    """Per-doc C4 cleaning result over the derived page:
    (doc_id, n_lines, n_kept, dropped, clean_len, clean_md5). Dropped docs
    report their counts but fingerprint the empty string."""
    d = with_synthetic_page(docs).selectExpr(
        "doc_id", "raw", "split(raw, '\\\\n') AS lines")
    d = d.selectExpr(
        "doc_id",
        "CAST(size(lines) AS BIGINT) AS n_lines",
        f"filter(lines, l -> {_C4_LINE_PRED}) AS kept",
        "(raw LIKE '%lorem ipsum%' OR raw LIKE '%{%') AS bad_doc")
    return d.selectExpr(
        "doc_id", "n_lines",
        "CAST(size(kept) AS BIGINT) AS n_kept",
        f"CAST(bad_doc OR size(kept) < {C4_MIN_KEPT_LINES} AS INT)"
        " AS dropped",
        f"CAST(CASE WHEN bad_doc OR size(kept) < {C4_MIN_KEPT_LINES}"
        " THEN 0 ELSE length(array_join(kept, chr(10))) END AS BIGINT)"
        " AS clean_len",
        f"md5(CASE WHEN bad_doc OR size(kept) < {C4_MIN_KEPT_LINES}"
        " THEN '' ELSE array_join(kept, chr(10)) END) AS clean_md5")


def c4_line_filter_sql(rel: str = "documents") -> str:
    """DuckDB dual of :func:`c4_line_filter`."""
    return f"""WITH raws AS (SELECT doc_id, {_RAW_SQL} AS raw FROM {rel}),
split AS (
  SELECT doc_id, raw, str_split(raw, chr(10)) AS lines FROM raws),
kept AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines, l -> {_C4_LINE_PRED_DUCK}) AS kept,
         (raw LIKE '%lorem ipsum%' OR raw LIKE '%{{%') AS bad_doc
  FROM split)
SELECT doc_id, n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(bad_doc OR len(kept) < {C4_MIN_KEPT_LINES} AS INT) AS dropped,
       CAST(CASE WHEN bad_doc OR len(kept) < {C4_MIN_KEPT_LINES}
            THEN 0 ELSE length(array_to_string(kept, chr(10))) END
            AS BIGINT) AS clean_len,
       md5(CASE WHEN bad_doc OR len(kept) < {C4_MIN_KEPT_LINES}
           THEN '' ELSE array_to_string(kept, chr(10)) END) AS clean_md5
FROM kept"""
