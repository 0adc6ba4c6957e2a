"""Readability + lexical-diversity metrics — the stylometric quality axis.

Corpus quality work scores documents on axes the Gopher/C4 rules don't
cover: reading grade (Flesch-style) and vocabulary richness (type-token
ratio). Both are classic, both reduce to counting, and both stay exact:

* **Flesch reading ease**, milli-scaled and integer-floored:
  ``fk_milli = 206835 − (1015·W) div S − (84600·Y) div W`` with W words,
  S sentences (runs of ``[.!?]``), Y syllable surrogates (vowel groups
  ``[aeiouy]+`` — the standard cheap syllable proxy). The two floor
  divisions are the SAME expression in both engines, so parity is exact
  even though the floors lose sub-milli precision (the repo's
  fixed-expression discipline, cf. bm25.py).
* **Type-token ratio** ``ttr_x1000 = (1000 · distinct words) div W`` —
  ``array_distinct``/``list_distinct`` counts agree exactly.

Both run over the deterministic multi-line page of
:mod:`.qualityrules` (the raw fixture is punctuation-free word salad —
S would be 0 everywhere); S and W are floored at 1 via ``greatest`` so
the divisions are total. Pure per-row codegen projection: no shuffle, no
UDF; at 100 TB this rides the scan with :mod:`.pii` / :mod:`.qualityrules`.

Reference analogue: the per-feature indicator battery of
`/root/reference/geoindicators/src/main/groovy/org/orbisgis/geoclimate/
geoindicators/BuildingIndicators.groovy:40-120` (sizeProperties — several
fixed arithmetic indicators emitted per row in one projection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .qualityrules import _RAW_SQL, with_synthetic_page

_W = "GREATEST(CAST(size(split(trim(raw), '\\\\s+')) AS BIGINT), 1)"
_W_DUCK = "GREATEST(CAST(len(regexp_split_to_array(trim(raw), '\\s+'))" \
          " AS BIGINT), 1)"
_S = "GREATEST(CAST(regexp_count(raw, '[.!?]+') AS BIGINT), 1)"
_S_DUCK = "GREATEST(CAST(len(regexp_extract_all(raw, '[.!?]+'))" \
          " AS BIGINT), 1)"
_Y = "GREATEST(CAST(regexp_count(raw, '[aeiouy]+') AS BIGINT), 1)"
_Y_DUCK = "GREATEST(CAST(len(regexp_extract_all(raw, '[aeiouy]+'))" \
          " AS BIGINT), 1)"
_D = "CAST(size(array_distinct(split(trim(raw), '\\\\s+'))) AS BIGINT)"
_D_DUCK = "CAST(len(list_distinct(regexp_split_to_array(trim(raw)," \
          " '\\s+'))) AS BIGINT)"


def readability_metrics(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_sents, n_syll, n_types, fk_milli, ttr_x1000)
    over the derived multi-line page."""
    return with_synthetic_page(docs).selectExpr(
        "doc_id",
        f"{_W} AS n_words", f"{_S} AS n_sents", f"{_Y} AS n_syll",
        f"{_D} AS n_types",
        f"CAST(206835 - (1015 * {_W}) div {_S}"
        f" - (84600 * {_Y}) div {_W} AS BIGINT) AS fk_milli",
        f"CAST((1000 * {_D}) div {_W} AS BIGINT) AS ttr_x1000")


def readability_metrics_sql(rel: str = "documents") -> str:
    """DuckDB dual of :func:`readability_metrics`."""
    return f"""WITH raws AS (SELECT doc_id, {_RAW_SQL} AS raw FROM {rel})
SELECT doc_id,
       {_W_DUCK} AS n_words, {_S_DUCK} AS n_sents, {_Y_DUCK} AS n_syll,
       {_D_DUCK} AS n_types,
       CAST(206835 - (1015 * {_W_DUCK}) // {_S_DUCK}
            - (84600 * {_Y_DUCK}) // {_W_DUCK} AS BIGINT) AS fk_milli,
       CAST((1000 * {_D_DUCK}) // {_W_DUCK} AS BIGINT) AS ttr_x1000
FROM raws"""
