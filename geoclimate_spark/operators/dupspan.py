"""Exact duplicate-span detection and trimming (ExactSubstr-style dedup).

The sub-document twin of :mod:`segdedup`: instead of non-overlapping k-token
segments deduped to their first occurrence, every OVERLAPPING n-token window
of every document is checked against the whole corpus; a window whose exact
token sequence occurs anywhere else (another document, or again in the same
document) marks all n of its token positions as duplicated. Per document the
operator reports the interval-UNION coverage of those marks (the fraction of
tokens sitting inside at least one duplicated span — the quantity the
"Deduplicating Training Data Makes Language Models Better" substring-dedup
recipe thresholds on) and the trimmed text with every covered token removed.

Reference analogue: the same exact-match-then-canonical shape as
:func:`geoclimate_spark.operators.dedup.exact_duplicates` (reference
`/root/reference/geoindicators/.../SpatialUnits.groovy:517-529` deterministic
dedup), pushed below document granularity; the interval-union step is the 1-D
integer-grid counterpart of the overlay coverage union in
:mod:`geoclimate_spark.operators.overlay`.

Scale design (10^12 docs):
* window generation is a pure row expression in the scan projection
  (normalize → split → transform(sequence) → posexplode) — no Python; the
  explode emits ~n_tokens rows per doc, the same order of work as
  tokenization itself;
* the duplicate decision is ONE shuffle keyed by the window text with a
  map-side-combinable COUNT — identical windows co-locate under any
  partitioning. At corpus scale the key would be the 64-bit rolling hash of
  :mod:`winnow` (8-byte shuffle key instead of the token string; collision
  rate ~ pairs/2^64) — the string key here keeps the operator bit-exact
  against the DuckDB oracle with zero collision caveats;
* only DUPLICATED windows are exploded to covered positions (n rows each),
  so the coverage union touches the duplicated tail of the corpus, not all
  of it; the distinct + count per doc is again map-side combinable;
* the trim is one anti-join of (doc, pos, token) against covered (doc, pos)
  — both sides hash-partition on the doc id, and the reassembly groupBy
  reuses that partitioning (one effective shuffle of the token stream).

Empty documents normalize to '' whose token list is [''] on BOTH engines
(Spark split / DuckDB string_split), so n_tokens >= 1 always and the
dup_fraction division is total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalize_col, normalize_sql

SPAN_TOKENS = 8  # window width n: a span must repeat exactly at this length


def _base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = normalize_col(F.col(text_col))
    tk = F.split(t, " ")
    return docs.select(F.col(id_col).alias("id"), tk.alias("_tk"),
                       F.size(tk).alias("n_tokens"))


def _windows(base: DataFrame, n: int) -> DataFrame:
    """(id, pos, gram): every overlapping n-token window, pos 0-based. Docs
    shorter than n tokens emit no windows (the filter runs BEFORE the
    sequence() so Spark's descending-sequence gotcha is unreachable)."""
    grams = F.expr(
        f"transform(sequence(0, size(_tk) - {n}), "
        f"i -> array_join(slice(_tk, i + 1, {n}), ' '))")
    return (base.where(F.col("n_tokens") >= n)
            .select("id", F.posexplode(grams).alias("pos", "gram")))


def duplicate_spans(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    n: int = SPAN_TOKENS) -> DataFrame:
    """(doc_id, n_tokens, n_windows, n_dup_windows, dup_tokens, dup_fraction,
    trimmed_text): corpus-wide exact duplicate-span coverage and trim.

    A window is duplicated iff its exact n-token text occurs >= 2 times in
    the corpus (across documents OR within one). ``dup_tokens`` is the size
    of the union of the covered position intervals; ``trimmed_text`` is the
    normalized text with covered tokens removed (original token order kept).
    """
    base = _base(docs, id_col, text_col)
    wins = _windows(base, n)
    dup = (wins.groupBy("gram").agg(F.count("*").alias("_c"))
           .where(F.col("_c") >= 2).select("gram"))
    dwin = wins.join(dup, "gram").select("id", "pos")
    cov = (dwin.select(
        "id", F.explode(F.expr(f"sequence(pos, pos + {n - 1})")).alias("p"))
        .distinct())
    covs = cov.groupBy("id").agg(F.count("*").alias("dup_tokens"))
    ndw = dwin.groupBy("id").agg(F.count("*").alias("n_dup_windows"))
    tokpos = base.select("id", F.posexplode("_tk").alias("p", "tok"))
    keep = tokpos.join(cov, ["id", "p"], "left_anti")
    trimmed = keep.groupBy("id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("p", "tok"))),
                        lambda x: x["tok"]),
            " ").alias("trimmed_text"))
    nt = F.col("n_tokens")
    return (base.select("id", "n_tokens")
            .join(ndw, "id", "left").join(covs, "id", "left")
            .join(trimmed, "id", "left")
            .select(
                F.col("id").alias(id_col),
                nt.cast("long").alias("n_tokens"),
                F.greatest(nt - F.lit(n - 1), F.lit(0))
                .cast("long").alias("n_windows"),
                F.coalesce(F.col("n_dup_windows"), F.lit(0))
                .cast("long").alias("n_dup_windows"),
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                .cast("long").alias("dup_tokens"),
                (F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                 / nt.cast("double")).alias("dup_fraction"),
                F.coalesce(F.col("trimmed_text"), F.lit(""))
                .alias("trimmed_text")))


def duplicate_spans_sql(doc_rel: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text", n: int = SPAN_TOKENS) -> str:
    """DuckDB dual of :func:`duplicate_spans`. List slicing tk[a:b] is
    1-based inclusive (never clamps here — windows stop n short of the tail),
    generate_series is inclusive like Spark's sequence, and the dup_fraction
    is the same exact integer-over-integer double on both sides."""
    norm = normalize_sql(text_col)
    return f"""
WITH base AS (SELECT {id_col} AS id, string_split({norm}, ' ') AS tk,
                     len(string_split({norm}, ' ')) AS n_tokens
              FROM {doc_rel}),
wins AS (SELECT id, i AS pos, array_to_string(tk[i + 1 : i + {n}], ' ') AS gram
         FROM base, UNNEST(generate_series(0, n_tokens - {n})) AS g(i)
         WHERE n_tokens >= {n}),
dup AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= 2),
dwin AS (SELECT id, pos FROM wins JOIN dup USING (gram)),
cov AS (SELECT DISTINCT id, p
        FROM dwin, UNNEST(generate_series(pos, pos + {n - 1})) AS c(p)),
covs AS (SELECT id, COUNT(*) AS dup_tokens FROM cov GROUP BY id),
ndw AS (SELECT id, COUNT(*) AS n_dup_windows FROM dwin GROUP BY id),
tokpos AS (SELECT id, i - 1 AS p, tk[i] AS tok
           FROM base, UNNEST(generate_series(1, n_tokens)) AS t(i)),
keep AS (SELECT tp.id, tp.p, tp.tok FROM tokpos tp
         ANTI JOIN cov ON tp.id = cov.id AND tp.p = cov.p),
trimmed AS (SELECT id, string_agg(tok, ' ' ORDER BY p) AS trimmed_text
            FROM keep GROUP BY id)
SELECT b.id AS {id_col},
       CAST(b.n_tokens AS BIGINT) AS n_tokens,
       CAST(GREATEST(b.n_tokens - {n - 1}, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(ndw.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(COALESCE(covs.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CAST(COALESCE(covs.dup_tokens, 0) AS DOUBLE)
           / CAST(b.n_tokens AS DOUBLE) AS dup_fraction,
       COALESCE(trimmed.trimmed_text, '') AS trimmed_text
FROM base b
LEFT JOIN ndw USING (id)
LEFT JOIN covs USING (id)
LEFT JOIN trimmed USING (id)"""
