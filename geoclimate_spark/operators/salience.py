"""Per-document term salience (tf·icf keyword extraction) — exact integers.

The corpus-curation sibling of text.py's quality metrics: for every
document, the k terms that most distinguish it from the corpus — term
frequency weighted by inverse collection frequency. The reference has no
NLP layer (closest shape: its per-unit type-proportion reporting,
`GenericIndicators.groovy:241` ff.); at web scale this op feeds tag/topic
routing and near-dup triage.

Exactness contract: the classic tf·idf = tf·ln(N/df) needs ``ln`` — a libm
call with no cross-engine bit guarantee. This operator ranks by the exact
INTEGER surrogate ``score = (tf · 2^30) div df`` instead: a monotone
transform of tf/df (all ratios distinct at fixture scale keep their order;
equal scores tie-break on the term string), so the winner set is a pure
integer computation DuckDB replays bit-for-bit. tf ≤ doc length and
df ≤ corpus size keep ``tf·2^30`` far inside int64.

Scale shape: token explode is codegen (`split` on the shared normalized
form); tf = one groupBy (doc, term); df = one groupBy (term) — a
term-keyed dim table joined back on the term key (shuffled hash join at
web scale, broadcastable when the vocabulary is small); top-k = one window
on doc_id. Three shuffles, each on a natural key; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_col, normalize_sql

TOP_K = 3
_SCALE = 1 << 30


def doc_top_terms(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = TOP_K) -> DataFrame:
    """Top-``k`` salient terms per document by (tf·2^30) div df, term-asc
    tie-break. Returns (id_col, rank, term, tf, df, score)."""
    toks = (docs.where(F.col(text_col).isNotNull())
            .select(F.col(id_col),
                    F.explode(F.split(normalize_col(F.col(text_col)), " "))
                    .alias("term"))
            .where(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("df"))
    scored = (tf.join(df_, "term")
              .withColumn("score",
                          F.expr(f"(tf * {_SCALE}L) div df").cast("long")))
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, F.col("rank").cast("long").alias("rank"),
                    "term", F.col("tf").cast("long").alias("tf"), "df",
                    "score"))


def doc_top_terms_sql(doc_rel: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", k: int = TOP_K) -> str:
    norm = normalize_sql(text_col)
    return f"""WITH toks AS (
  SELECT {id_col}, t.term
  FROM (SELECT {id_col}, {norm} AS _norm FROM {doc_rel}
        WHERE {text_col} IS NOT NULL) d,
       LATERAL (SELECT unnest(string_split(d._norm, ' ')) AS term) t
  WHERE t.term <> ''),
tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS df
       FROM toks GROUP BY 1),
scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, df.df,
         CAST((tf.tf * {_SCALE}) // df.df AS BIGINT) AS score
  FROM tf JOIN df ON tf.term = df.term)
SELECT {id_col}, CAST(rank AS BIGINT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, df, score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {id_col}
                                   ORDER BY score DESC, term ASC) AS rank
      FROM scored)
WHERE rank <= {k}"""
