"""Export shard planning — size-balanced output layout for a 100-TB dump.

Writing a curated corpus back out, a pipeline wants K shards of near-equal
byte mass (downstream loaders stream shards whole; a fat shard is the
straggler). The classic deterministic heuristic is sorted round-robin:
rank documents by size descending and deal them out ``shard = (rank-1) mod
K`` — equivalent to LPT scheduling restricted to a fixed deal order, with a
worst-case shard spread bounded by the single largest document (asserted in
tests).

The interesting part at 10^12 docs is the GLOBAL rank, which is naively a
partition-less window (one task holds the corpus). This module reuses
:mod:`.vocab`'s exact decomposition:

* bucket = the size value itself (``n_chars``) — order-aligned with the
  global order (n_chars DESC, doc_id ASC) by construction;
* a tiny distinct-size table takes exclusive prefix COUNTS via a window
  over |distinct sizes| rows, broadcast back;
* the within-bucket row_number runs partitioned by ``n_chars`` — parallel.
  (A pathologically flat size distribution concentrates a stratum; widen
  the bucket with a doc_id prefix exactly as vocab.py documents.)

All integers; the DuckDB oracle is the NAIVE global ROW_NUMBER window, so
the decomposition is hash-gated bit-for-bit.

Reference analogue: the deterministic id-dealing of
`/root/reference/geoindicators/src/main/groovy/org/orbisgis/geoclimate/
geoindicators/SpatialUnits.groovy` grid-cell id assignment (row-major ids
over a computed order) — here the order is size-derived and the id is the
shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_SHARDS = 8


def export_shard_plan(docs: DataFrame, id_col: str = "doc_id",
                      size_col: str = "n_chars",
                      k: int = N_SHARDS) -> DataFrame:
    """(doc_id, n_chars, rank, shard): sorted-round-robin shard assignment
    with an exactly decomposed global rank."""
    base = docs.select(F.col(id_col), F.col(size_col).cast("long")
                       .alias("_sz"))
    bw = Window.orderBy(F.col("_sz").desc())
    buckets = (base.groupBy("_sz").agg(F.count("*").alias("_bn"))
               .withColumn("_off", F.coalesce(
                   F.sum("_bn").over(bw.rowsBetween(
                       Window.unboundedPreceding, -1)), F.lit(0))))
    ww = Window.partitionBy("_sz").orderBy(F.col(id_col).asc())
    return (base.join(F.broadcast(buckets.select("_sz", "_off")), "_sz")
            .withColumn("rank",
                        (F.col("_off") + F.row_number().over(ww))
                        .cast("long"))
            .select(id_col, F.col("_sz").alias(size_col), "rank",
                    F.expr(f"(rank - 1) % {int(k)}").cast("long")
                    .alias("shard")))


def export_shard_plan_sql(rel: str = "documents", id_col: str = "doc_id",
                          size_col: str = "n_chars",
                          k: int = N_SHARDS) -> str:
    """DuckDB dual: the naive global window the decomposition must match."""
    return f"""SELECT {id_col}, {size_col},
       CAST(ROW_NUMBER() OVER (ORDER BY {size_col} DESC, {id_col} ASC)
            AS BIGINT) AS rank,
       CAST((ROW_NUMBER() OVER (ORDER BY {size_col} DESC, {id_col} ASC) - 1)
            % {int(k)} AS BIGINT) AS shard
FROM {rel}"""
