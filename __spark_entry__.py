"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine queries run the REAL machinery (Arrow extraction UDFs, covering +
broadcast PIP join, cell-arithmetic tiling); oracles recompute the same
answers in pure ANSI SQL from the shared deterministic derivation
(geoclimate_spark.sources.pages.pages_oracle_sql).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoclimate_spark import grid
from geoclimate_spark.functions import text as text_fn
from geoclimate_spark.functions.extract import with_extraction
from geoclimate_spark.operators import dedup
from geoclimate_spark.operators.spatial_join import spatial_join_points
from geoclimate_spark.operators import tile as tile_op
from geoclimate_spark.plans import flagship
from geoclimate_spark.sources import layers
from geoclimate_spark.sources.pages import pages_from_documents, pages_oracle_sql

TILE_RES = tile_op.TILE_RES
CELL_RES = 12

_PAGES_CTE = f"WITH pages AS (\n{pages_oracle_sql()}\n)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship.run(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------- engine side
def _q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship.run(spark, sf_dir)


def _q_zone_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = flagship.geo_pages(pages_from_documents(spark, sf_dir))
    return spatial_join_points(g, layers.climate_zones()).select("page_id", "zone_id")


def _q_tile_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = flagship.geo_pages(pages_from_documents(spark, sf_dir))
    return g.select(
        "page_id",
        tile_op.tile_col(F.col("lon_e6"), F.col("lat_e6"), TILE_RES).alias("tile_id"),
        grid.cell_col(F.col("lon_e6"), F.col("lat_e6"), CELL_RES).alias("cell_id"),
    )


def _q_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate proof of byte-identical extraction: counts + md5 distincts
    computed from the EXTRACTED text must equal the oracle's stored text."""
    pages = pages_from_documents(spark, sf_dir)
    ex = with_extraction(pages.select("page_id", "lang", "html"))
    return (ex.groupBy("lang")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.length("text_extracted")).alias("total_chars"),
                 F.countDistinct(F.md5(F.col("text_extracted"))).alias("n_distinct_texts")))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


NGRAM_T, NGRAM_MAX_DF = 0.7, 20
MINHASH_T = 0.8
SIMHASH_MAXD = 6


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def _q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=NGRAM_T,
                                     max_df=NGRAM_MAX_DF)


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_near_duplicates(_docs(spark, sf_dir), threshold=MINHASH_T)


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_duplicates(_docs(spark, sf_dir), max_hamming=SIMHASH_MAXD)


def _q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = text_fn.text_metrics_cols(F.col("text"))
    return _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"), *[c.alias(n) for n, c in cols.items()])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_zone_tile_language_mix": _q_flagship,
        "pip_zone_assignment": _q_zone_assignment,
        "tile_assignment": _q_tile_assignment,
        "extract_roundtrip": _q_extract_roundtrip,
        "dedup_exact": _q_dedup_exact,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "text_metrics": _q_text_metrics,
    }


# --------------------------------------------------------------- oracle side
def oracle_sql() -> dict[str, str]:
    zone = layers.zone_case_sql("lon_e6", "lat_e6")
    tile = tile_op.tile_sql("lon_e6", "lat_e6", TILE_RES)
    cell = grid.cell_sql("lon_e6", "lat_e6", CELL_RES)
    return {
        "flagship_zone_tile_language_mix": f"""{_PAGES_CTE}
SELECT CAST({zone} AS BIGINT) AS zone_id, CAST({tile} AS BIGINT) AS tile_id,
       COUNT(*) AS n_pages, COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS avg_chars
FROM pages WHERE lon_e6 IS NOT NULL
GROUP BY 1, 2""",
        "pip_zone_assignment": f"""{_PAGES_CTE}
SELECT page_id, CAST({zone} AS BIGINT) AS zone_id
FROM pages WHERE lon_e6 IS NOT NULL""",
        "tile_assignment": f"""{_PAGES_CTE}
SELECT page_id, CAST({tile} AS BIGINT) AS tile_id, CAST({cell} AS BIGINT) AS cell_id
FROM pages WHERE lon_e6 IS NOT NULL""",
        "extract_roundtrip": f"""{_PAGES_CTE}
SELECT lang, COUNT(*) AS n_pages, CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts
FROM pages
GROUP BY lang""",
        "dedup_exact": dedup.exact_duplicates_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_sql(
            threshold=NGRAM_T, max_df=NGRAM_MAX_DF),
        "dedup_minhash_lsh": dedup.minhash_lsh_sql(threshold=MINHASH_T),
        "dedup_simhash": dedup.simhash_sql(max_hamming=SIMHASH_MAXD),
        "text_metrics": "SELECT doc_id AS id,\n  " + ",\n  ".join(
            f"{sql} AS {name}"
            for name, sql in text_fn.text_metrics_sql("text").items()
        ) + "\nFROM documents",
    }
