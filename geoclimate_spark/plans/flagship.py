"""Flagship end-to-end pipeline: raw html → zone/tile page statistics.

The minimum end-to-end slice of SURVEY.md §7 step 4: *"pages per climate zone
and tile, with language mix"* — extraction (Arrow UDF), cell indexing (pure
column arithmetic), broadcast filter-and-refine PIP join, tile assignment,
zonal aggregation. Reference lifecycle analogue: §3.1's
extract→format→units→indicators chain collapsed into one lazy DataFrame DAG
(the reference materializes every stage eagerly; we let Catalyst fuse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import with_extraction
from ..operators.spatial_join import spatial_join_points
from ..operators.tile import TILE_RES, with_tile
from ..sources.layers import climate_zones
from ..sources.pages import pages_from_documents


def geo_pages(pages: DataFrame) -> DataFrame:
    """html → (page_id, url, lang, text_extracted, lon_e6, lat_e6); geo rows only.

    Column pruning matters at 100 TB: only html/url/lang are read from the
    scan; `text` (the verification copy) is never touched here.
    """
    ex = with_extraction(pages.select("page_id", "url", "lang", "html"))
    return ex.where(F.col("lon_e6").isNotNull()).drop("html")


def zone_tile_language_mix(pages: DataFrame, tile_res: int = TILE_RES) -> DataFrame:
    """Pages per (zone, tile): counts, language mix, mean extracted length.

    The wide ``text_extracted`` column is reduced to an integer ``chars``
    BEFORE the PIP join, so the join output, both shuffles and all agg
    buffers are numeric + one short lang string — HashAggregate with
    map-side combine end to end (checked in docs/PLANS.md).
    """
    g = geo_pages(pages).withColumn(
        "chars", F.length("text_extracted").cast("long"))
    assigned = spatial_join_points(g, climate_zones(),
                                   passthrough=["lang", "chars"])
    tiled = with_tile(assigned, res=tile_res)
    return (tiled.groupBy("zone_id", "tile_id")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("chars").alias("total_chars"),
                 (F.sum("chars") / F.count("*")).alias("avg_chars")))


def run(spark: SparkSession, sf_dir: str, tile_res: int = TILE_RES) -> DataFrame:
    return zone_tile_language_mix(pages_from_documents(spark, sf_dir), tile_res)
