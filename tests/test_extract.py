from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark.functions.extract import with_extraction
from geoclimate_spark.sources.pages import pages_from_documents, synth_pages

from conftest import SF_SMOKE


def test_text_byte_identical_per_url(spark):
    """The per-row invariant of BASELINE.json: extract(html) == stored text."""
    pages = pages_from_documents(spark, SF_SMOKE)
    ex = with_extraction(pages)
    assert ex.where(F.col("text_extracted").isNull()).count() == 0
    mismatches = ex.where(F.col("text") != F.col("text_extracted")).count()
    assert mismatches == 0
    # binary-level check, not just string equality
    bin_mismatch = ex.where(
        F.encode("text", "UTF-8") != F.encode("text_extracted", "UTF-8")).count()
    assert bin_mismatch == 0


def test_coords_roundtrip_and_geo_fraction(spark):
    pages = pages_from_documents(spark, SF_SMOKE)
    ex = with_extraction(pages)
    total = ex.count()
    geo = ex.where(F.col("lon_e6").isNotNull())
    n_geo = geo.count()
    assert 0.3 < n_geo / total <= 0.5  # 40% by construction
    bad = geo.where(
        (F.col("lon_e6") < -180_000_000) | (F.col("lon_e6") > 180_000_000)
        | (F.col("lat_e6") < -90_000_000) | (F.col("lat_e6") > 90_000_000)).count()
    assert bad == 0


def test_urban_skew_present(spark):
    """Half the geo pages sit within ±0.1° of 3 hotspots → skewed cells."""
    from geoclimate_spark import grid

    pages = with_extraction(pages_from_documents(spark, SF_SMOKE))
    geo = pages.where(F.col("lon_e6").isNotNull())
    cells = (geo.select(grid.cell_col(F.col("lon_e6"), F.col("lat_e6"), 6).alias("c"))
                .groupBy("c").count().orderBy(F.desc("count")).limit(3).toPandas())
    n_geo = geo.count()
    assert cells["count"].sum() / n_geo > 0.4


def test_synth_pages_same_contract(spark):
    p = synth_pages(spark, 500)
    ex = with_extraction(p)
    assert ex.where(F.col("text") != F.col("text_extracted")).count() == 0
    assert ex.count() == 500
    assert ex.select("page_id").distinct().count() == 500
