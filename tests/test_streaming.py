"""Structured Streaming ingest: incremental exactly-once + windowed aggs."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark.sources.pages import pages_from_documents
from geoclimate_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


def _land(spark, tmp_path, cond, name):
    src = pages_from_documents(spark, SF).where(cond)
    src.write.mode("overwrite").parquet(str(tmp_path / "in" / name))
    return src.count()


def test_incremental_ingest_exactly_once(spark, tmp_path):
    in_dir = str(tmp_path / "in" / "*")  # chunks land as subdirectories
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    n1 = _land(spark, tmp_path, F.col("page_id") < 250, "chunk1")
    ingest.run_ingest(spark, in_dir, out, ck)
    got1 = spark.read.parquet(out)
    exp1 = (pages_from_documents(spark, SF)
            .where((F.col("page_id") < 250) & F.col("lon_e6").isNotNull()).count())
    assert got1.count() == exp1

    # second batch of files lands; rerun with the SAME checkpoint →
    # only the new files are processed (no duplicates of chunk1)
    _land(spark, tmp_path, F.col("page_id") >= 250, "chunk2")
    ingest.run_ingest(spark, in_dir, out, ck)
    got2 = spark.read.parquet(out)
    exp_all = (pages_from_documents(spark, SF)
               .where(F.col("lon_e6").isNotNull()).count())
    assert got2.count() == exp_all
    assert got2.select("page_id").distinct().count() == exp_all
    # enrichment columns present, html not persisted
    assert "tile_id" in got2.columns and "html" not in got2.columns


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in" / "*")
    _land(spark, tmp_path, F.lit(True), "all")
    stream = ingest.stream_pages(spark, in_dir)
    agg = ingest.windowed_tile_counts(stream, window="24 hours",
                                      watermark="48 hours")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.table("win_counts").toPandas()
           .sort_values(["window_start", "tile_id"]).reset_index(drop=True))
    batch = (ingest.windowed_tile_counts(pages_from_documents(spark, SF),
                                         window="24 hours")
             .toPandas().sort_values(["window_start", "tile_id"])
             .reset_index(drop=True))
    assert len(got) == len(batch)
    assert (got.n_pages.to_numpy() == batch.n_pages.to_numpy()).all()
    assert (got.tile_id.to_numpy() == batch.tile_id.to_numpy()).all()


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessions == batch sessionize minus each
    user's final (still-open-in-state) session."""
    import pyspark.sql.types as T
    from geoclimate_spark.operators import windows
    from geoclimate_spark.streaming import stateful

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.write.mode("overwrite").parquet(str(tmp_path / "ev" / "all"))
    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "ev" / "*"))
    GAP = 600
    sess = stateful.sessionize_stream(stream, GAP)
    q = (sess.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = (spark.table("sess_out").toPandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))

    batch = windows.sessionize(ev, GAP).toPandas()
    # drop each user's LAST session (open tail, still held in state)
    last = batch.groupby("user_id")["session_id"].transform("max")
    exp = (batch[batch.session_id != last]
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ["user_id", "session_id", "n_events", "start_us", "end_us",
              "duration_us"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_append_mode_watermark_drops(spark, tmp_path):
    """Hand-built late arrival: drain 1 advances the watermark past an
    early window; drain 2's late row for that window is DROPPED, its
    on-time rows aggregate, and the open tail window never emits."""
    import pyspark.sql.functions as F
    from geoclimate_spark.streaming import ingest as I
    from geoclimate_spark.operators.tile import TILE_RES, tile_col
    from geoclimate_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001") \
        .where(F.col("page_id") < 60)

    c1 = pages.where(F.col("page_id") % 2 == 0)   # even ids: full range
    c2 = pages.where(F.col("page_id") % 2 == 1)   # odd ids: mostly late
    c1.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in" / "c1"))

    def drain():
        agg = I.windowed_tile_counts(
            I.stream_pages(spark, str(tmp_path / "in" / "*")))
        q = (agg.writeStream.format("parquet")
             .option("path", str(tmp_path / "out"))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    out1 = spark.read.parquet(str(tmp_path / "out")).count()
    c2.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "in" / "c2"))
    drain()
    out = spark.read.parquet(str(tmp_path / "out"))

    # arithmetic replay of the drop rule (batch path of the SAME agg)
    e1 = I.enriched_stream(c1)
    ea = I.enriched_stream(pages)
    wm1 = e1.agg(F.max(F.unix_timestamp("warc_ts"))).collect()[0][0] - 7200
    wm2 = ea.agg(F.max(F.unix_timestamp("warc_ts"))).collect()[0][0] - 7200
    w1 = I.windowed_tile_counts(c1)
    wa = I.windowed_tile_counts(pages)
    exp1 = w1.where(F.unix_timestamp("window_end") <= wm1).count()
    expboth = wa.where((F.unix_timestamp("window_end") > wm1)
                       & (F.unix_timestamp("window_end") <= wm2)).count()
    assert out1 == exp1
    assert out.count() == exp1 + expboth
    # at least one window actually received a DROPPED late row: some odd-id
    # row falls in a window finalized at drain 1
    dropped = (I.enriched_stream(c2)
               .where(F.unix_timestamp("warc_ts")
                      - F.unix_timestamp("warc_ts") % 3600 + 3600 <= wm1)
               .count())
    assert dropped > 0
