"""Incremental streaming dedup: greedy-vs-reference, idempotence, metrics."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from geoclimate_spark.functions.text import normalize_col
from geoclimate_spark.streaming import dedup as sd

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _land(spark, tmp_path, cond, name):
    _docs(spark).where(cond).write.mode("overwrite").parquet(
        str(tmp_path / "in" / name))


def _run(spark, tmp_path, mode):
    sd.run_incremental_dedup(
        spark, str(tmp_path / "in" / "*"), str(tmp_path / "store"),
        str(tmp_path / "out"), str(tmp_path / "ck"),
        schema=_docs(spark).schema, mode=mode)


def test_exact_incremental_matches_greedy_reference(spark, tmp_path):
    # chunk1: docs <250 plus within-batch re-crawls of docs <20 (new ids);
    # chunk2: docs >=250 plus cross-batch re-crawls of docs <50
    d = _docs(spark)
    recrawl = lambda cond, off: d.where(cond).withColumn(
        "doc_id", F.col("doc_id") + off)
    c1 = d.where(F.col("doc_id") < 250).unionByName(
        recrawl(F.col("doc_id") < 20, 20_000))
    c2 = d.where(F.col("doc_id") >= 250).unionByName(
        recrawl(F.col("doc_id") < 50, 10_000))
    c1.write.mode("overwrite").parquet(str(tmp_path / "in" / "chunk1"))
    _run(spark, tmp_path, "exact")
    c2.write.mode("overwrite").parquet(str(tmp_path / "in" / "chunk2"))
    _run(spark, tmp_path, "exact")

    kept = sd.kept_documents(spark, str(tmp_path / "out"))
    got = {(int(r.doc_id)) for r in kept.select("doc_id").collect()}

    # independent greedy reference: same fingerprint fn, pandas state loop
    fp_col = F.md5(normalize_col(F.col("text"))).alias("fp")
    b1 = c1.select("doc_id", fp_col).toPandas()
    b2 = c2.select("doc_id", fp_col).toPandas()
    seen, expect = set(), set()
    n_in = 0
    for b in (b1, b2):
        n_in += len(b)
        canon = b.groupby("fp", as_index=False)["doc_id"].min()
        for fp, did in zip(canon.fp, canon.doc_id):
            if fp not in seen:
                seen.add(fp)
                expect.add(int(did))
    assert got == expect
    # re-crawled duplicates exist, so the test is non-vacuous
    assert len(expect) < n_in

    mets = sd.dedup_metrics(str(tmp_path / "store"))
    assert [m["batch_id"] for m in mets] == sorted(m["batch_id"] for m in mets)
    assert sum(m["kept"] for m in mets) == len(expect)
    assert sum(m["rows_in"] for m in mets) == n_in


def test_exact_rerun_without_new_files_is_noop(spark, tmp_path):
    _land(spark, tmp_path, F.col("doc_id") < 100, "chunk1")
    _run(spark, tmp_path, "exact")
    before = sorted(r.doc_id for r in
                    sd.kept_documents(spark, str(tmp_path / "out")).collect())
    n_mets = len(sd.dedup_metrics(str(tmp_path / "store")))
    _run(spark, tmp_path, "exact")  # same checkpoint, nothing new landed
    after = sorted(r.doc_id for r in
                   sd.kept_documents(spark, str(tmp_path / "out")).collect())
    assert after == before
    # an empty trailing batch may be recorded, but it must keep nothing
    for m in sd.dedup_metrics(str(tmp_path / "store"))[n_mets:]:
        assert m["kept"] == 0 and m["rows_in"] == 0


MINI_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def test_minhash_incremental_drops_within_and_across_batches(spark, tmp_path):
    t_a = "the quick brown fox jumps over the lazy dog again and again ok"
    t_b = "completely different content about distributed query engines here"
    t_c = "a third unrelated document mentioning polygons tiles and rasters"
    t_d = "yet another novel text with its own vocabulary entirely separate"
    b1 = spark.createDataFrame(
        [(1, t_a), (2, t_b), (3, t_c), (4, t_a)], MINI_SCHEMA)  # 4 dups 1
    b2 = spark.createDataFrame(
        [(10, t_b), (11, t_d)], MINI_SCHEMA)                    # 10 dups 2
    b1.write.mode("overwrite").parquet(str(tmp_path / "in" / "b1"))
    _run(spark, tmp_path, "minhash")
    b2.write.mode("overwrite").parquet(str(tmp_path / "in" / "b2"))
    _run(spark, tmp_path, "minhash")

    kept = sorted(r.doc_id for r in
                  sd.kept_documents(spark, str(tmp_path / "out")).collect())
    assert kept == [1, 2, 3, 11]
    mets = sd.dedup_metrics(str(tmp_path / "store"))
    assert sum(m["within_dropped"] for m in mets) == 1   # doc 4
    assert sum(m["cross_dropped"] for m in mets) == 1    # doc 10


def test_retry_of_committed_store_partition_is_idempotent(spark, tmp_path):
    """Crash between store/batch=N commit and out/batch=N: the retry must
    not see its own prior attempt's fingerprints (ADVICE r2 regression)."""
    from geoclimate_spark.streaming.dedup import exact_dedup_batch

    d = _docs(spark)
    b0 = d.where(F.col("doc_id") < 100)
    b1 = d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    exact_dedup_batch(b0, 0, store, out)
    exact_dedup_batch(b1, 1, store, out)
    kept_before = sorted(
        int(r.doc_id)
        for r in spark.read.parquet(f"{out}/batch=1").collect())
    store_before = sorted(
        r.fp for r in spark.read.parquet(f"{store}/batch=1").collect())
    assert kept_before  # batch 1 retained something

    # simulate the crash-retry: store/batch=1 exists, rerun batch 1
    exact_dedup_batch(b1, 1, store, out)
    kept_after = sorted(
        int(r.doc_id)
        for r in spark.read.parquet(f"{out}/batch=1").collect())
    store_after = sorted(
        r.fp for r in spark.read.parquet(f"{store}/batch=1").collect())
    assert kept_after == kept_before
    assert store_after == store_before


def test_store_read_prunes_to_batch_buckets(spark, tmp_path):
    """The O(history) fix: a batch's store read must touch ONLY the
    bucket= directories its own fingerprints hash into — proven at the
    file level (input_file_name) and at the plan level (PartitionFilters,
    i.e. pruning happens at listing time, not as a post-scan filter)."""
    import contextlib
    import io

    from geoclimate_spark.streaming.dedup import (
        N_FP_BUCKETS, _read_store, exact_dedup_batch)

    d = _docs(spark)
    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    exact_dedup_batch(d.where(F.col("doc_id") < 200), 0, store, out)
    exact_dedup_batch(
        d.where((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)),
        1, store, out)

    full = _read_store(spark, store)
    all_buckets = sorted(
        int(r.bucket) for r in full.select("bucket").distinct().collect())
    assert len(all_buckets) > 2  # store spans many buckets — non-vacuous
    want = all_buckets[:2]

    pruned = _read_store(spark, store, buckets=want)
    files = [r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()]
    assert files
    assert all(any(f"/bucket={b}/" in f for b in want) for f in files)
    # other buckets exist on disk but must not be listed by the scan
    other_files = [r[0] for r in
                   full.select(F.input_file_name()).distinct().collect()]
    assert any(all(f"/bucket={b}/" not in f for b in want)
               for f in other_files)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1)[1][:300]

    # metrics record which buckets each batch read
    mets = sd.dedup_metrics(store)
    assert all(0 <= b < N_FP_BUCKETS
               for m in mets for b in m["buckets_read"])
