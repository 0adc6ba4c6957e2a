"""Invariants for the curation/packing/repetition operators (sf0.001).

Exact engine-vs-oracle parity is covered by tests/test_entry.py (these four
queries are registered in __spark_entry__); here we pin the *semantic*
invariants that the hash comparison alone would not explain if it broke.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_packing_conserves_tokens_and_chunks_are_contiguous(spark):
    from geoclimate_spark.functions.text import text_metrics_cols

    packed = E.queries()["packed_sequences"](spark, SF_SMOKE)
    rows = packed.collect()
    cols = text_metrics_cols(F.col("text"))
    total = (_docs(spark).select(cols["n_tokens"].alias("n"))
             .agg(F.sum("n")).collect()[0][0])
    assert sum(r.tok_total for r in rows) == total
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.chunk_id)
    for shard, chunks in by_shard.items():
        chunks.sort()
        assert chunks[0] == 0, shard
        assert chunks == list(range(len(chunks))), shard
    # every chunk except each shard's last must end at/past its boundary:
    # its docs' cumulative span covers ≥ budget tokens per full chunk.
    for shard, chunks in by_shard.items():
        tot = sum(r.tok_total for r in rows if r.shard == shard)
        assert tot >= E.PACK_BUDGET * (len(chunks) - 1)


def test_stratified_sample_quota_and_determinism(spark):
    out1 = E.queries()["stratified_sample_lang"](spark, SF_SMOKE).collect()
    out2 = E.queries()["stratified_sample_lang"](spark, SF_SMOKE).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per = {}
    for r in out1:
        per[r.stratum] = per.get(r.stratum, 0) + 1
        assert 1 <= r.rank <= E.SAMPLE_QUOTA
    assert all(v <= E.SAMPLE_QUOTA for v in per.values())


def test_domain_curation_blocklist_cap_quality(spark):
    out = E.queries()["domain_curation"](spark, SF_SMOKE).collect()
    per = {}
    for r in out:
        assert r.domain not in E.DOMAIN_BLOCKED
        assert r.quality >= E.CURATE_MIN_QUALITY
        per[r.domain] = per.get(r.domain, 0) + 1
    assert all(v <= E.DOMAIN_CAP for v in per.values())
    assert len(per) > 1


def test_repetition_metrics_bounds(spark):
    out = E.queries()["repetition_metrics"](spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        # the most frequent bigram exists at least once
        assert 0.0 < r.top_bigram_frac <= 1.0
        # top bigram can't be rarer than the mean when there are duplicates
        assert r.top_bigram_frac >= 1.0 / max(r.n_tokens - 1, 1)


def test_repetition_detects_repeated_text(spark):
    from geoclimate_spark.operators.repetition import repetition_metrics

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert got[1].dup_token_frac > 0.8
    assert got[1].top_bigram_frac == 1.0
    assert got[2].dup_token_frac == 0.0
    assert got[2].dup_bigram_frac == 0.0


def test_grouped_split(spark):
    """Every group lands in exactly one split; counts conserve; parity."""
    import duckdb
    from geoclimate_spark.operators import curation as CU
    docs = [(i, "t", "en", 10 + i) for i in range(300)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, n_chars long")
    gexpr = "concat('h', CAST(doc_id % 23 AS STRING), '.example.com')"
    rows = CU.grouped_split(df, gexpr).collect()
    assert sum(r.n_docs for r in rows) == 300
    assert sum(r.n_groups for r in rows) == 23   # partition of the groups
    assert all(r.n_straddling_groups == 0 for r in rows)
    # all three splits materialize on 23 groups at 80/10/10 only if the
    # hash lands that way — at least train must be populated
    assert any(r.split == "train" and r.n_docs > 0 for r in rows)
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar,"
                " lang varchar, n_chars bigint)")
    con.executemany("insert into docs values (?, ?, ?, ?)", docs)
    want = con.execute(CU.grouped_split_sql(
        "docs", gexpr.replace("AS STRING", "AS VARCHAR"))).fetchdf()
    got = {r.split: (r.n_docs, r.n_groups, r.chars_total,
                     r.n_straddling_groups) for r in rows}
    exp = {w.split: (w.n_docs, w.n_groups, w.chars_total,
                     w.n_straddling_groups) for w in want.itertuples()}
    assert got == exp
