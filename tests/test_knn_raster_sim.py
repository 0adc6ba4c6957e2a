"""kNN, raster zonal stats, similarity search vs DuckDB oracles."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geoclimate_spark.operators import knn, raster, similarity

SF = "/root/testdata/sf0.001"


def _cmp(spark_df, duck, sql, sort_cols):
    got = spark_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    exp = duck.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got, exp = got[sorted(got.columns)], exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    return got


# Synthetic points from doc_id — deterministic, clustered + sparse.
_PTS_SQL = """
SELECT doc_id AS page_id,
       CAST((doc_id * 48271 + 11) % 2147483647 % 360000001 - 180000000 AS BIGINT) AS lon_e6,
       CAST((doc_id * 16807 + 7) % 2147483647 % 140000001 - 70000000 AS BIGINT) AS lat_e6
FROM documents"""


def _pts(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select(F.col("doc_id").alias("page_id"),
                    ((F.col("doc_id") * 48271 + 11) % 2147483647 % 360000001
                     - 180000000).alias("lon_e6"),
                    ((F.col("doc_id") * 16807 + 7) % 2147483647 % 140000001
                     - 70000000).alias("lat_e6")))


def test_nearest_neighbor_radius(spark, duck):
    R = 30_000_000  # 30 degrees — sparse global points need a big radius
    pts = _pts(spark)
    nbs = pts.select(F.col("page_id").alias("nb_id"), "lon_e6", "lat_e6")
    got = _cmp(knn.nearest_neighbor(pts, nbs, R), duck,
               knn.nearest_neighbor_sql(
                   _PTS_SQL, _PTS_SQL.replace("AS page_id", "AS nb_id"), R),
               ["page_id"])
    assert len(got) == pts.count()
    found = got[got.nn_id >= 0]
    assert len(found) > 0
    assert (found.nn_dist <= R).all()
    assert (got[got.nn_id < 0].n_within == 0).all()


def test_pick_res_for_radius():
    for r_e6, want in ((2_000_000, 6), (30_000_000, 2), (200_000, 9)):
        res = knn.pick_res_for_radius(r_e6)
        assert res == want, (r_e6, res)
        # cell width at res must cover the radius
        assert 360_000_000 // (1 << (res + 1)) >= r_e6


def test_raster_zonal(spark, duck):
    got = _cmp(raster.raster_zonal_stats(raster.raster_df(spark),
                                         raster.zone_bounds_df(spark)),
               duck, raster.raster_zonal_stats_sql(), ["zone_id"])
    assert len(got) == 84
    assert got.wmean_value.between(0, 1000).all()
    # total overlap area equals the full sphere rectangle (zones tile it)
    assert got.overlap_e6sq.sum() == 360_000_000 * 180_000_000


def test_cosine_topk(spark, duck):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3]
    got = _cmp(similarity.cosine_topk(emb, qids, k=5), duck,
               similarity.cosine_topk_sql(qids, k=5), ["query_id", "rank"])
    assert len(got) == 4 * 5
    for q in qids:
        sub = got[got.query_id == q]
        assert list(sub.sort_values("rank")["cos"]) == sorted(sub.cos, reverse=True)


def test_cosine_pairs(spark, duck):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _cmp(similarity.cosine_pairs(emb, threshold=0.4), duck,
               similarity.cosine_pairs_sql(threshold=0.4), ["id_a", "id_b"])
    assert (got.cos >= 0.4).all()


def test_cosine_pairs_plan_only_no_driver_job(spark):
    """Constructing the exact all-pairs plan must not run ANY Spark job —
    i.e. no corpus collect() to the driver (the round-1 scale-killer)."""
    sc = spark.sparkContext
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    sc.setJobGroup("plan-only-guard", "no job may run during plan construction")
    try:
        df = similarity.cosine_pairs(emb, threshold=0.4)
        df2 = similarity.cosine_pairs_lsh(emb, threshold=0.4)
        assert sc.statusTracker().getJobIdsForGroup("plan-only-guard") == []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert df.columns == ["id_a", "id_b", "cos"]
    assert df2.columns == ["id_a", "id_b", "cos"]


def test_cosine_pairs_lsh(spark, duck):
    """Banded-LSH pairs hash-match the banded oracle, and (being a pruned
    candidate set) are a subset of the exact all-pairs result."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = _cmp(similarity.cosine_pairs_lsh(emb, threshold=0.4), duck,
               similarity.cosine_pairs_lsh_sql(threshold=0.4), ["id_a", "id_b"])
    exact = similarity.cosine_pairs(emb, threshold=0.4).toPandas()
    exact_keys = set(zip(exact.id_a, exact.id_b))
    assert set(zip(got.id_a, got.id_b)) <= exact_keys
    assert (got.cos >= 0.4).all()


def test_cosine_pairs_lsh_finds_planted_duplicates(spark):
    """An exact copy has identical signs in every band → must be found."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3]
    copies = (emb.where(F.col("vec_id").isin(qids))
              .select((F.col("vec_id") + 100000).alias("vec_id"),
                      "embedding", "label"))
    got = similarity.cosine_pairs_lsh(emb.unionByName(copies),
                                      threshold=0.999).toPandas()
    found = set(zip(got.id_a, got.id_b))
    for q in qids:
        assert (q, q + 100000) in found


def test_lsh_topk_matches_oracle_and_recall(spark, duck):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3]
    got = _cmp(similarity.lsh_topk(emb, qids, k=5), duck,
               similarity.lsh_topk_sql(qids, k=5), ["query_id", "rank"])
    assert set(got.query_id) <= set(qids)


def test_lsh_finds_planted_duplicates(spark):
    """An exact copy has identical hyperplane signs → guaranteed same bucket
    → LSH must rank it first (cos = 1)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = [0, 1, 2, 3]
    copies = (emb.where(F.col("vec_id").isin(qids))
              .select((F.col("vec_id") + 100000).alias("vec_id"),
                      "embedding", "label"))
    got = similarity.lsh_topk(emb.unionByName(copies), qids, k=3).toPandas()
    top1 = got[got["rank"] == 1].set_index("query_id")["vec_id"]
    for q in qids:
        assert top1[q] == q + 100000


def test_multiprobe_recall_dominates_single_probe(spark):
    """Hamming-1 multi-probe must retrieve a superset-or-equal candidate
    pool: recall vs exact brute-force top-k is >= single-probe recall."""
    import __spark_entry__ as E
    from geoclimate_spark.operators import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = E.ANN_QUERY_IDS
    k = E.ANN_K
    truth = {(r.query_id, r.vec_id)
             for r in similarity.cosine_topk(emb, qids, k).collect()}
    single = {(r.query_id, r.vec_id)
              for r in similarity.lsh_topk(emb, qids, k).collect()}
    multi = {(r.query_id, r.vec_id)
             for r in similarity.lsh_topk_multiprobe(emb, qids, k).collect()}
    r1 = len(single & truth) / len(truth)
    rm = len(multi & truth) / len(truth)
    assert rm >= r1
    # deterministic fixture: radius-1 probing doubles single-probe recall
    assert rm >= 2 * r1 > 0
    r2 = {(r.query_id, r.vec_id)
          for r in similarity.lsh_topk_multiprobe(
              emb, qids, k, probe_radius=2).collect()}
    assert len(r2 & truth) / len(truth) > rm  # radius 2 keeps improving


def test_multitable_recall_dominates_multiprobe(spark, duck):
    """3 independent tables at radius 1: candidate pool is a superset of
    table 0 alone (= multiprobe radius 1), so recall dominates; on the
    fixture the independent tables lift recall well past any single-table
    radius-1 probe. Also oracle-exact vs DuckDB."""
    import __spark_entry__ as E
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids = E.ANN_QUERY_IDS
    k = E.ANN_K
    truth = {(r.query_id, r.vec_id)
             for r in similarity.cosine_topk(emb, qids, k).collect()}
    mp = {(r.query_id, r.vec_id)
          for r in similarity.lsh_topk_multiprobe(emb, qids, k).collect()}
    mt = {(r.query_id, r.vec_id)
          for r in similarity.lsh_topk_multitable(emb, qids, k).collect()}
    r_mp = len(mp & truth) / len(truth)
    r_mt = len(mt & truth) / len(truth)
    assert r_mt >= r_mp
    assert r_mt >= 1.5 * r_mp  # independent tables, not marginal gain
    _cmp(similarity.lsh_topk_multitable(emb, qids, k), duck,
         similarity.lsh_topk_multitable_sql(qids, k), ["query_id", "rank"])


def test_ivf_nprobe_recall_dominates_single_probe(spark, duck):
    """nprobe=3 probes a superset of inverted lists → candidate pool and
    recall dominate single-probe; oracle-exact vs DuckDB. Measured at
    sf0.01: nprobe 1/2/3 → recall 0.275/0.475/0.650."""
    import __spark_entry__ as E
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids, k = E.ANN_QUERY_IDS, E.ANN_K
    truth = {(r.query_id, r.vec_id)
             for r in similarity.cosine_topk(emb, qids, k).collect()}
    r = {}
    for p in (1, 3):
        got = {(r_.query_id, r_.vec_id)
               for r_ in similarity.ivf_topk(emb, qids, k, nprobe=p).collect()}
        r[p] = len(got & truth) / len(truth)
    assert r[3] >= r[1]
    _cmp(similarity.ivf_topk(emb, qids, k, nprobe=3), duck,
         similarity.ivf_topk_sql(qids, k, nprobe=3), ["query_id", "rank"])


def test_ivf_pq_rerank_exact_cos_and_recall(spark, duck):
    """IVF-PQ: ADC over 16×8 product codes prunes each probed list to a
    rerank*k pool, exact cosine re-ranks the pool — so every returned cos
    equals the brute-force cos for that pair (the rerank stage reads full
    vectors), and recall is bounded by the probed lists. Oracle-exact vs
    DuckDB (codes, LUT, ADC and rerank all replayed in SQL). Measured
    recall at sf0.001: 0.375 (defaults); sf0.01: 0.625."""
    import __spark_entry__ as E
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qids, k = E.ANN_QUERY_IDS, E.ANN_K
    brute = {(r.query_id, r.vec_id): r.cos
             for r in similarity.cosine_topk(emb, qids, k).collect()}
    got = similarity.ivf_pq_topk(emb, qids, k).collect()
    hits = [r for r in got if (r.query_id, r.vec_id) in brute]
    assert hits, "PQ found none of the true top-k"
    for r in hits:  # returned cos is EXACT, not the ADC approximation
        assert r.cos == brute[(r.query_id, r.vec_id)]
    _cmp(similarity.ivf_pq_topk(emb, qids, k), duck,
         similarity.ivf_pq_topk_sql(qids, k), ["query_id", "rank"])
