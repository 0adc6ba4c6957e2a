"""Hand-case semantics for the round-4 late operators (oracle parity lives
in test_entry): segment-level dedup, bloom-prefiltered blocklist anti-join,
sprawl components."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoclimate_spark import grid
from geoclimate_spark.operators import bloom, segdedup, sprawl, urlnorm


# ------------------------------------------------------------ segment dedup
def _seg_rows(spark, rows, k=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = segdedup.segment_dedup(docs, k=k)
    return {r.doc_id: r for r in out.collect()}


def test_segment_dedup_first_occurrence_wins(spark):
    # doc 1 and doc 2 share the leading 3-token segment; doc 1 wins (lower id)
    rows = [(1, "a b c x y z"), (2, "a b c q r s")]
    got = _seg_rows(spark, rows, k=3)
    assert got[1].n_segs == 2 and got[1].n_kept == 2
    assert got[1].dedup_text == "a b c x y z"
    assert got[2].n_segs == 2 and got[2].n_kept == 1
    assert got[2].dedup_text == "q r s"


def test_segment_dedup_within_doc_repetition(spark):
    # the same segment repeated inside ONE doc keeps only the first copy
    rows = [(5, "a b c a b c a b c")]
    got = _seg_rows(spark, rows, k=3)
    assert got[5].n_segs == 3 and got[5].n_kept == 1
    assert got[5].dedup_text == "a b c"


def test_segment_dedup_fully_duplicate_doc_survives_empty(spark):
    # doc 9 is entirely boilerplate seen in doc 1 -> kept as an empty row
    rows = [(1, "a b c d e f"), (9, "a b c d e f")]
    got = _seg_rows(spark, rows, k=3)
    assert got[9].n_kept == 0 and got[9].dedup_text == ""
    assert set(got) == {1, 9}  # no silent row loss


def test_segment_dedup_tail_segment_and_normalization(spark):
    # 7 tokens at k=3 -> 3 segments, last is the 1-token tail; mixed case +
    # extra whitespace normalize before splitting
    rows = [(3, "  A b C   d E f G ")]
    got = _seg_rows(spark, rows, k=3)
    assert got[3].n_segs == 3 and got[3].n_kept == 3
    assert got[3].dedup_text == "a b c d e f g"


# ------------------------------------------------------------ bloom filter
def test_bloom_result_equals_plain_anti_join(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i % 7}", "en") for i in range(200)],
        "doc_id long, text string, lang string")
    got = bloom.bloom_blocklist_filter(docs, ban_mod=10)
    rows = bloom.fingerprints(docs)
    banned = (rows.where(F.col("doc_id") % 10 == 0)
              .select("fp").distinct())
    want = rows.join(banned, "fp", "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bloom_no_false_negatives_and_actually_prunes(spark):
    # unique texts: blocklist = 10 fps of 500; every banned fp must be
    # bloom-positive, and the bloom must clear most clean rows without the
    # confirm join (prune factor >= 2 is conservative at 20 bits/1024)
    docs = spark.createDataFrame(
        [(i, f"unique text {i}", "en") for i in range(500)],
        "doc_id long, text string, lang string")
    rows = bloom.fingerprints(docs)
    banned = (rows.where(F.col("doc_id") % 50 == 0)
              .select("fp").distinct())
    flagged = bloom.with_bloom_flag(rows, bloom.bloom_bitmap(banned))
    banned_flags = (flagged.join(banned, "fp", "left_semi")
                    .select("bloom_maybe").collect())
    assert banned_flags and all(r.bloom_maybe for r in banned_flags)
    n_maybe = flagged.where(F.col("bloom_maybe")).count()
    assert n_maybe < 250, f"bloom did not prune: {n_maybe}/500 positive"


# ------------------------------------------------------------ k-means train
def _np_kmeans(vecs, k, iters, q=1 << 20):
    import math
    qv = [[math.floor(x * q) for x in v] for v in vecs]
    cents = {c: list(qv[c]) for c in range(k)}

    def assign():
        out = []
        for i, v in enumerate(qv):
            best = min(((sum((a - b) ** 2 for a, b in zip(v, cents[c])), c)
                        for c in sorted(cents)), key=lambda t: t)
            out.append((i, best[1], best[0]))
        return out

    for _ in range(iters):
        asg = assign()
        for c in sorted(cents):
            members = [qv[i] for i, cl, _ in asg if cl == c]
            if members:
                cents[c] = [math.floor(sum(col) / len(members))
                            for col in zip(*members)]
    return assign()


def test_kmeans_matches_python_reference_and_handles_empty_cluster(spark):
    from geoclimate_spark.operators import kmeans
    # seeds 0 and 1 identical -> cluster 1 empties on round 1 and must keep
    # its previous centroid (the coalesce path), exactly like the reference
    vecs = [[0.1, 0.2, -0.3, 0.4], [0.1, 0.2, -0.3, 0.4],
            [5.0, 5.1, 4.9, 5.2], [5.1, 5.0, 5.0, 5.1],
            [-3.0, -3.1, -2.9, -3.0], [0.15, 0.22, -0.28, 0.41]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = sorted(map(tuple, kmeans.kmeans_assignments(
        df, k=2, iters=2, dim=4).collect()))
    # the engine quantizes the stored FLOAT32 values; mirror that exactly
    import numpy as np
    f32 = [list(map(float, np.array(v, dtype=np.float32))) for v in vecs]
    want = sorted(_np_kmeans(f32, k=2, iters=2))
    assert got == want


# --------------------------------------------------- vocab coverage / top-k
def test_vocab_coverage_matches_naive_window(spark):
    """The bucketed two-phase cumsum must equal the naive global-order
    cumsum on a tie-heavy vocabulary (many cf=1 terms across first chars)."""
    from geoclimate_spark.operators import vocab
    texts = ["the the the cat sat", "a dog sat", "zebra ant cat",
             "bee ant apple zoo"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = sorted(map(tuple, vocab.vocab_coverage(docs).collect()))
    # naive reference computed in plain python
    from collections import Counter
    cf, dfreq = Counter(), Counter()
    for t in texts:
        toks = t.split()
        cf.update(toks)
        dfreq.update(set(toks))
    order = sorted(cf, key=lambda w: (-cf[w], w))
    total = sum(cf.values())
    want, cum = [], 0
    for i, w in enumerate(order):
        cum += cf[w]
        want.append((w, cf[w], dfreq[w], i + 1, cum / total))
    assert got == sorted(want)


def test_salted_topk_equals_plain_rank(spark):
    from pyspark.sql import Window

    from geoclimate_spark.operators import skew
    rows = [(i % 3, i, (i * 37) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "grp long, rid long, v long")
    got = skew.salted_topk(df, "grp", "v", "rid", k=4, n_salts=5,
                           id_col="rid")
    w = Window.partitionBy("grp").orderBy(F.col("v").desc(),
                                          F.col("rid").asc())
    want = (df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 4)
            .select("grp", F.col("rank").cast("long"), "rid", "v"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ----------------------------------------------------------- exact quantiles
def test_exact_quantiles_matches_numpy_linear(spark):
    import numpy as np

    from geoclimate_spark.operators import zonal
    vals = {1: [3, 1, 4, 1, 5, 9, 2, 6], 2: [10], 3: [7, 7, 7, 2]}
    rows = [(k, v) for k, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "zone_id long, chars long")
    got = {r.zone_id: r for r in
           zonal.exact_quantiles(df, "zone_id", "chars").collect()}
    for z, vs in vals.items():
        assert got[z].n_rows == len(vs)
        for q in (25, 50, 75, 95):
            want = float(np.percentile(vs, q))  # linear interpolation
            have = getattr(got[z], f"p{q}_chars")
            assert abs(have - want) < 1e-9, (z, q, have, want)


# ------------------------------------------------------ url canonicalization
def test_canonical_url_collapses_all_noise_forms(spark):
    variants = [
        "https://www.Example.COM/page/7",
        "http://example.com/page/7/",
        "https://example.com/page/7?utm_source=feed",
        "http://WWW.EXAMPLE.com/page/7#sec1",
        "https://www.example.com/page/7/?utm_source=feed#sec1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "raw_url string")
    got = {r.c for r in df.select(
        urlnorm.canonical_url_col(df.raw_url).alias("c")).collect()}
    assert got == {"example.com/page/7"}


def test_canonical_url_keeps_real_query_params(spark):
    # only utm_* tracking queries are stripped; a real query survives
    df = spark.createDataFrame(
        [("https://example.com/search?q=spark",)], "raw_url string")
    got = df.select(urlnorm.canonical_url_col(df.raw_url).alias("c")).head().c
    assert got == "example.com/search?q=spark"


def test_latest_crawl_per_url_keeps_newest(spark):
    crawls = spark.createDataFrame(
        [(1, "http://a.com/x", 100), (2, "https://www.a.com/x/", 300),
         (3, "https://a.com/x#f", 200), (9, "http://b.com/y", 50)],
        "crawl_id long, raw_url string, fetch_epoch long")
    got = {r.canon_url: r for r in
           urlnorm.latest_crawl_per_url(crawls).collect()}
    assert got["a.com/x"].last_crawl_id == 2
    assert got["a.com/x"].n_crawls == 3
    assert got["a.com/x"].last_fetch_epoch == 300
    assert got["b.com/y"].n_crawls == 1


def test_canonical_url_spark_duckdb_parity(spark):
    """The regex chain must evaluate identically under Java regex (engine)
    and RE2 (oracle) over the whole fixture noise space."""
    import duckdb
    frags = urlnorm.url_crawl_fixture_sql("i")
    ids = spark.range(0, 64).select(F.col("id").alias("i"))
    eng = [r.c for r in ids.select(
        urlnorm.canonical_url_col(F.expr(frags["raw_url"])).alias("c"))
        .orderBy("c").collect()]
    ora = [r[0] for r in duckdb.sql(
        f"SELECT {urlnorm.canonical_url_sql(frags['raw_url'])} AS c "
        f"FROM range(64) t(i) ORDER BY c").fetchall()]
    assert eng == ora


# -------------------------------------------------------- sprawl components
def _pack(res, x, y):
    return (res << 58) + (x << 29) + y


def test_sprawl_components_shapes_and_rollup(spark):
    res = 5
    # L-shaped blob {(2,2),(3,2),(3,3)}, isolated dense (8,8), diagonal-only
    # neighbor (5,5)/(6,6) must NOT merge (rook, not queen), sparse (4,2)
    # filtered out by the threshold
    tiles = [(_pack(res, 2, 2), 5), (_pack(res, 3, 2), 7), (_pack(res, 3, 3), 2),
             (_pack(res, 8, 8), 9), (_pack(res, 5, 5), 3), (_pack(res, 6, 6), 3),
             (_pack(res, 4, 2), 1)]
    df = spark.createDataFrame(tiles, "tile_id long, n_pages long")
    got = {r.component: (r.n_tiles, r.total_pages)
           for r in sprawl.sprawl_components(df, res, dense_min=2).collect()}
    assert got[_pack(res, 2, 2)] == (3, 14)       # the L blob
    assert got[_pack(res, 8, 8)] == (1, 9)        # isolated singleton
    assert got[_pack(res, 5, 5)] == (1, 3)        # diagonal does not connect
    assert got[_pack(res, 6, 6)] == (1, 3)
    assert _pack(res, 4, 2) not in got            # below threshold
    assert len(got) == 4


def test_sprawl_lon_wrap_connects_across_antimeridian(spark):
    res = 5
    nx = grid.nx(res)
    tiles = [(_pack(res, 0, 7), 4), (_pack(res, nx - 1, 7), 4)]
    df = spark.createDataFrame(tiles, "tile_id long, n_pages long")
    out = sprawl.sprawl_components(df, res, dense_min=2).collect()
    assert len(out) == 1 and out[0].n_tiles == 2 and out[0].total_pages == 8


def test_sprawl_pole_clamp_no_phantom_neighbors(spark):
    res = 5
    ny = grid.ny(res)
    # y=0 and y=ny-1 rows: the out-of-range y neighbors must be dropped,
    # not wrapped onto each other
    tiles = [(_pack(res, 3, 0), 4), (_pack(res, 3, ny - 1), 4)]
    df = spark.createDataFrame(tiles, "tile_id long, n_pages long")
    out = sprawl.sprawl_components(df, res, dense_min=2).collect()
    assert len(out) == 2 and all(r.n_tiles == 1 for r in out)
