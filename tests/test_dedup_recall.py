"""LSH recall audit: parity + planted near-dup / far-pair semantics."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "green bottles hang on the wall waiting for a gust of wind "
        "to knock one down and start the counting song all over again")

DOCS = (
    # planted near-dup pair: one-word edit of a long doc (both ids even
    # so the % 2 sample keeps the pair)
    [(0, BASE, "en"), (2, BASE.replace("green", "amber"), "en")]
    # identical twins → jaccard 1.0
    + [(4, "identical twin text content here repeated words", "en"),
       (6, "identical twin text content here repeated words", "en")]
    # unrelated docs
    + [(8 + 2 * i, f"completely unrelated document number {i} talking about "
        f"topic{i} and nothing else of note {i * 17}", "en")
       for i in range(10)]
    # odd ids must be excluded by the sample
    + [(1, BASE, "en"), (3, BASE, "en")]
)


@pytest.fixture(scope="module")
def report(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return df, D.lsh_recall_report(df, threshold=0.8).collect()[0]


def test_semantics(report):
    _, r = report
    assert r.n_docs == len(DOCS) - 2          # odd ids sampled out
    assert r.n_truth >= 2                     # both planted pairs found
    assert r.n_hit <= min(r.n_truth, r.n_cand)
    assert 0 <= r.recall_millis <= 1000
    assert 0 <= r.cand_efficiency_millis <= 1000
    # identical twins MUST be caught by LSH (identical signatures)
    assert r.n_hit >= 1


def test_parity(spark, report):
    df, r = report
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    want = con.execute(
        D.lsh_recall_report_sql(0.8, doc_rel="docs")).fetchdf().iloc[0]
    got = r.asDict()
    for kcol in ("n_docs", "n_truth", "n_cand", "n_hit",
                 "recall_millis", "cand_efficiency_millis"):
        assert got[kcol] == int(want[kcol]), (kcol, got, dict(want))


def test_empty_sample(spark):
    # all-odd ids → empty sample → zero counts, guarded millis
    df = spark.createDataFrame([(1, "a b c", "en"), (3, "d e f", "en")],
                               "doc_id long, text string, lang string")
    r = D.lsh_recall_report(df, threshold=0.8).collect()[0]
    assert (r.n_docs, r.n_truth, r.n_cand, r.n_hit) == (0, 0, 0, 0)
    assert r.recall_millis == 1000 and r.cand_efficiency_millis == 1000


def test_incremental_delta_equals_filtered_full(spark):
    """delta-join ≡ full-recompute-then-filter, and base×base pairs are
    genuinely absent from the incremental result."""
    docs = (
        [(0, BASE, "en"), (4, BASE.replace("green", "teal"), "en")]  # delta twins
        + [(1, BASE, "en"), (5, BASE.replace("fox", "cat"), "en")]   # base twins
        + [(2, BASE.replace("wall", "fence"), "en")]                 # base, near 1
        + [(8 + i, f"filler doc {i} about topic{i} only {i*31}", "en")
           for i in range(8)]
    )
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    inc = {(r.id_a, r.id_b): (r.jaccard, r.pair_kind)
           for r in D.incremental_minhash_delta(df, threshold=0.7).collect()}
    full = {(r.id_a, r.id_b): r.jaccard
            for r in D.minhash_near_duplicates(df, threshold=0.7).collect()}
    want = {p: j for p, j in full.items() if p[0] % 4 == 0 or p[1] % 4 == 0}
    assert {p: j for p, (j, _) in inc.items()} == want
    # the base×base near-dup pair (1,2)/(1,5) exists in full but NOT here
    assert any(p[0] % 4 and p[1] % 4 for p in full), "fixture needs base pairs"
    assert all(p[0] % 4 == 0 or p[1] % 4 == 0 for p in inc)
    # kinds
    for (a, b), (_, kind) in inc.items():
        exp = "delta_vs_delta" if (a % 4 == 0 and b % 4 == 0) else "delta_vs_base"
        assert kind == exp


def test_cluster_cohesion_detects_chaining(spark):
    """A chained cluster (A~B, B~C, A!~C) reports min_jaccard well below
    the pairwise minimum of a tight twin cluster."""
    mid = BASE
    a = "prefix words here " + mid
    c = mid + " suffix words here tail"
    docs = ([(0, a, "en"), (1, mid, "en"), (2, c, "en")]   # chain A~B~C
            + [(10, "entirely different twin corpus text block with many "
                    "unique tokens nobody else repeats anywhere", "en"),
               (11, "entirely different twin corpus text block with many "
                    "unique tokens nobody else repeats anywhere", "en")]
            + [(20 + i, f"noise doc {i} topic{i} {i*13}", "en")
               for i in range(6)])
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = {r.component: r
            for r in D.cluster_cohesion(df, threshold=0.55).collect()}
    assert 0 in rows and 10 in rows
    chain, twins = rows[0], rows[10]
    assert chain.component_size == 3
    assert twins.min_jaccard == 1.0 and twins.max_jaccard == 1.0
    # the chain's weakest verified link sits below the twins' cohesion
    assert chain.min_jaccard < 1.0
    # parity
    import duckdb
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", docs)
    want = con.execute(D.cluster_cohesion_sql(0.55, "docs")).fetchdf()
    got = {(r.component, r.component_size, r.n_pairs,
            r.min_jaccard, r.max_jaccard) for r in rows.values()}
    exp = {(w.component, w.component_size, w.n_pairs,
            w.min_jaccard, w.max_jaccard) for w in want.itertuples()}
    assert got == exp
