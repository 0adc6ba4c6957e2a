"""Hand-case semantics for ExactSubstr-style duplicate-span coverage/trim
(oracle parity lives in test_entry / the driver gate)."""

from __future__ import annotations

from geoclimate_spark.operators import dupspan


def _rows(spark, rows, n=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dupspan.duplicate_spans(docs, n=n)
    assert out.columns == ["doc_id", "n_tokens", "n_windows", "n_dup_windows",
                           "dup_tokens", "dup_fraction", "trimmed_text"]
    return {r.doc_id: r for r in out.collect()}


def test_cross_doc_span_marks_both_sides(spark):
    got = _rows(spark, [(1, "a b c d e"), (2, "x a b c y")], n=3)
    assert got[1].n_windows == 3 and got[1].n_dup_windows == 1
    assert got[1].dup_tokens == 3 and got[1].dup_fraction == 3 / 5
    assert got[1].trimmed_text == "d e"
    assert got[2].n_dup_windows == 1 and got[2].dup_tokens == 3
    assert got[2].trimmed_text == "x y"


def test_within_doc_repeat_interval_union(spark):
    # n=3 windows: abc bcd cda dab abc bcd -> abc/bcd repeat; their four
    # occurrences cover positions 0-2,1-3,4-6,5-7 = ALL 8 tokens, yet only
    # 4 of 6 windows are duplicated (interval UNION, not window count * n)
    got = _rows(spark, [(7, "a b c d a b c d")], n=3)
    assert got[7].n_windows == 6 and got[7].n_dup_windows == 4
    assert got[7].dup_tokens == 8 and got[7].dup_fraction == 1.0
    assert got[7].trimmed_text == ""


def test_short_and_unique_docs_pass_through(spark):
    got = _rows(spark, [(1, "a b"), (2, "p q r s t")], n=3)
    assert got[1].n_windows == 0 and got[1].dup_tokens == 0
    assert got[1].trimmed_text == "a b"           # too short to window
    assert got[2].n_dup_windows == 0
    assert got[2].trimmed_text == "p q r s t"     # unique prose untouched
    assert set(got) == {1, 2}                     # no silent row loss


def _h60(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_decontaminate_trim_removes_benchmark_spans(spark):
    # benchmark = lowest (hash60(str(id)), id); build the corpus AROUND the
    # carve so the test is deterministic whichever id wins
    ids = [1, 2, 3]
    bench = min(ids, key=lambda i: (_h60(str(i)), i))
    victim, clean = [i for i in ids if i != bench]
    texts = {bench: "alpha beta gamma delta eps zeta",
             victim: "x y alpha beta gamma delta eps q r",
             clean: "p q r s t u"}
    docs = spark.createDataFrame([(i, texts[i]) for i in ids],
                                 "doc_id long, text string")
    out = dupspan.decontaminate_trim(docs, bench_quota=1, n=5)
    got = {r.doc_id: r for r in out.collect()}
    assert set(got) == {victim, clean}  # benchmark rows are excluded
    # victim: exactly one 5-gram window collides (pos 2: 'alpha beta gamma
    # delta eps'); coverage = positions 2-6 of 9 tokens
    v = got[victim]
    assert v.n_hit_windows == 1 and v.contam_tokens == 5
    assert v.contam_fraction == 5 / 9
    assert v.clean_text == "x y q r"
    # clean doc shares tokens (q, r) but no 5-gram: untouched passthrough
    c = got[clean]
    assert c.n_hit_windows == 0 and c.contam_tokens == 0
    assert c.clean_text == "p q r s t u"


def test_normalization_and_empty_doc(spark):
    # mixed case/whitespace normalizes BEFORE windowing; '' tokenizes to
    # [''] on both engines so n_tokens >= 1 and the fraction is total
    got = _rows(spark, [(1, "  A  b C d  "), (2, "a b c d"), (3, "")], n=3)
    assert got[1].dup_tokens == 4 and got[1].trimmed_text == ""
    assert got[2].dup_tokens == 4 and got[2].trimmed_text == ""
    assert got[3].n_tokens == 1 and got[3].dup_fraction == 0.0
    assert got[3].trimmed_text == ""


def test_duplication_spectrum(spark):
    from geoclimate_spark.operators import dupspan as DS
    long_copy = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, long_copy + " unique tail zero", "en"),
        (1, long_copy + " unique tail one", "en"),    # shares a 10-token run
        (2, "totally different text with no repeats at all here", "en"),
        (3, "x y x y x y x y", "en"),                 # short-window self-dup
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    rows = {r.window_len: r
            for r in DS.duplication_spectrum(df, (2, 4, 8)).collect()}
    # the 10-token shared run duplicates windows at every length <= 10
    assert rows[8].dup_windows >= 2 and rows[8].dup_docs >= 2
    # short windows catch the x-y repetition too
    assert rows[2].dup_docs >= 3
    # monotonicity: longer windows can only reduce the duplicated share
    assert (rows[2].dup_window_millis >= rows[4].dup_window_millis
            >= rows[8].dup_window_millis)
    # parity
    import duckdb
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", docs)
    want = con.execute(
        DS.duplication_spectrum_sql((2, 4, 8), "docs")).fetchdf()
    for r in want.itertuples():
        e = rows[r.window_len]
        assert (e.total_windows, e.dup_windows, e.dup_docs,
                e.dup_window_millis) == (r.total_windows, r.dup_windows,
                                         r.dup_docs, r.dup_window_millis)


def test_dup_decision_shuffles_hash_not_text(spark):
    """VERDICT r4 'weak' fix: the duplicate-decision exchanges must carry
    hash60 keys, never the window text. Inspect every Exchange in the
    executed plan of the dup-window count subplan: no `gram` column may
    appear in any hashpartitioning key set."""
    import re
    docs = spark.createDataFrame(
        [(i, "w%d a b c d e f g h" % (i % 3)) for i in range(30)],
        "doc_id long, text string")
    for df in (dupspan.duplicate_spans(docs),
               dupspan.duplication_spectrum(docs, lengths=(4, 8))):
        plan = df._jdf.queryExecution().executedPlan().toString()
        for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
            assert "gram" not in m.group(1), m.group(0)
        # the gh-keyed exchanges must exist (the decision IS shuffled)
        assert re.search(r"Exchange hashpartitioning\(gh", plan)


def test_span_dedup_recall_report_hand_case(spark):
    """Aligned duplication is caught (recall contribution); off-alignment
    duplication inside segments is missed — the loss the report measures."""
    # two docs sharing an identical 12-token prefix (aligned segment dup
    # AND exact 8-gram dup), plus unique tails long enough to avoid other
    # dup windows
    shared = " ".join(f"s{i}" for i in range(12))
    t1 = shared + " " + " ".join(f"a{i}" for i in range(12))
    t2 = shared + " " + " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame([(1, t1), (2, t2)],
                                 "doc_id long, text string")
    r = dupspan.span_dedup_recall_report(docs, n=8, k=12).collect()[0]
    # exact coverage: the shared 12 tokens in each doc = 24; the 8-windows
    # spanning into the tails differ between docs, so exactly 24
    assert r.exact_dup_tokens == 24
    # segment dedup at k=12: segment 0 of both docs is `shared` -> dup;
    # covers 12 tokens per doc = 24; fully inside the exact coverage
    assert r.seg_dup_tokens == 24
    assert r.caught_tokens == 24
    assert r.recall_millis == 1000 and r.precision_millis == 1000
    # now shift doc 2's copy by one token: segments no longer align ->
    # segment dedup catches nothing, exact coverage persists
    t3 = "x0 " + shared + " " + " ".join(f"c{i}" for i in range(11))
    docs2 = spark.createDataFrame([(1, t1), (2, t3)],
                                  "doc_id long, text string")
    r2 = dupspan.span_dedup_recall_report(docs2, n=8, k=12).collect()[0]
    assert r2.exact_dup_tokens == 24
    assert r2.seg_dup_tokens == 0 and r2.caught_tokens == 0
    assert r2.recall_millis == 0


def test_span_recall_ignores_empty_docs(spark):
    """Repeated empty-normalized docs must NOT contribute phantom
    duplicated segment tokens (they have zero tokens)."""
    shared = " ".join(f"s{i}" for i in range(12))
    t1 = shared + " " + " ".join(f"a{i}" for i in range(12))
    t2 = shared + " " + " ".join(f"b{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, ""), (4, "   "), (5, "")],
        "doc_id long, text string")
    r = dupspan.span_dedup_recall_report(docs, n=8, k=12).collect()[0]
    assert r.seg_dup_tokens == 24  # unchanged by the three empty docs
    assert r.exact_dup_tokens == 24 and r.caught_tokens == 24
