"""Hyperlink extraction: parser semantics on handcrafted html bytes (the
fixture path is covered by test_entry's anchor_text_rollup parametrization)."""

from __future__ import annotations

from geoclimate_spark.operators import links as lk

PAGES = [
    # three anchors back-to-back on one line: non-greedy element match
    (0, "<html><head><title>https://src0.example/d/0</title></head><body>"
        '<nav><a href="https://a.example/p/1">one</a>'
        '<a href="https://b.example/p/2">two words</a>'
        '<a href="https://a.example/q/3">three</a></nav>'
        "<main>body <a href=\"https://decoy.example/x\">in main</a></main>"
        "</body></html>"),
    # anchor text with & and digits; path-less href
    (1, "<html><head><title>https://src1.example/d/1</title></head><body>"
        '<nav><a href="https://c.example">r&d 42</a></nav>'
        "<main>m</main></body></html>"),
    # empty nav: page contributes no rows
    (2, "<html><head><title>https://src2.example/d/2</title></head><body>"
        "<nav></nav><main>m</main></body></html>"),
]


def test_parser_edges(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, page string")
    df = df.selectExpr("doc_id", "encode(page, 'UTF-8') AS html")
    out = (lk.extract_links(df).toPandas()
           .sort_values(["src_id", "dst_host", "anchor"])
           .reset_index(drop=True))
    rows = list(out.itertuples(index=False, name=None))
    # nav-scoped: the decoy anchor inside <main> is NOT extracted
    assert rows == [
        (0, "src0.example", "a.example", "one"),
        (0, "src0.example", "a.example", "three"),
        (0, "src0.example", "b.example", "two words"),
        (1, "src1.example", "c.example", "r&d 42"),
    ]


def test_rollup_counts(spark):
    df = spark.createDataFrame(PAGES, "doc_id long, page string")
    df = df.selectExpr("doc_id", "encode(page, 'UTF-8') AS html")
    out = (lk.anchor_rollup(lk.extract_links(df)).toPandas()
           .set_index("dst_host"))
    assert out.loc["a.example", "n_inlinks"] == 2
    assert out.loc["a.example", "n_src_pages"] == 1
    assert out.loc["a.example", "n_anchor_variants"] == 2
    assert out.loc["a.example", "min_anchor"] == "one"
    assert out.loc["c.example", "n_src_hosts"] == 1
