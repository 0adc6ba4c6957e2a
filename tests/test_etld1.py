"""Registrable-domain (eTLD+1) rollup: parity + grouping semantics."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.operators import urlnorm as U

# ids chosen to hit every host shape for owner group 3 (3, 18, 33, ...)
DOCS = [(i, "w", "en") for i in range(40)]


@pytest.fixture(scope="module")
def frames(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    return df, con


def test_parity_and_grouping(frames):
    df, con = frames
    got = U.etld1_rollup(df).toPandas()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    want = con.execute(U.etld1_rollup_sql("docs")).fetchdf()[cols]\
        .sort_values(cols).reset_index(drop=True).astype(g.dtypes.to_dict())
    assert g.equals(want), g.compare(want) if len(g) == len(want) \
        else (len(g), len(want))

    by = {r.etld1: r for r in got.itertuples()}
    # plain + www host shapes collapse into one .com registrable domain
    # (doc_id 0 → site0.com, doc_id 6 → www.site6.com, …)
    assert "site0.com" in by and "site1.com" in by
    # second-level suffix: blog.siteN.co.uk groups under siteN.co.uk,
    # NOT under co.uk (the naive last-two-labels bug)
    assert not any(k == "co.uk" for k in by)
    assert not any(k == "com.au" for k in by)
    assert any(k.endswith(".co.uk") and k.count(".") == 2 for k in by)
    # deep subdomain under a second-level suffix: a.b.siteN.com.au →
    # siteN.com.au
    assert any(k.endswith(".com.au") and k.count(".") == 2 for k in by)


def test_etld1_expr_cases(spark):
    from pyspark.sql import functions as F
    hosts = ["example.com", "www.example.com", "a.b.example.com",
             "example.co.uk", "deep.example.co.uk", "localhost",
             "x.com.br", "y.x.com.br"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r.host: r.e for r in
           df.select("host", F.expr(U._etld1_expr("host")).alias("e"))
           .collect()}
    assert got["example.com"] == "example.com"
    assert got["www.example.com"] == "example.com"
    assert got["a.b.example.com"] == "example.com"
    assert got["example.co.uk"] == "example.co.uk"
    assert got["deep.example.co.uk"] == "example.co.uk"
    assert got["localhost"] == "localhost"
    # com.br IS a listed suffix: x.com.br is already registrable
    assert got["x.com.br"] == "x.com.br"
    assert got["y.x.com.br"] == "x.com.br"
    con = duckdb.connect()
    for h in hosts:
        (e,) = con.execute(
            f"SELECT {U._etld1_sql(repr(h))}").fetchone()
        assert e == got[h], (h, e, got[h])


def test_surt_transform(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, "https://www.Blog.Example.co.uk/Posts/1?utm_source=x"),
         (2, "http://example.com/"),
         (3, "https://a.b.site.com.au/deep/path#frag")],
        "crawl_id long, raw_url string")
    rows = {r.crawl_id: r for r in U.surt_keys(df).collect()}
    # www stripped by canonicalization, labels reversed, path preserved
    assert rows[1].surt == "uk,co,example,blog)/posts/1"
    assert rows[1].surt_host == "uk,co,example,blog"
    assert rows[2].surt == "com,example)"        # trailing slash canonical
    assert rows[3].surt == "au,com,site,b,a)/deep/path"
    # the layout property: subdomains of one domain sort contiguously
    hosts = ["com,example", "com,example,www", "com,examplez", "com,exb"]
    assert sorted(hosts)[:2] == ["com,example", "com,example,www"]


def test_surt_parity(spark):
    df = spark.createDataFrame(
        [(i, f"https://s{i % 3}.site{i % 4}.com/p/{i}") for i in range(24)],
        "crawl_id long, raw_url string")
    got = U.surt_keys(df).toPandas()
    con = duckdb.connect()
    con.execute("create table crawls as select * from got")
    # rebuild from the raw urls only
    con.execute("create table raw (crawl_id bigint, raw_url varchar)")
    con.executemany("insert into raw values (?, ?)",
                    [(i, f"https://s{i % 3}.site{i % 4}.com/p/{i}")
                     for i in range(24)])
    want = con.execute(U.surt_keys_sql("SELECT * FROM raw")).fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(
        g.dtypes.to_dict())
    assert g.equals(w)


def test_psl_wildcard_and_exception_rules(spark):
    """VERDICT r4 gap #3: the PSL algorithm's wildcard (`*.ck`,
    `*.kawasaki.jp`) and exception (`!www.ck`, `!city.kawasaki.jp`) rules,
    private-section hosting domains, and bare public suffixes — engine and
    DuckDB dual agree on every case."""
    from pyspark.sql import functions as F
    cases = {
        # *.ck: any single label under .ck is a public suffix
        "isle.ck": "isle.ck",            # host IS a public suffix → itself
        "shop.isle.ck": "shop.isle.ck",  # registrable under wildcard ps
        "a.shop.isle.ck": "shop.isle.ck",
        # !www.ck: exception makes ck the ps → www.ck registrable
        "www.ck": "www.ck",
        "pages.www.ck": "www.ck",
        # *.kawasaki.jp + !city.kawasaki.jp
        "x.kawasaki.jp": "x.kawasaki.jp",    # IS a public suffix → itself
        "b.x.kawasaki.jp": "b.x.kawasaki.jp",  # ps + 1 label
        "c.b.x.kawasaki.jp": "b.x.kawasaki.jp",
        "city.kawasaki.jp": "city.kawasaki.jp",
        "a.city.kawasaki.jp": "city.kawasaki.jp",
        # private-section hosting: each user site is its own domain
        "user1.github.io": "user1.github.io",
        "deep.user1.github.io": "user1.github.io",
        "github.io": "github.io",
        # 3-label exact rule
        "bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
        "x.bucket.s3.amazonaws.com": "bucket.s3.amazonaws.com",
        # default `*` rule
        "example.org": "example.org",
        "www.example.org": "example.org",
        "org": "org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r.host: r.e for r in
           df.select("host", F.expr(U._etld1_expr("host")).alias("e"))
           .collect()}
    con = duckdb.connect()
    for h, want in cases.items():
        assert got[h] == want, (h, got[h], want)
        (e,) = con.execute(f"SELECT {U._etld1_sql(repr(h))}").fetchone()
        assert e == want, (h, e, want)
    con.close()
