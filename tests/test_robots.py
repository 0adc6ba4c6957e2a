"""Robots longest-prefix-match semantics on handcrafted rules/URLs (the
fixture path is covered by test_entry's robots_url_filter parametrization)."""

from __future__ import annotations

from geoclimate_spark.operators import robots as rb

RULES = [
    # host A: deny /private/, allow the /private/pub/ carve-out,
    # plus a root allow
    ("a.example", 0, "/", "allow"),
    ("a.example", 1, "/private/", "deny"),
    ("a.example", 2, "/private/pub/", "allow"),
    # host A tie case: two length-6 prefixes -> lowest rule_id wins
    ("a.example", 3, "/tie/x", "deny"),
    ("a.example", 4, "/tie/", "allow"),
    # host B has rules but none match /other/ paths -> default allow
    ("b.example", 10, "/blocked/", "deny"),
]

CANDS = [
    (0, "a.example", "/private/secret.html"),     # deny (rule 1)
    (1, "a.example", "/private/pub/doc.html"),    # allow (carve-out, rule 2)
    (2, "a.example", "/index.html"),              # allow (root, rule 0)
    (3, "a.example", "/tie/x/page"),              # deny (rule 3 longest)
    (4, "a.example", "/tie/y"),                   # allow (rule 4)
    (5, "b.example", "/other/thing"),             # default allow (-1)
    (6, "c.example", "/anything"),                # host with no rules (-1)
]


def test_longest_prefix_semantics(spark):
    rules = spark.createDataFrame(
        RULES, "host string, rule_id long, prefix string, action string")
    cands = spark.createDataFrame(
        CANDS, "doc_id long, host string, path string")
    out = rb.robots_verdicts(cands, rules).toPandas()
    got = {(r.host, r.rule_id, r.action): r.n_urls
           for r in out.itertuples()}
    assert got == {
        ("a.example", 1, "deny"): 1,
        ("a.example", 2, "allow"): 1,
        ("a.example", 0, "allow"): 1,
        ("a.example", 3, "deny"): 1,
        ("a.example", 4, "allow"): 1,
        ("b.example", -1, "allow"): 1,
        ("c.example", -1, "allow"): 1,
    }


def test_fixture_exercises_all_branches(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = rb.robots_verdicts(rb.synth_candidates(docs),
                             rb.synth_rules(spark)).toPandas()
    assert out.n_urls.sum() == docs.count()
    assert (out.rule_id == -1).any()                       # default branch
    assert ((out.rule_id >= 0) & (out.rule_id % 10 == 2)).any()  # carve-out
    assert (out.action == "deny").any()
