"""WARC segment framing: pack/parse roundtrip, framing robustness (payloads
containing separator bytes), parity with the arithmetic oracle."""
from __future__ import annotations

import duckdb
import pytest

from geoclimate_spark.sources import warc as W

DOCS = (
    [(i, f"document body {i} " * (1 + i % 3), "en") for i in range(20)]
    # payload that CONTAINS the record separator and a fake header — a
    # sniffing parser would split here; Content-Length framing must not
    + [(20, "evil\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz", "en"),
       (21, "", "en")]
)


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    segs = W.synth_warc_segments(df, recs_per_seg=8)
    return df, segs, W.parse_warc_segments(segs).collect()


def test_roundtrip_counts(parsed):
    _, segs, rows = parsed
    assert len(rows) == len(DOCS)
    per_seg = {r.seg: 0 for r in rows}
    for r in rows:
        per_seg[r.seg] += 1
    assert per_seg == {0: 8, 1: 8, 2: 6}
    seg_rows = {r.seg: r.n_records for r in segs.collect()}
    assert seg_rows == per_seg


def test_framing_not_sniffing(parsed):
    _, _, rows = parsed
    import hashlib
    by = {(r.seg, r.rec_idx): r for r in rows}
    evil = by[(20 // 8, 20 % 8)]
    want = f"<html><main>{DOCS[20][1]}</main></html>".encode()
    assert evil.content_length == len(want)
    assert evil.payload_md5 == hashlib.md5(want).hexdigest()
    # the record AFTER the adversarial payload still parses correctly
    nxt = by[(21 // 8, 21 % 8)]
    assert nxt.url.endswith("/p/21")


def test_parity(spark, parsed):
    df, _, rows = parsed
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar, lang varchar)")
    con.executemany("insert into docs values (?, ?, ?)", DOCS)
    import pandas as pd
    got = pd.DataFrame([r.asDict() for r in rows])
    want = con.execute(W.warc_roundtrip_sql(8, "docs")).fetchdf()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True).astype(
        g.dtypes.to_dict())
    assert g.equals(w)
