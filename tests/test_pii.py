"""PII scrubbing: engine/oracle agreement on adversarial handcrafted rows
(the fixture path is covered by test_entry's pii_scrub parametrization)."""

from __future__ import annotations

import numpy as np

from geoclimate_spark.operators import pii

ROWS = [
    (0, "plain text, nothing to scrub"),
    (1, "two adjacent a.b+c@d-e.co x_9@sub.domain.io emails"),
    (2, "phone at end of text +44 123-4567"),
    (3, "+1 555-0000 phone at start; ip 192.168.0.1 inside"),
    (4, "no-boundary ip x10.1.2.3y and dotted trail 10.2.3.4."),
    (5, "email then phone then ip: u@v.com +1 555-1234 8.8.8.8"),
    (6, "not-an-email @@nope.com and short +1 55-123 not-a-phone"),
    (7, "unicode around émail a@b.de fin"),
]


def test_scrub_handcrafted_rows_match_duckdb(spark, duck):
    sdf = (pii.scrub_pii(
        spark.createDataFrame(ROWS, "doc_id long, raw string"))
        .toPandas().sort_values("doc_id").reset_index(drop=True))
    vals = ", ".join(f"({i}, '{t}')" for i, t in ROWS)
    odf = (duck.execute(pii.scrub_select_sql(
        f"(SELECT * FROM (VALUES {vals}) AS v(doc_id, raw))"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True))
    for c in ("n_emails", "n_phones", "n_ips", "clean_len"):
        assert np.array_equal(sdf[c].to_numpy("int64"),
                              odf[c].to_numpy("int64")), c
    assert (sdf["clean_md5"].values == odf["clean_md5"].values).all()
    # spot expectations (guards against BOTH engines agreeing on nonsense)
    by = sdf.set_index("doc_id")
    assert by.loc[0, "n_emails"] == 0 and by.loc[0, "n_phones"] == 0
    assert by.loc[1, "n_emails"] == 2
    assert by.loc[2, "n_phones"] == 1
    assert by.loc[3, "n_phones"] == 1 and by.loc[3, "n_ips"] == 1
    assert by.loc[4, "n_ips"] == 1  # x10.1.2.3y has no word boundary
    assert by.loc[5, "n_emails"] == 1 and by.loc[5, "n_phones"] == 1
    assert by.loc[5, "n_ips"] == 1
    assert by.loc[6, "n_phones"] == 0
    assert by.loc[7, "n_emails"] == 1
