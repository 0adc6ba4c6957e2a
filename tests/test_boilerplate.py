"""Per-host line-frequency boilerplate removal: threshold semantics on a
handcrafted host layout (the fixture path is covered by test_entry's
boilerplate_removal parametrization)."""

from __future__ import annotations

from geoclimate_spark.operators import boilerplate as bp

# host A: 10 docs. "HDR" on all 10 (stripped), "TWO" on 2 (20% — kept),
# "TRI" on 3 (30% boundary — stripped), unique prose per doc (kept).
# host B: 1 doc — the nd >= 2 floor must keep everything, including
# lines that also occur on host A (per-host keying).
ROWS = []
for i in range(10):
    lines = ["HDR nav bar"]
    if i < 2:
        lines.append("TWO shared prose")
    if i < 3:
        lines.append("TRI promo banner")
    lines.append(f"unique body {i}")
    ROWS.append((i, "a.example", "\n".join(lines)))
ROWS.append((100, "b.example", "HDR nav bar\nsolo body"))


def _run(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, host string, raw string")
    out = bp.remove_boilerplate(df).toPandas().set_index("doc_id")
    return out


def test_threshold_and_single_doc_host_semantics(spark):
    out = _run(spark)
    # host A doc 0: HDR stripped, TWO kept (20%), TRI stripped (30%), body kept
    assert out.loc[0, "n_lines"] == 4 and out.loc[0, "n_removed"] == 2
    assert out.loc[0, "clean_len"] == len("TWO shared prose\nunique body 0")
    # doc 5: HDR stripped only
    assert out.loc[5, "n_lines"] == 2 and out.loc[5, "n_removed"] == 1
    # single-doc host keeps its 100%-frequency lines (nd >= 2 floor)
    assert out.loc[100, "n_removed"] == 0
    assert out.loc[100, "clean_len"] == len("HDR nav bar\nsolo body")


def test_surviving_line_order_preserved(spark, duck):
    out = _run(spark)
    # doc 1 keeps TWO then body, in original order -> md5 of exact string
    import hashlib
    want = hashlib.md5(b"TWO shared prose\nunique body 1").hexdigest()
    assert out.loc[1, "clean_md5"] == want
