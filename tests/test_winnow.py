"""Winnowing fingerprints + BPE-ish pretokenizer: engine/oracle parity on
adversarial inputs and the paper's detection guarantee."""
from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from geoclimate_spark.functions import text as text_fn
from geoclimate_spark.operators import winnow

# adversarial texts: repeated grams (hash ties inside one window), text
# shorter than k, text shorter than one gram+window, empty, single char,
# non-ASCII BMP codepoints, and a long doc with a planted shared substring
SHARED = "the quick brown fox jumps over the lazy dog near the river bank"
TEXTS = [
    (1, "abababababababababababab"),          # periodic -> tie-heavy
    (2, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"),      # all grams identical
    (3, "short"),                             # len < k
    (4, ""),                                  # empty
    (5, "x"),                                 # single char
    (6, "héllo wörld çafé über naïve"),       # BMP non-ASCII
    (7, f"left padding text {SHARED} and some trailing words"),
    (8, f"completely different prefix {SHARED} other suffix here"),
    (9, "No Shared Substring In THIS one at all, punctuation; too!"),
    (10, None),                               # NULL text: dropped
]


def _oracle_con(texts):
    con = duckdb.connect()
    con.execute("create table docs (doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", texts)
    return con


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(TEXTS, "doc_id long, text string")


def test_fingerprints_match_oracle(spark, docs_df):
    got = {r["doc_id"]: r.asDict()
           for r in winnow.winnow_fingerprints(docs_df).collect()}
    con = _oracle_con(TEXTS)
    want = con.execute(
        winnow.winnow_fingerprints_sql(doc_rel="docs")).fetchall()
    assert len(want) == len(TEXTS) - 1 == len(got)  # NULL doc dropped
    for doc_id, n_grams, n_fp, n_distinct, checksum in want:
        g = got[doc_id]
        assert (g["n_grams"], g["n_fp"], g["n_distinct_fp"],
                g["fp_checksum"]) == (n_grams, n_fp, n_distinct, checksum), doc_id


def test_dup_pairs_match_oracle_and_guarantee(spark, docs_df):
    got = sorted((r["id_a"], r["id_b"], r["n_shared"], r["containment"])
                 for r in winnow.winnow_dup_pairs(
                     docs_df, max_df=len(TEXTS), min_shared=1).collect())
    con = _oracle_con(TEXTS)
    want = sorted(map(tuple, con.execute(winnow.winnow_dup_pairs_sql(
        doc_rel="docs", max_df=len(TEXTS), min_shared=1)).fetchall()))
    assert got == want
    # SWA guarantee: docs 7 and 8 share a substring of length
    # len(SHARED) >= k + w - 1, so at least one selected hash is shared
    assert len(SHARED) >= winnow.K_GRAM + winnow.WINNOW_W - 1
    assert any(a == 7 and b == 8 for a, b, *_ in got)


def test_selection_density(spark, docs_df):
    # winnowing selects ~2/(w+1) of grams on random-ish text; sanity-bound
    # the long mixed docs (not the degenerate repeats)
    rows = {r["doc_id"]: r for r in
            winnow.winnow_fingerprints(docs_df).collect()}
    for doc_id in (7, 8, 9):
        r = rows[doc_id]
        density = r["n_fp"] / r["n_grams"]
        assert 0.05 < density < 0.8, (doc_id, density)


def test_bpe_pretokens_match_duckdb(spark):
    texts = ["don't stop, it's 2024: we've 99 problems (but regex ain't one)!",
             "abc123def  spaced   out\ttabs\nnewlines", "", "42", "  ", "'"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    norm = text_fn.normalize_col(F.col("text"))
    got = (df.select(text_fn.bpe_tokens_col(norm).alias("toks"))
           .collect())
    con = duckdb.connect()
    for t, row in zip(texts, got):
        want = con.execute(
            "select " + text_fn.bpe_tokens_sql(text_fn.normalize_sql("?")),
            [t]).fetchone()[0]
        assert list(row["toks"]) == list(want), t
    # token streams re-concatenate to the normalized text (lossless split)
    for t, row in zip(texts, got):
        normed = con.execute(
            "select " + text_fn.normalize_sql("?"), [t]).fetchone()[0]
        assert "".join(row["toks"]) == normed, t


# ---- property: vectorized kernel == character-at-a-time rolling reference
def _rolling_reference(txt: str, k: int, w: int):
    """Textbook streaming winnower: O(1)-update Karp-Rabin over a char
    stream + the paper's window-minimum selection (rightmost min). Pure
    Python ints — an independent implementation of the same definition."""
    B, M = winnow.HASH_BASE, winnow.HASH_MOD
    codes = [ord(c) for c in txt] or [0]
    n = len(txt)
    if n >= k:
        h = 0
        for c in codes[:k]:
            h = (h * B + c) % M
        hashes = [h]
        bk = pow(B, k - 1, M)
        for i in range(1, n - k + 1):           # O(1) update per char
            h = ((h - codes[i - 1] * bk) * B + codes[i + k - 1]) % M
            hashes.append(h)
    else:
        h = 0
        for c in codes:
            h = (h * B + c) % M
        hashes = [h]
    g = len(hashes)
    sel = set()
    for s in range(max(g - w + 1, 1)):
        window = hashes[s:s + w]
        m = min(window)
        p = s + max(i for i, v in enumerate(window) if v == m) + 1  # 1-based
        sel.add(m * winnow._POS + (winnow._POS - 1 - p))
    return g, sorted(sel)


def test_kernel_matches_rolling_reference_fixed():
    for txt in [t for _, t in TEXTS if t is not None] + ["a" * 100, "ab" * 50]:
        g, sel = winnow.winnow_doc(txt)
        rg, rsel = _rolling_reference(txt, winnow.K_GRAM, winnow.WINNOW_W)
        assert (g, list(sel)) == (rg, rsel), txt[:40]


def test_kernel_matches_rolling_reference_property():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="ab x0é", max_size=200),
           st.integers(2, 8), st.integers(1, 6))
    def prop(txt, k, w):
        g, sel = winnow.winnow_doc(txt, k, w)
        rg, rsel = _rolling_reference(txt, k, w)
        assert (g, list(sel)) == (rg, rsel)

    prop()
