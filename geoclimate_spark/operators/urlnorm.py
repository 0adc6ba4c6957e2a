"""URL canonicalization + latest-crawl dedup over a crawl log.

Web-corpus curation's very first pass: the same logical page arrives under
many surface URLs (http/https, with/without ``www.``, trailing slash, utm_*
tracking query, #fragment, host-case noise) across recrawls; the pipeline
must collapse them to one canonical URL and keep only the LATEST fetch.

Reference analogue: the deterministic attribute-formatting pass
(`/root/reference/osm/.../InputDataFormatting.groovy:48-193` — raw OSM tags
→ one typed row per source id via regex + decision rules): a pure,
per-row normalization whose output feeds every downstream operator, followed
by a deterministic keep-one rule (there: lowest id; here: newest fetch).

Canonical form (applied in this exact order, each a single anchored regex
that evaluates identically under Java regex and RE2/DuckDB):
lower → drop #fragment → drop trailing utm_* query → drop scheme →
drop leading www. → drop trailing slash.

Scale design (10^12 crawl records):
* canonicalization is a codegen'd regexp_replace chain inside the scan
  projection — no Python, no shuffle;
* the keep-latest rule is ONE shuffle keyed by the canonical URL +
  row_number window ordered by (fetch_epoch DESC, crawl_id DESC) — fully
  deterministic, partition-independent (the pair is unique per record);
* at rest, partitioning the crawl log by hash(canonical) makes recrawl
  upserts partition-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Lehmer LCG, same constants as sources/pages.py — all products < 2^47.
_M = 2_147_483_647
_A = 48_271
_EPOCH = 1_704_067_200
_YEAR = 31_536_000

CANON_N = 150  # distinct logical pages in the fixture (~3 recrawls each)

# (pattern, replacement) chain defining the canonical form. Kept to simple
# anchored patterns with no lookaround so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte.
_CANON_STEPS: tuple[tuple[str, str], ...] = (
    ("#.*$", ""),            # fragment
    (r"\?utm_[^#]*$", ""),   # tracking query (after fragment strip)
    ("^https?://", ""),      # scheme
    (r"^www\.", ""),         # www
    ("/$", ""),              # trailing slash
)


def canonical_url_col(raw: Column) -> Column:
    out = F.lower(raw)
    for pat, rep in _CANON_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def canonical_url_sql(raw_sql: str) -> str:
    out = f"lower({raw_sql})"
    # DuckDB string literals are standard-SQL: backslashes pass through
    # verbatim, so the Python pattern strings embed unmodified
    for pat, rep in _CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}')"
    return out


def url_crawl_fixture_sql(id_col: str = "doc_id",
                          canon_n: int = CANON_N) -> dict[str, str]:
    """Engine-agnostic SQL fragments synthesizing a messy crawl log from an
    integer id: {raw_url, fetch_epoch}. Five independent noise bits (scheme,
    www, trailing slash, utm query, host case) come from one LCG step; the
    logical page is ``{id_col} % canon_n``."""
    r1 = f"((({id_col}) * {_A} + 11) % {_M})"
    r2 = f"((({r1}) * {_A} + 11) % {_M})"
    # bit k of r1 as pure %/>= arithmetic: `/` is float division in DuckDB
    # but not in Spark SQL, so plain integer ops are the only portable form
    bit = lambda k: f"({r1}) % {1 << (k + 1)} >= {1 << k}"
    scheme = f"CASE WHEN {bit(0)} THEN 'https://' ELSE 'http://' END"
    www = f"CASE WHEN {bit(1)} THEN 'www.' ELSE '' END"
    slash = f"CASE WHEN {bit(2)} THEN '/' ELSE '' END"
    utm = f"CASE WHEN {bit(3)} THEN '?utm_source=feed' ELSE '' END"
    host = (f"CASE WHEN {bit(4)} THEN 'Example.COM' "
            f"ELSE 'example.com' END")
    frag = f"CASE WHEN {bit(5)} THEN '#sec1' ELSE '' END"
    return {
        "raw_url": (f"CONCAT({scheme}, {www}, {host}, '/page/', "
                    f"CAST(({id_col}) % {canon_n} AS STRING), "
                    f"{slash}, {utm}, {frag})"),
        "fetch_epoch": f"CAST({_EPOCH} + ({r2} % {_YEAR}) AS BIGINT)",
    }


def latest_crawl_per_url(crawls: DataFrame) -> DataFrame:
    """(canon_url, n_crawls, last_crawl_id, last_fetch_epoch): one row per
    canonical URL keeping the newest fetch (ties on epoch break to the
    highest crawl_id). Input columns: crawl_id, raw_url, fetch_epoch."""
    c = crawls.withColumn("canon_url", canonical_url_col(F.col("raw_url")))
    w = Window.partitionBy("canon_url").orderBy(
        F.col("fetch_epoch").desc(), F.col("crawl_id").desc())
    return (c.withColumn("_rn", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(
                Window.partitionBy("canon_url")))
            .where(F.col("_rn") == 1)
            .select("canon_url",
                    F.col("_n").cast("long").alias("n_crawls"),
                    F.col("crawl_id").cast("long").alias("last_crawl_id"),
                    F.col("fetch_epoch").cast("long")
                    .alias("last_fetch_epoch")))


def latest_crawl_per_url_sql(crawls_sql: str) -> str:
    """DuckDB dual; ``crawls_sql`` selects (crawl_id, raw_url, fetch_epoch)."""
    canon = canonical_url_sql("raw_url")
    return f"""
WITH crawls AS ({crawls_sql}),
c AS (SELECT crawl_id, fetch_epoch, {canon} AS canon_url FROM crawls),
r AS (SELECT *,
        ROW_NUMBER() OVER (PARTITION BY canon_url
            ORDER BY fetch_epoch DESC, crawl_id DESC) AS rn,
        COUNT(*) OVER (PARTITION BY canon_url) AS n
      FROM c)
SELECT canon_url, CAST(n AS BIGINT) AS n_crawls,
       CAST(crawl_id AS BIGINT) AS last_crawl_id,
       CAST(fetch_epoch AS BIGINT) AS last_fetch_epoch
FROM r WHERE rn = 1"""


# --------------------------------------------- registrable domain (eTLD+1)
# Per-domain caps and reputation must group by the REGISTRABLE domain
# (eTLD+1), not the raw host — "a.blog.example.co.uk" and
# "www.example.co.uk" are the same owner. The full public-suffix list is a
# data file a deployment broadcasts; the operator hard-codes the common
# second-level suffixes to keep the fixture self-contained (swap
# SL_SUFFIXES for the PSL table — the expression shape is unchanged).
# Rule: if the last TWO labels form a listed second-level suffix, the
# registrable domain is the last THREE labels; else the last two.
SL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp",
               "com.br", "co.in", "com.cn", "co.kr")


def _etld1_expr(host: str) -> str:
    """Spark SQL registrable-domain expression over column ``host``."""
    inset = ", ".join(f"'{s}'" for s in SL_SUFFIXES)
    l = f"split({host}, '\\\\.')"
    last2 = (f"concat(element_at({l}, -2), '.', element_at({l}, -1))")
    last3 = (f"concat(element_at({l}, -3), '.', element_at({l}, -2),"
             f" '.', element_at({l}, -1))")
    return (f"CASE WHEN size({l}) >= 3 AND {last2} IN ({inset})"
            f" THEN {last3}"
            f" WHEN size({l}) >= 2 THEN {last2} ELSE {host} END")


def _etld1_sql(host: str) -> str:
    """DuckDB dual of :func:`_etld1_expr`."""
    inset = ", ".join(f"'{s}'" for s in SL_SUFFIXES)
    l = f"str_split({host}, '.')"
    last2 = f"({l}[-2] || '.' || {l}[-1])"
    last3 = f"({l}[-3] || '.' || {l}[-2] || '.' || {l}[-1])"
    return (f"CASE WHEN len({l}) >= 3 AND {last2} IN ({inset})"
            f" THEN {last3}"
            f" WHEN len({l}) >= 2 THEN {last2} ELSE {host} END")


# deterministic host fixture: five shapes (plain / www / deep subdomain /
# second-level suffix / deep + second-level) over 17 owner groups — the
# synthetic-column idiom of pii.py/qualityrules.py, identical SQL in both
# engines.
_HOST_SQL = (
    "CASE doc_id % 5"
    " WHEN 0 THEN concat('site', CAST(doc_id % 17 AS STRING), '.com')"
    " WHEN 1 THEN concat('www.site', CAST(doc_id % 17 AS STRING), '.com')"
    " WHEN 2 THEN concat('blog.site', CAST(doc_id % 17 AS STRING), '.co.uk')"
    " WHEN 3 THEN concat('site', CAST(doc_id % 17 AS STRING), '.co.uk')"
    " ELSE concat('a.b.site', CAST(doc_id % 17 AS STRING), '.com.au') END")


def etld1_rollup(docs: DataFrame) -> DataFrame:
    """Per registrable domain: (etld1, n_docs, n_hosts) over the
    deterministic host fixture. ONE map-side-combinable hash agg (the
    etld1 key is a scan-projection expression — no join, no Python)."""
    return (docs
            .selectExpr("doc_id", f"{_HOST_SQL} AS host")
            .selectExpr(f"{_etld1_expr('host')} AS etld1", "host")
            .groupBy("etld1")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.countDistinct("host").cast("long").alias("n_hosts")))


def etld1_rollup_sql(rel: str = "documents") -> str:
    """DuckDB dual of :func:`etld1_rollup`."""
    return f"""WITH hosts AS (
  SELECT doc_id, {_HOST_SQL} AS host FROM {rel}),
keyed AS (SELECT {_etld1_sql("host")} AS etld1, host FROM hosts)
SELECT etld1, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM keyed GROUP BY 1"""


# ----------------------------------------------------------------- SURT form
def surt_col(raw: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform, the web-archive/
    OpenWayback convention): canonicalize, then rewrite
    ``host/path`` as ``tld,…,sub)/path`` — host labels REVERSED and
    comma-joined so that lexicographic order clusters every subdomain of a
    domain contiguously. That is a physical-layout property: sorting/
    bucketing a 10^12-row URL table by SURT key makes "everything under
    example.com" a contiguous key range → file-level min/max pruning
    answers host-scoped scans (the Z-order move, grid.py:202, applied to
    the URL hierarchy)."""
    canon = canonical_url_col(raw)
    host = F.regexp_replace(canon, "/.*$", "")
    path = F.regexp_replace(canon, "^[^/]*", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), path)


def surt_sql(raw_sql: str) -> str:
    canon = canonical_url_sql(raw_sql)
    host = f"regexp_replace({canon}, '/.*$', '')"
    path = f"regexp_replace({canon}, '^[^/]*', '')"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    return f"({rev} || ')' || {path})"


def surt_keys(crawls: DataFrame) -> DataFrame:
    """(crawl_id, canon_url, surt, surt_host): SURT storage keys for a
    crawl log plus the host-only prefix (the bucketing/range key)."""
    c = crawls.select(
        F.col("crawl_id").cast("long").alias("crawl_id"),
        canonical_url_col(F.col("raw_url")).alias("canon_url"),
        surt_col(F.col("raw_url")).alias("surt"))
    return c.withColumn("surt_host",
                        F.regexp_replace(F.col("surt"), r"\).*$", ""))


def surt_keys_sql(crawls_sql: str) -> str:
    surt = surt_sql("raw_url")
    return f"""
SELECT CAST(crawl_id AS BIGINT) AS crawl_id,
       {canonical_url_sql("raw_url")} AS canon_url,
       {surt} AS surt,
       regexp_replace({surt}, '\\).*$', '') AS surt_host
FROM ({crawls_sql})"""
