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
# "www.example.co.uk" are the same owner. Implemented as the full
# publicsuffix.org ALGORITHM (exception rules beat all; otherwise the
# longest matching rule wins; `*` matches exactly one label; default rule
# is the bare TLD) over a vendored snapshot of PSL rules in the standard
# rule syntax. PSL_RULES below is a curated SUBSET of the real list
# (ICANN second-level families, the classic wildcard/exception entries,
# and the ubiquitous private-section hosting domains); a deployment swaps
# in the full publicsuffix.org data file at this tuple — the expression
# builder consumes the standard syntax (`rule`, `*.rule`, `!rule`)
# unchanged. The rules compile to literal IN-lists inside ONE codegen
# CASE expression (a broadcast constant — no join, no Python), identical
# on Spark and DuckDB.
PSL_RULES: tuple[str, ...] = (
    # uk / ie
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # au / nz
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "cri.nz", "iwi.nz",
    # jp + city wildcards with their exceptions
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # za / ke / ng / eg / sa / pk
    "co.za", "net.za", "org.za", "web.za", "gov.za", "ac.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "name.ng", "sch.ng",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg", "name.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa", "pub.sa",
    "sch.sa",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "fam.pk", "biz.pk",
    "web.pk",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br", "eco.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve", "web.ve",
    "co.ve", "info.ve",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ec", "net.ec", "org.ec", "gob.ec", "edu.ec", "mil.ec", "fin.ec",
    "med.ec", "pro.ec", "info.ec",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy", "mil.uy",
    "com.py", "net.py", "org.py", "gov.py", "edu.py", "mil.py", "coop.py",
    "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo", "mil.bo", "int.bo",
    "web.bo", "tv.bo",
    "co.cr", "fi.cr", "go.cr", "or.cr", "sa.cr", "ac.cr", "ed.cr",
    "com.gt", "net.gt", "org.gt", "gob.gt", "edu.gt", "mil.gt", "ind.gt",
    "com.do", "net.do", "org.do", "gob.do", "edu.do", "mil.do", "sld.do",
    "web.do", "art.do",
    # asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "mil.in", "res.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw", "game.tw",
    "club.tw", "ebiz.tw",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id", "sch.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph", "mil.ph",
    "i.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th", "mi.th",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "idf.il",
    "k12.il",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr", "bbs.tr",
    "av.tr", "dr.tr", "pol.tr", "bel.tr", "web.tr", "gen.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    # europe
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "biz.pl",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "nome.pt",
    "com.ro", "org.ro", "tm.ro", "store.ro", "firm.ro", "www.ro",
    "nom.es", "com.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "gouv.fr", "asso.fr", "nom.fr", "com.fr", "tm.fr", "prd.fr",
    # us states (ICANN section)
    "ca.us", "ny.us", "tx.us", "wa.us", "fl.us", "ma.us", "il.us",
    "oh.us", "pa.us", "mi.us",
    # classic TLD-wide wildcards (+ the famous exception)
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg",
    # private-section hosting domains every web corpus hits
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "appspot.com", "netlify.app", "vercel.app", "pages.dev", "web.app",
    "firebaseapp.com", "azurewebsites.net", "s3.amazonaws.com",
)


def _psl_partition() -> tuple[dict[int, list[str]], dict[int, list[str]],
                              dict[int, list[str]]]:
    """Split PSL_RULES by kind and label count:
    (exact[rule_len], wildcard_bases[base_len], exceptions[host_len])."""
    exact: dict[int, list[str]] = {}
    wild: dict[int, list[str]] = {}
    exc: dict[int, list[str]] = {}
    for r in PSL_RULES:
        if r.startswith("!"):
            h = r[1:]
            exc.setdefault(h.count(".") + 1, []).append(h)
        elif r.startswith("*."):
            b = r[2:]
            wild.setdefault(b.count(".") + 1, []).append(b)
        else:
            exact.setdefault(r.count(".") + 1, []).append(r)
    return exact, wild, exc


def _build_etld1(host: str, engine: str) -> str:
    """One CASE expression implementing the PSL algorithm over ``host``
    for ``engine`` in {"spark", "duck"}. Branch order = the spec's
    precedence: exceptions (longest first), then non-exception rules by
    label count descending (exact rule of length L ties with wildcard of
    base length L−1 — both mean ps_len = L), then the default `*` rule.
    Every suffix reference is guarded by a label-count check, so no
    out-of-bounds element access ever evaluates."""
    if engine == "spark":
        l = f"split({host}, '\\\\.')"
        n = f"size({l})"
        elem = lambda k: f"element_at({l}, -{k})"
        join = lambda parts: "concat(" + ", '.', ".join(parts) + ")"
    else:
        l = f"str_split({host}, '.')"
        n = f"len({l})"
        elem = lambda k: f"{l}[-{k}]"
        join = lambda parts: "(" + " || '.' || ".join(parts) + ")"

    def suffix(k: int) -> str:
        if k == 1:
            return elem(1)
        return join([elem(i) for i in range(k, 0, -1)])

    def inset(vals: list[str]) -> str:
        return ", ".join(f"'{v}'" for v in sorted(vals))

    exact, wild, exc = _psl_partition()
    max_rule = max([0, *exact.keys(),
                    *(b + 1 for b in wild.keys())])
    branches = []
    # exceptions: ps = rule minus leftmost label → etld1 = the rule itself
    # (as a suffix of the host), defined whenever n >= rule_len
    for c in sorted(exc.keys(), reverse=True):
        branches.append(f"WHEN {n} >= {c} AND {suffix(c)} IN"
                        f" ({inset(exc[c])}) THEN {suffix(c)}")
    # non-exception rules, longest ps first; ps_len = L → etld1 = L+1 labels
    for L in range(max_rule, 1, -1):
        conds = []
        if L in exact:
            conds.append(f"({n} >= {L} AND {suffix(L)} IN"
                         f" ({inset(exact[L])}))")
        if (L - 1) in wild:
            conds.append(f"({n} >= {L} AND {suffix(L - 1)} IN"
                         f" ({inset(wild[L - 1])}))")
        if conds:
            cond = " OR ".join(conds)
            branches.append(
                f"WHEN {cond} THEN CASE WHEN {n} >= {L + 1}"
                f" THEN {suffix(L + 1)} ELSE {host} END")
    # default rule `*`: ps_len = 1
    branches.append(f"WHEN {n} >= 2 THEN {suffix(2)}")
    return "CASE " + " ".join(branches) + f" ELSE {host} END"


def _etld1_expr(host: str) -> str:
    """Spark SQL registrable-domain expression over column ``host``."""
    return _build_etld1(host, "spark")


def _etld1_sql(host: str) -> str:
    """DuckDB dual of :func:`_etld1_expr`."""
    return _build_etld1(host, "duck")


# deterministic host fixture: eight shapes (plain / www / deep subdomain /
# second-level suffix / deep + second-level / TLD wildcard / wildcard
# exception / private-section hosting) over 17 owner groups — the
# synthetic-column idiom of pii.py/qualityrules.py, identical SQL in both
# engines. The wildcard/exception shapes drive the PSL algorithm's
# non-trivial branches through the driver oracle gate.
_HOST_SQL = (
    "CASE doc_id % 8"
    " WHEN 0 THEN concat('site', CAST(doc_id % 17 AS STRING), '.com')"
    " WHEN 1 THEN concat('www.site', CAST(doc_id % 17 AS STRING), '.com')"
    " WHEN 2 THEN concat('blog.site', CAST(doc_id % 17 AS STRING), '.co.uk')"
    " WHEN 3 THEN concat('site', CAST(doc_id % 17 AS STRING), '.co.uk')"
    " WHEN 4 THEN concat('a.b.site', CAST(doc_id % 17 AS STRING), '.com.au')"
    " WHEN 5 THEN concat('shop.isle', CAST(doc_id % 17 AS STRING), '.ck')"
    " WHEN 6 THEN 'pages.www.ck'"
    " ELSE concat('user', CAST(doc_id % 17 AS STRING), '.github.io') END")


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
