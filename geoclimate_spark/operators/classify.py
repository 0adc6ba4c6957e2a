"""Min-distance classification — the LCZ classifier analogue.

Reference: `TypologyClassification.identifyLczType` (`/root/reference/
geoindicators/.../TypologyClassification.groovy:87-460`) — GeoClimate's
primary LCZ path is NOT the random forest but generated SQL computing, per
zone, the distance in (normalized) indicator space to each LCZ class's
reference point, taking the closest class plus the two smallest distances
and a uniqueness score; `-9999.99` marks unclassifiable rows
(`GenericIndicators.groovy:520,560`).

Here: per-zone feature vector (from the zonal stats library) vs a literal
table of class centroids with per-feature scale weights. Everything is
fixed-order double arithmetic over exactly-derived features, so the DuckDB
oracle matches bit-for-bit. Pure projection — no shuffle, no UDF; at 10^12
rows the classifier rides whatever stage produced the features.

Outputs per row: ``cls`` (nearest class, tie-break = centroid declaration
order), ``dist1``/``dist2`` (two smallest squared distances) and
``uniqueness`` = (d2−d1)/(d2+d1) (the reference's top-2 separation measure).
Rows with any NULL feature get the sentinel class ``'unclassified'`` and
distances −9999.99.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SENTINEL = -9999.99


def _dist2_col(features: list[str], centroid: list[float],
               scales: list[float]) -> Column:
    d = None
    for f, c, s in zip(features, centroid, scales):
        t = (F.col(f) - F.lit(c)) / F.lit(s)
        t = t * t
        d = t if d is None else d + t
    return d


def classify_min_distance(df: DataFrame, key_cols: list[str],
                          features: list[str],
                          centroids: dict[str, list[float]],
                          scales: list[float]) -> DataFrame:
    labels = list(centroids)
    dists = {l: _dist2_col(features, centroids[l], scales) for l in labels}
    d_cols = [dists[l].alias(f"_d_{i}") for i, l in enumerate(labels)]
    t = df.select(*key_cols, *features, *d_cols)
    dd = [F.col(f"_d_{i}") for i in range(len(labels))]
    # argmin with declaration-order tie-break (same chain as the SQL side)
    cls = F.lit(labels[-1])
    for i in range(len(labels) - 2, -1, -1):
        cond = None
        for j in range(i + 1, len(labels)):
            c = dd[i] <= dd[j]
            cond = c if cond is None else (cond & c)
        cls = F.when(cond, F.lit(labels[i])).otherwise(cls)
    d1 = dd[0] if len(dd) == 1 else F.least(*dd)
    # second-smallest = min over pairwise max (order-statistic identity)
    pair_maxes = [F.greatest(dd[i], dd[j]) for i in range(len(dd))
                  for j in range(i + 1, len(dd))]
    d2 = (d1 if not pair_maxes
          else pair_maxes[0] if len(pair_maxes) == 1
          else F.least(*pair_maxes))
    uniq = F.when((d1 + d2) > 0, (d2 - d1) / (d2 + d1)).otherwise(F.lit(0.0))
    anynull = None
    for f in features:
        c = F.col(f).isNull()
        anynull = c if anynull is None else (anynull | c)
    return t.select(
        *key_cols,
        F.when(anynull, F.lit("unclassified")).otherwise(cls).alias("cls"),
        F.when(anynull, F.lit(SENTINEL)).otherwise(d1).alias("dist1"),
        F.when(anynull, F.lit(SENTINEL)).otherwise(d2).alias("dist2"),
        F.when(anynull, F.lit(SENTINEL)).otherwise(uniq).alias("uniqueness"))


def classify_min_distance_sql(rows_sql: str, key_cols: list[str],
                              features: list[str],
                              centroids: dict[str, list[float]],
                              scales: list[float]) -> str:
    labels = list(centroids)

    def dist(l: str) -> str:
        terms = []
        for f, c, s in zip(features, centroids[l], scales):
            t = f"(({f} - CAST('{c!r}' AS DOUBLE)) / CAST('{s!r}' AS DOUBLE))"
            terms.append(f"({t} * {t})")
        return " + ".join(terms)

    d_sel = ",\n       ".join(f"{dist(l)} AS _d_{i}" for i, l in enumerate(labels))
    cases = []
    for i in range(len(labels) - 1):
        conds = " AND ".join(f"_d_{i} <= _d_{j}" for j in range(i + 1, len(labels)))
        cases.append(f"WHEN {conds} THEN '{labels[i]}'")
    cls = "CASE " + " ".join(cases) + f" ELSE '{labels[-1]}' END"
    dd = [f"_d_{i}" for i in range(len(labels))]
    d1 = "LEAST(" + ", ".join(dd) + ")"
    pairs = [f"GREATEST({dd[i]}, {dd[j]})" for i in range(len(dd))
             for j in range(i + 1, len(dd))]
    d2 = "LEAST(" + ", ".join(pairs) + ")" if pairs else d1
    anynull = " OR ".join(f"{f} IS NULL" for f in features)
    keys = ", ".join(key_cols)
    return f"""WITH rows_in AS ({rows_sql}),
d AS (SELECT {keys}, {", ".join(features)},
       {d_sel}
  FROM rows_in)
SELECT {keys},
       CASE WHEN {anynull} THEN 'unclassified' ELSE {cls} END AS cls,
       CASE WHEN {anynull} THEN {SENTINEL} ELSE {d1} END AS dist1,
       CASE WHEN {anynull} THEN {SENTINEL} ELSE {d2} END AS dist2,
       CASE WHEN {anynull} THEN {SENTINEL}
            WHEN {d1} + {d2} > 0 THEN ({d2} - {d1}) / ({d2} + {d1})
            ELSE 0.0 END AS uniqueness
FROM d"""
