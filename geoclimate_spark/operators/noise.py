"""Ground acoustic absorption — lookup enrichment over the ground layer.

Reference: `groundAcousticAbsorption` (`/root/reference/geoindicators/src/
main/groovy/org/orbisgis/geoclimate/geoindicators/NoiseIndicators.groovy:
61-107`): run `groundLayer` (the per-atom priority winner), drop the
building/road layers, then map each remaining surface to an absorption
coefficient ``g`` from a JSON lookup with a default for unknown surfaces.

Graft: the ground layer is :func:`overlay.ground_layer` over the rect
land-cover fixture; the building/road analogue here is the ``builtup``
layer; coefficients are the graft's own deterministic table (the operator
SHAPE — composite groundLayer → filter → broadcast coefficient lookup — is
what mirrors the reference, not its resource values).

Scale: the coefficient map is a literal broadcast dim; everything else is
the ground-layer rollup's existing shuffle. Output adds a per-zone
area-weighted mean g (the consumer-side aggregate a noise model reads),
computed over exact integer areas with one final double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import overlay

# absorption coefficient per ground type (1.0 = fully absorbing ground,
# 0.0 = reflective); 'none' (uncovered) takes the default
G_COEFFS = {"veg": 1.0, "water": 0.3}
G_DEFAULT = 0.7
EXCLUDED_LAYERS = ("builtup",)  # the building/road analogue


def ground_acoustic_absorption(zones: DataFrame, rects: DataFrame,
                               layer_names: list[str],
                               priority: list[str]) -> DataFrame:
    """(zone_id, layer, g, area_e6sq) per retained ground surface, plus the
    implicit per-zone mean via :func:`zone_mean_absorption`."""
    ground = overlay.ground_layer(zones, rects, layer_names, priority)
    g = F.lit(G_DEFAULT)
    for name, coeff in G_COEFFS.items():
        g = F.when(F.col("layer") == name, F.lit(coeff)).otherwise(g)
    return (ground.where(~F.col("layer").isin(*EXCLUDED_LAYERS))
            .select("zone_id", "layer", g.alias("g"), "area_e6sq"))


def zone_mean_absorption(absorption: DataFrame,
                         zones: DataFrame) -> DataFrame:
    """Per-zone area-weighted mean g over the retained surfaces (exact
    integer milli-g areas summed, one final division); zones whose ground
    is entirely excluded yield NULL mean."""
    rows = absorption.select(
        "zone_id", "area_e6sq",
        (F.round(F.col("g") * 1000).cast("long")
         * F.col("area_e6sq")).alias("_ga"))
    agg = rows.groupBy("zone_id").agg(
        F.sum("_ga").alias("_ga"), F.sum("area_e6sq").alias("_a"))
    out = zones.select("zone_id").join(agg, "zone_id", "left")
    return out.select(
        "zone_id",
        (F.col("_ga").cast("double") / 1000.0
         / F.col("_a").cast("double")).alias("mean_g"),
        F.coalesce(F.col("_a"), F.lit(0)).cast("long")
        .alias("ground_area_e6sq"))


def ground_acoustic_absorption_sql(zones_sql: str, rects_sql: str,
                                   priority: list[str]) -> str:
    """DuckDB mirror: ground_layer_sql + the same CASE lookup."""
    ground = overlay.ground_layer_sql(zones_sql, rects_sql, priority)
    whens = " ".join(f"WHEN '{n}' THEN {c}" for n, c in G_COEFFS.items())
    excl = ", ".join(f"'{n}'" for n in EXCLUDED_LAYERS)
    return f"""WITH ground AS ({ground})
SELECT zone_id, layer,
       CASE layer {whens} ELSE {G_DEFAULT} END AS g,
       area_e6sq
FROM ground WHERE layer NOT IN ({excl})"""


def zone_mean_absorption_sql(absorption_sql: str, zones_sql: str) -> str:
    return f"""WITH ab AS ({absorption_sql}),
zones AS ({zones_sql}),
agg AS (SELECT zone_id,
       SUM(CAST(ROUND(g * 1000) AS BIGINT) * area_e6sq) AS ga,
       SUM(area_e6sq) AS a
  FROM ab GROUP BY zone_id)
SELECT z.zone_id,
       CAST(ga AS DOUBLE) / 1000.0 / CAST(a AS DOUBLE) AS mean_g,
       CAST(COALESCE(a, 0) AS BIGINT) AS ground_area_e6sq
FROM zones z LEFT JOIN agg USING (zone_id)"""
