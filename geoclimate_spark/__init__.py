"""geoclimate_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the operator semantics of GeoClimate (orbisgis/geoclimate, studied
read-only at /root/reference) as H3-style cell-indexed DataFrame operators over a
Common-Crawl-style ``pages(url, warc_ts, html, text, lang)`` table.

Design stance (SURVEY.md §7):
- geometry travels as coordinate arrays / WKT-ish structs + integer cell keys;
- ALL Python in the data plane is vectorized Arrow/pandas UDFs (never per-row);
- relational work stays in Spark built-ins so Catalyst/Tungsten optimize it;
- the cell index is computed with pure column arithmetic (JVM-side, codegen'd).

The environment has no h3/shapely packages, so the engine ships its own
deterministic hierarchical cell index (``grid.py``) and numpy geometry kernels
(``geometry.py``). Both are public-knowledge algorithms (quadtree tiling,
ray-casting, shoelace, Sutherland–Hodgman).
"""

__version__ = "0.1.0"
