"""Engine-agnostic deterministic 60-bit hashes (Spark Column + DuckDB SQL).

Every similarity/dedup operator in this engine (MinHash, SimHash, LSH bands,
fingerprints) needs a hash that evaluates **bit-identically** in Spark SQL and
in the driver's DuckDB oracle. Both engines agree on ``md5`` of UTF-8 text, so
the shared primitive is::

    hash60(s) = int(md5(s)[0:15 hex chars], 16)   # in [0, 2^60)

Spark side: ``conv(substring(md5(s),1,15),16,10)`` (whole-stage codegen'd);
DuckDB side: ``('0x' || substring(md5(s),1,15))::BIGINT``. Parity is asserted
in tests/test_hashing.py.

Seeded family: ``hash60_seeded(seed, s) = hash60(concat(seed, ':', s))`` —
gives the k independent-ish hash functions MinHash needs without any
engine-specific PRNG.

Scale note: all of this is pure JVM-side string/bigint arithmetic — no Python,
no shuffle; at 100 TB the hash evaluation rides inside the same codegen stage
as the scan/projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_MAX = 1 << HASH_BITS


# ---------------------------------------------------------------- Spark path
def hash60_col(s: Column) -> Column:
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def hash60_seeded_col(seed: int, s: Column) -> Column:
    return hash60_col(F.concat(F.lit(f"{seed}:"), s))


# ------------------------------------------------------------------ SQL path
def hash60_sql(s_sql: str) -> str:
    return f"(('0x' || substring(md5({s_sql}), 1, 15))::BIGINT)"


def hash60_seeded_sql(seed: int, s_sql: str) -> str:
    return hash60_sql(f"concat('{seed}:', {s_sql})")
