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


# -------------------------------------------------------------- mixed family
# k "independent" hash functions from ONE md5: affine mixes of the base
# hash. One md5 per row instead of k — md5 dominates the MinHash cost.
# h30 (30 low bits) * a (30-bit odd) + b stays < 2^61: no int64 overflow in
# either engine. The modulus must be SMALLER than the products so the mod
# wraps many times — without wraparound the affine map is monotonic in h30
# and every "hash" shares one argmin, collapsing the LSH bands (learned the
# hard way: candidate pairs exploded 185x). 2^31-1 is prime: (h*a+b) mod M
# is a well-mixed permutation family. Entropy loss to 30 bits is harmless
# for min-hashing (birthday collisions only among 2^30 shingle values).
MIX_MOD = (1 << 31) - 1
_H30_MASK = (1 << 30) - 1


def mix_params(p: int) -> tuple[int, int]:
    import hashlib
    a = int(hashlib.md5(f"mixa:{p}".encode()).hexdigest()[:8], 16) & _H30_MASK | 1
    b = int(hashlib.md5(f"mixb:{p}".encode()).hexdigest()[:8], 16) & _H30_MASK
    return a, b


def mix60_col(h: Column, p: int) -> Column:
    a, b = mix_params(p)
    return (h.bitwiseAND(F.lit(_H30_MASK)) * F.lit(a) + F.lit(b)) % F.lit(MIX_MOD)


def mix60_sql(h_sql: str, p: int) -> str:
    a, b = mix_params(p)
    return f"((({h_sql}) & {_H30_MASK}) * {a} + {b}) % {MIX_MOD}"
