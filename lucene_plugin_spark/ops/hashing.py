"""Portable deterministic hashing shared by dedup/similarity operators.

``md5_long(col)`` maps a string to a 60-bit non-negative int64 identically in
Spark SQL and DuckDB, so every operator built on it is oracle-checkable:

- Spark:  ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to long
- DuckDB: ``cast('0x' || substr(md5(x), 1, 15) as bigint)``

Seeded hash families for MinHash are ``md5_long(seed || ':' || x)``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MD5_PREFIX_HEX = 15  # 60 bits, safely inside int64


def md5_long(col: Column | str, seed: int | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if seed is not None:
        c = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(c), 1, MD5_PREFIX_HEX), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: int | None = None) -> str:
    """The DuckDB-equivalent SQL fragment (expr is a SQL string expression)."""
    if seed is not None:
        expr = f"('{seed}:' || {expr})"
    return f"cast('0x' || substr(md5({expr}), 1, {MD5_PREFIX_HEX}) as bigint)"


# MinHash family: ONE md5 per input + cheap affine mixes per hash function.
# Arithmetic stays below 2^62 (31-bit modulus x 31-bit multiplier) so Spark
# and DuckDB agree exactly (DuckDB errors on BIGINT overflow, Java wraps —
# neither path may overflow).
MINHASH_MOD = 2147483647          # 2^31 - 1 (prime)
MINHASH_A = [1103515245, 1229782938, 1597334677, 1856431235,
             2027808484, 1434869235, 1764606871, 2111485447]
MINHASH_B = [12345, 67890, 424242, 777777, 101010, 131313, 232323, 353535]


def minhash_mix(base: Column, j: int) -> Column:
    """h_j(base) for the affine family over md5_long output."""
    a, b = MINHASH_A[j % len(MINHASH_A)], MINHASH_B[j % len(MINHASH_B)]
    return ((base % MINHASH_MOD) * F.lit(a) + F.lit(b)) % MINHASH_MOD


def minhash_mix_sql(expr: str, j: int) -> str:
    a, b = MINHASH_A[j % len(MINHASH_A)], MINHASH_B[j % len(MINHASH_B)]
    return f"((({expr}) % {MINHASH_MOD}) * {a} + {b}) % {MINHASH_MOD}"
