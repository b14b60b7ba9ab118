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
