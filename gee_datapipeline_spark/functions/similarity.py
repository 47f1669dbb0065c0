"""Embedding similarity primitives (LLM-data-pipeline surface).

Dot products are computed elementwise in double then accumulated through
``DECIMAL(38,12)`` (see ``functions.stable`` for why: exact associative
addition makes the result identical across engines and partitionings).
All of it is Catalyst higher-order functions over ``array<float>`` —
JVM-side, no Python in the loop.

Scale notes (100 TB): brute-force top-k is quadratic in row count — it is
the *correctness baseline*. The scale path is LSH bucketing
(``functions.dedup.hyperplane_lsh`` signs → equi-join on bucket id), which
turns the cross join into a per-bucket join; recall is tested against the
brute-force baseline in ``tests/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,12)"


def decimal_dot(a: Column, b: Column) -> Column:
    """Order-independent dot product of two float arrays, as double."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    total = F.aggregate(
        prods,
        F.lit(0).cast(_DEC),
        lambda acc, v: (acc + v).cast(_DEC),
    )
    return total.cast("double")


def sq_norm(a: Column) -> Column:
    return decimal_dot(a, a)


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine similarity given precomputed L2 norms (precompute per side
    before a join so norms aren't recomputed per pair)."""
    return decimal_dot(a, b) / (a_norm * b_norm)


def sql_decimal_dot(a: str, b: str) -> str:
    """DuckDB mirror of :func:`decimal_dot` (1-based list indexing)."""
    return (
        f"cast(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"AS DECIMAL(38,12)))) as double)"
    )
