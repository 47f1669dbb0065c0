"""Deterministic sampling for corpus curation.

Training-data pipelines need reproducible samples — "the same 1% every
run, on any engine" — so these operators derive randomness from a
Knuth multiplicative hash of the row id (public constant 2654435761 =
⌊2³²/φ⌋) instead of an RNG. The hash is plain BIGINT arithmetic, so the
DuckDB oracles compute the identical sample and the gate checks
value-for-value equality; ``rand(seed)`` could never be cross-checked.

Scale notes: Bernoulli sampling is a pure filter (narrow, pushes past
column pruning); stratified top-k is one hash-shuffle on the group key
with a k-bounded window — the same shape as any top-k per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761  # ⌊2^32 / golden ratio⌋
MOD = 2**32


def sample_hash(id_col: str) -> F.Column:
    """Deterministic uniform-ish value in [0, 2^32) from a BIGINT id."""
    return (F.col(id_col) * F.lit(KNUTH)) % F.lit(MOD)


def bernoulli_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by id hash."""
    return df.filter(sample_hash(id_col) < int(fraction * MOD))


def stratified_sample(
    df: DataFrame, keys: list[str], id_col: str, k: int
) -> DataFrame:
    """k rows per group, deterministically: rank by (hash, id) inside
    each key group and keep the top k."""
    w = Window.partitionBy(*keys).orderBy(
        sample_hash(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )
