"""Skew-aware shuffle operators: salted joins and salted aggregation.

At 100 TB a shuffle keyed on a hot column melts: all rows of the hot key
land on one reducer, and the stage runs at the speed of that single
task. Spark's AQE skew-join (``spark.sql.adaptive.skewJoin``) re-splits
oversized SORT-MERGE partitions at runtime, but it does not help

- shuffle-HASH joins and stream-static joins (no sort phase to split),
- aggregations whose state is not algebraic (exact ``count_distinct``
  keeps a per-key set — re-splitting the partition would double-count),
- deliberately low-cardinality keys (fewer keys than reducers: splitting
  one partition still leaves every row of the key in one task's input
  *stream* for the final merge).

The classic, engine-independent answer is *salting*: widen the key space
by a deterministic factor ``n_salts`` so each hot key becomes ``n_salts``
independently-placed shuffle keys, and arrange the other side (replicate
the dimension / re-aggregate the partials) so the result is bit-identical
to the unsalted plan. These helpers implement the two canonical forms.
Both are pure DataFrame compositions — no UDFs, fully codegen'd — and
both are oracle-gated against their unsalted SQL mirrors
(``plans/maintenance_queries.py`` ``skew_salted_join`` /
``skew_salted_distinct``).

Salts are **deterministic** (``xxhash64`` of designated columns, never a
random), so retries, speculative tasks, and re-runs place every row
identically — the same idempotency contract as the sampling operators
(``operators/sampling.py``).

Reference parity note: the reference runs on GEE's managed backend and
never sees a shuffle; this module is part of the beyond-reference scale
surface (SCALE.md "skew" §).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt_src: Sequence[str] | None = None,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: fact side fans its hot join key across
    ``n_salts`` sub-keys; the dimension side is replicated ``n_salts``
    times (one copy per salt) so every fact row still meets every
    dimension row of its key. Bit-identical to ``facts.join(dim, on)``
    for ``inner`` and ``left`` joins (proven by the catalog oracle and
    ``tests/test_skew.py``'s brute-force equality).

    ``salt_src`` names the fact columns hashed into the salt (default:
    every fact column). Any choice is *correct* (the dimension is fully
    replicated); choose a high-cardinality column (a row id) so the hot
    key's rows spread uniformly. The salt is
    ``pmod(xxhash64(salt_src), n_salts)`` — deterministic under retry.

    Cost model: the dimension shuffles ``n_salts``× its size, the fact
    shuffles 1× — the right trade whenever ``|dim| · n_salts ≪ |fact|``,
    i.e. exactly the regime where the dim is too big to broadcast but
    far smaller than the skewed fact. ``right``/``full``/``anti`` joins
    are rejected: an unmatched dimension row would surface once per
    replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}"
        )
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    src = list(salt_src) if salt_src is not None else list(facts.columns)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in src]), F.lit(n_salts)
    ).cast("int")
    f = facts.withColumn(SALT, salt)
    d = dim.withColumn(
        SALT,
        # sequence(int, int) elements are already IntegerType; casting
        # AROUND explode is illegal (generators can't nest in exprs)
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return f.join(d, on=[*on, SALT], how=how).drop(SALT)


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    n_salts: int = 32,
    out: str | None = None,
) -> DataFrame:
    """Exact distinct count per key group, skew-proof.

    ``groupBy(key).agg(count_distinct(value))`` keeps the whole distinct
    set of the hot key in one task. Salting by ``hash(value)`` splits
    that set into ``n_salts`` **disjoint** subsets (a given value always
    lands in the same salt, independent of row placement), so the
    partial distinct counts are exact and their plain sum is the exact
    total — two partial-aggregated shuffles of at most
    ``|keys| · n_salts`` rows, no distinct set ever larger than
    ``|distinct values| / n_salts`` per task.

    Returns one row per key group with column ``out`` (default
    ``n_distinct_<value>``).
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    out = out or f"n_distinct_{value}"
    salt = F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int")
    partial = (
        df.groupBy(*[F.col(k) for k in keys], salt.alias(SALT))
        .agg(F.count_distinct(F.col(value)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias(out))
