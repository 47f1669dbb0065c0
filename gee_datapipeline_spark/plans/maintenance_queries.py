"""Pipeline-maintenance queries: corpus checksums for lineage/diffing,
and incremental aggregate maintenance (partial-agg combine == full
recompute).

Both serve the same operational need at 100 TB: re-running yesterday's
job must be byte-identical (``functions.stable``), provable without
re-reading the world. A checksum per partition makes drift detectable
with a metadata-sized scan; incremental maintenance makes the daily
update cost proportional to the delta, not the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.stable import sql_stable_sum, stable_sum
from .registry import Query, register

# 60-bit row hash from the md5 hex prefix: fits a signed 64-bit long
# with headroom, identical in both engines.
_HASH_HEX_CHARS = 15
_SUM_MOD = 2**61


def _row_hash(cols_expr) -> F.Column:
    return F.conv(
        F.substring(F.md5(cols_expr), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


def _corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-source corpus checksum: a 60-bit md5 row
    fingerprint over (doc_id, text), combined with an order-independent
    modular SUM (exact via DECIMAL, mod 2^61) plus the row count.
    Equal checksums ⇒ equal partitions with overwhelming probability;
    comparing two pipeline runs (or two replicas) costs one
    sources-sized scan of 3 integers each.

    Scale: one narrow map (hash) + one hash-agg on source — map-side
    partials shrink the shuffle to |sources| rows per partition. The
    modular sum (not xor) is used so duplicated rows cannot cancel."""
    docs = load_table(spark, sf_dir, "documents")
    h = _row_hash(F.concat_ws(":", F.col("doc_id"), F.col("text")))
    return (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("h").cast("decimal(38,0)")) % F.lit(_SUM_MOD))
            .cast("long")
            .alias("checksum"),
        )
    )


_SQL_ROW_HASH = " + ".join(
    "(strpos('0123456789abcdef', "
    f"substr(md5(doc_id || ':' || text), {i + 1}, 1)) - 1) "
    f"* {16 ** (_HASH_HEX_CHARS - 1 - i)}"
    for i in range(_HASH_HEX_CHARS)
)

register(
    Query(
        name="corpus_checksum",
        spark=_corpus_checksum,
        oracle=f"""
            WITH hashed AS (
                SELECT source,
                       CAST({_SQL_ROW_HASH} AS BIGINT) AS h
                FROM documents
            )
            SELECT source, count(*) AS n_rows,
                   CAST(sum(CAST(h AS DECIMAL(38,0))) % {_SUM_MOD}
                        AS BIGINT) AS checksum
            FROM hashed GROUP BY 1
        """,
        tags=("lineage", "checksum", "llm-pipeline"),
    )
)


def _incremental_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: monthly revenue kept as
    DECIMAL partials, updated by aggregating ONLY the newest month and
    combining — the continuous-aggregate / materialized-view pattern.
    The oracle recomputes from scratch; equality holds because decimal
    partial sums form a commutative monoid (the exact property
    ``functions.stable`` exists to provide — float partials would NOT
    satisfy it).

    Scale: the daily update touches one partition of the fact table;
    history is never re-read. Both branches partial-aggregate map-side
    and combine on |months| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("2001-01-01").cast("timestamp")
    month = F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
    partial = lambda df: df.groupBy(month).agg(  # noqa: E731
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).alias("rev_partial"),
        F.count(F.lit(1)).alias("n_items"),
    )
    base = partial(li.filter(F.col("l_shipdate") < cutoff))
    delta = partial(li.filter(F.col("l_shipdate") >= cutoff))
    return (
        base.unionAll(delta)
        .groupBy("ship_month")
        .agg(
            F.round(F.sum("rev_partial").cast("double"), 2).alias("revenue"),
            F.sum("n_items").alias("n_items"),
        )
    )


register(
    Query(
        name="incremental_revenue",
        spark=_incremental_revenue,
        oracle=f"""
            SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                   {sql_stable_sum('l_extendedprice * (1 - l_discount)')}
                       AS revenue,
                   count(*) AS n_items
            FROM lineitem
            GROUP BY 1
        """,
        tags=("maintenance", "incremental"),
    )
)
