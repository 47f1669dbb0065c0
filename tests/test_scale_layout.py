"""Scale-layout tests: Z-order locality, bucketed co-located joins
(the shuffle-elimination tools for the 100 TB design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.geo import z_order_key

from conftest import SF_SMOKE
from gee_datapipeline_spark.sinks.writers import write_pixels
from gee_datapipeline_spark.sources.synthetic import make_pixels


def test_z_order_key_locality(spark):
    """Adjacent cells differ in few low bits; distant cells differ high:
    check the interleave against hand-computed Morton codes."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 3)], ["x", "y"]
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", z_order_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    assert got == {
        (0, 0): 0b0000,
        (1, 0): 0b0001,
        (0, 1): 0b0010,
        (1, 1): 0b0011,
        (2, 2): 0b1100,
        (3, 3): 0b1111,
    }


def test_write_pixels_spatial_sort_roundtrip(spark, tmp_path):
    """Z-ordered store returns identical data (sort is layout-only)."""
    px = make_pixels(spark, months=1, grid=6)
    out = str(tmp_path / "zstore")
    write_pixels(px, out, spatial_sort=True)
    back = spark.read.parquet(out)
    assert back.count() == px.count()
    a = {tuple(r) for r in px.select("dataset", "x", "y", "value").collect()}
    b = {tuple(r) for r in back.select("dataset", "x", "y", "value").collect()}
    assert a == b


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-co-locates them: the
    join plan must contain NO Exchange (shuffle) above the scans —
    the steady-state layout for repeated fact-fact joins at 100 TB."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "li_b"))
        .saveAsTable("li_b")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .saveAsTable("orders_b")
    )
    joined = spark.table("li_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable broadcast so the co-location is what's being tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_dynamic_partition_pruning_on_date_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning gate: a date-partitioned fact joined to
    a filtered dimension must get a runtime partition filter (Spark's
    ``dynamicpruning`` subquery on the scan) — at 100 TB this is the
    difference between scanning 3 partitions and scanning 3 years. The
    partitioned-layout write is the same per-day layout the driver
    scripts' month-keyed exports produce."""
    from gee_datapipeline_spark.catalog import load_table

    events = load_table(spark, SF_SMOKE, "events")
    fact_path = str(tmp_path / "events_by_day")
    fact = events.withColumn(
        "day", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    fact.write.partitionBy("day").parquet(fact_path)

    fact_p = spark.read.parquet(fact_path)
    n_days = fact_p.select("day").distinct().count()
    assert n_days > 3

    # Dimension: a filtered, broadcastable day attribute table. The
    # filter is NOT on the fact, so only DPP can prune the scan.
    dim = (
        fact_p.select("day").distinct()
        .withColumn("dow", F.dayofweek(F.to_date("day")))
    )
    dim_path = str(tmp_path / "day_dim")
    dim.write.parquet(dim_path)
    dim_p = spark.read.parquet(dim_path).filter(F.col("dow") == 2)

    joined = fact_p.join(F.broadcast(dim_p), "day").groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # Correctness: identical to pushing the day list manually.
    keep = [r["day"] for r in dim_p.select("day").distinct().collect()]
    direct = (
        fact_p.filter(F.col("day").isin(keep))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, direct.collect())
    )
