"""Skew-salted shuffle operators (operators/skew.py): semantics proven
against the unsalted plans row-for-row, salt disjointness proven exact,
and the physical shape pinned (join keys widened by the salt, explode on
the dimension side only, never a cartesian)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.operators.skew import (
    SALT,
    salted_count_distinct,
    salted_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def facts(spark):
    # Deliberately hot: key 'a' holds 60% of the rows.
    rows = [
        (i, "a" if i % 10 < 6 else ("b" if i % 10 < 9 else "c"), float(i % 7))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "fact_id long, k string, v double")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [("a", 1.5), ("b", -2.0), ("c", 0.25), ("zzz", 9.9)],
        "k string, w double",
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_inner(facts, dim):
    plain = facts.join(dim, "k")
    salted = salted_join(facts, dim, on=["k"], salt_src=["fact_id"], n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_equals_plain_left(facts, dim):
    # 'd'-keyed facts have no dimension row: left join must keep them
    # with NULL payload, exactly once each.
    extra = facts.withColumn("k", F.when(F.col("fact_id") < 5, "d").otherwise(F.col("k")))
    plain = extra.join(dim, "k", "left")
    salted = salted_join(
        extra, dim, on=["k"], salt_src=["fact_id"], n_salts=8, how="left"
    )
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_rejects_right_and_full(facts, dim):
    for how in ("right", "full", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(facts, dim, on=["k"], salt_src=["fact_id"], how=how)


def test_salted_join_single_salt_degenerates_to_plain(facts, dim):
    salted = salted_join(facts, dim, on=["k"], salt_src=["fact_id"], n_salts=1)
    plain = facts.join(dim, "k")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_salted_join_plan_shape(spark, facts, dim):
    """With broadcast off (the regime salting is FOR), the join must be
    a shuffle join keyed on (k, salt); the explode sits on the dim side;
    no cartesian anywhere."""
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = salted_join(facts, dim, on=["k"], salt_src=["fact_id"], n_salts=8)
        plan = _plan(df)
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert SALT in plan  # the widened key is really in the join keys
    assert "Generate explode" in plan or "explode" in plan.lower()


def test_salted_count_distinct_exact(facts):
    got = salted_count_distinct(facts, ["k"], "v", n_salts=32)
    want = facts.groupBy("k").agg(F.count_distinct("v").alias("n_distinct_v"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_salted_count_distinct_partition_invariant(facts):
    one = salted_count_distinct(facts.repartition(1), ["k"], "v", n_salts=7)
    many = salted_count_distinct(facts.repartition(13), ["k"], "v", n_salts=7)
    assert _sorted_rows(one) == _sorted_rows(many)


def test_salted_count_distinct_multi_key_and_alias(spark):
    df = spark.createDataFrame(
        [("x", 1, 10), ("x", 1, 10), ("x", 2, 10), ("y", 1, 11)],
        "a string, b int, u int",
    )
    got = salted_count_distinct(df, ["a", "b"], "u", n_salts=4, out="nu")
    assert sorted(got.columns) == ["a", "b", "nu"]
    assert _sorted_rows(got) == [("x", 1, 1), ("x", 2, 1), ("y", 1, 1)]


def test_salted_count_distinct_empty_input(spark):
    df = spark.createDataFrame([], "k string, u long")
    assert salted_count_distinct(df, ["k"], "u").count() == 0
