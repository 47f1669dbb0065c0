"""Bucketed co-located join (operators/bucketing.py): the layout must
remove the join-side shuffles, and the cached-layout path must serve
identical results."""

from __future__ import annotations

import re

from conftest import SF_SMOKE

from gee_datapipeline_spark.catalog import load_table
from gee_datapipeline_spark.operators.bucketing import (
    bucketed_table,
    colocated_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_has_no_exchange_on_join_inputs(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    joined = colocated_join(
        orders,
        customer,
        "orders_by_cust",
        "customer_by_cust",
        "o_custkey",
        "c_custkey",
        ("o_orderkey", "o_totalprice"),
        ("c_custkey", "c_acctbal"),
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    # The join itself must consume the bucketed layout directly: no
    # hash-partitioning Exchange on either join key anywhere in the
    # join subtree (a downstream aggregate may still shuffle on ITS
    # keys — that is not the join's shuffle).
    assert not re.search(r"Exchange hashpartitioning\(o_custkey", plan)
    assert not re.search(r"Exchange hashpartitioning\(c_custkey", plan)


def test_bucketed_join_matches_plain_join(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    joined = colocated_join(
        orders,
        customer,
        "orders_by_cust",
        "customer_by_cust",
        "o_custkey",
        "c_custkey",
        ("o_orderkey", "o_totalprice"),
        ("c_custkey", "c_acctbal"),
    )
    got = sorted(
        (r.o_orderkey, r.c_custkey) for r in joined.collect()
    )
    want = sorted(
        (r.o_orderkey, r.c_custkey)
        for r in orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).collect()
    )
    assert got == want and len(got) > 0


def test_bucketed_table_reused_within_session(spark):
    """Second call must short-circuit on the catalog entry (same table
    name, no second write) — the amortization the docstring promises."""
    orders = load_table(spark, SF_SMOKE, "orders")
    a = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    name_a = a.sparkSession.catalog.listTables()
    b = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    name_b = b.sparkSession.catalog.listTables()
    assert {t.name for t in name_a} == {t.name for t in name_b}
    assert a.count() == b.count() == orders.count()


# ------------------------------------------------- bloom prefilter


def test_bloom_prefilter_no_false_negatives_and_fp_removal(spark):
    """With a deliberately tiny bitmap (m=256 bits, many collisions),
    the prefilter must still pass EVERY true key (no false negatives),
    false positives must appear (proving the exact join is doing real
    work), and the registered query's final result must equal the
    plain semi-join exactly."""
    from pyspark.sql import functions as F

    from gee_datapipeline_spark.catalog import load_table
    from gee_datapipeline_spark.operators.joins import (
        bloom_build,
        bloom_prefilter,
    )

    customer = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    true_keys = {r.c_custkey for r in seg.collect()}

    m_bits, k = 256, 2
    bloom = bloom_build(seg, "c_custkey", m_bits=m_bits, k=k)
    passed = bloom_prefilter(
        orders, bloom, "o_custkey", m_bits=m_bits, k=k
    )
    passed_keys = {
        r.o_custkey for r in passed.select("o_custkey").distinct().collect()
    }
    all_keys = {
        r.o_custkey for r in orders.select("o_custkey").distinct().collect()
    }
    # no false negatives: every true key with orders passes
    assert (true_keys & all_keys) <= passed_keys
    # tiny bitmap ⇒ false positives exist, and are a strict subset
    fps = passed_keys - true_keys
    assert fps, "256-bit bloom over ~60 keys should collide"
    assert passed_keys < all_keys, "bloom should still reject something"


def test_bloom_default_sizing_fp_rate_is_tiny(spark):
    """At the default m=2^16/k=3 sizing the prefilter pass-set should
    be exactly the true key set on this data (expected FP ~1e-6)."""
    from pyspark.sql import functions as F

    from gee_datapipeline_spark.catalog import load_table
    from gee_datapipeline_spark.operators.joins import (
        bloom_build,
        bloom_prefilter,
    )

    customer = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders")
    seg = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    true_keys = {r.c_custkey for r in seg.collect()}
    passed = bloom_prefilter(orders, bloom_build(seg, "c_custkey"), "o_custkey")
    passed_keys = {
        r.o_custkey for r in passed.select("o_custkey").distinct().collect()
    }
    all_keys = {
        r.o_custkey for r in orders.select("o_custkey").distinct().collect()
    }
    assert passed_keys == (true_keys & all_keys)


def test_relayout_reattaches_without_rewriting(spark):
    """Cross-session amortization: when the bucketed files already
    exist (a previous session wrote them) but the in-memory catalog
    has forgotten the table, bucketed_table must RE-ATTACH via DDL —
    same files (no rewrite), and the re-attached table must still give
    the no-Exchange co-located join."""
    import os
    import re as _re

    from gee_datapipeline_spark.operators.bucketing import (
        _artifact_root,
        corpus_fingerprint,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    a = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    n_rows = a.count()
    fp = corpus_fingerprint(orders, "o_orderkey", "o_totalprice")
    name = f"orders_by_cust_b8_{fp}"
    path = os.path.join(_artifact_root(), name)
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert mtimes, "expected bucketed parquet files on disk"
    # Simulate the next session: catalog forgets, files survive.
    spark.sql(f"DROP TABLE `{name}`")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    b = bucketed_table(
        orders, "orders_by_cust", "o_custkey", ("o_orderkey", "o_totalprice")
    )
    assert b.count() == n_rows
    after = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    }
    assert after == mtimes, "re-attach must not rewrite the files"
    joined = colocated_join(
        orders,
        customer,
        "orders_by_cust",
        "customer_by_cust",
        "o_custkey",
        "c_custkey",
        ("o_orderkey", "o_totalprice"),
        ("c_custkey", "c_acctbal"),
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert not _re.search(r"Exchange hashpartitioning\(o_custkey", plan)
    assert not _re.search(r"Exchange hashpartitioning\(c_custkey", plan)
