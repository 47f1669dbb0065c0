"""Physical-plan assertions (SURVEY.md §4): the optimizations the engine
relies on at 100 TB must actually appear in the executed plans —
predicate pushdown into parquet scans, broadcast of dimension sides,
whole-stage codegen on the hot paths, partial (map-side) aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gee_datapipeline_spark.plans import QUERIES
from gee_datapipeline_spark.plans.registry import _load_all

from conftest import SF_SMOKE

_load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pricing_summary_pushes_filter_to_scan(spark):
    """The Q1 date filter must reach the parquet reader (PushedFilters),
    not run as a post-scan Filter only."""
    df = QUERIES["pricing_summary"].spark(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_pricing_summary_partial_aggregation(spark):
    """Composite aggregates must be partial+final hash aggregates
    (map-side combine shrinks the shuffle by the group ratio)."""
    plan = _plan(QUERIES["pricing_summary"].spark(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan.lower() or "partial" in plan


def test_star_join_broadcasts_dimensions(spark):
    """Customer (dimension, filtered) must broadcast — no shuffle of the
    fact side on the dimension key."""
    plan = _plan(QUERIES["star_join_topk"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_regional_revenue_broadcasts_tiny_dims(spark):
    """region (5 rows) and nation (25 rows) must broadcast in the Q5
    chain."""
    plan = _plan(QUERIES["regional_revenue"].spark(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2


def test_star_join_topk_take_ordered(spark):
    """Global top-k must plan TakeOrderedAndProject — never a total
    sort."""
    plan = _plan(QUERIES["star_join_topk"].spark(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark):
    """A two-column projection must scan two columns (ReadSchema), not
    the whole table."""
    df = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_composite_codegen(spark):
    """The flagship composite chain stays inside whole-stage codegen
    (no interpreted expressions on the hot path). AQE only reveals
    codegen spans in the finalized plan, so execute first."""
    df = QUERIES["mean_composite"].spark(spark, SF_SMOKE)
    df.collect()  # finalize THIS DataFrame's adaptive plan in place
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen stages in the final plan;
    # both the partial and final aggregate must be inside one.
    assert "*(1) HashAggregate" in plan and "*(2) HashAggregate" in plan


def test_proximity_join_is_equi_join_on_cell(spark):
    """The geo proximity join must plan as a hash/broadcast equi-join on
    the grid cell — NOT BroadcastNestedLoopJoin (the cross-product
    shape that dies at scale)."""
    from gee_datapipeline_spark.functions.geo import proximity_join
    from gee_datapipeline_spark.sources.synthetic import (
        make_amenities,
        make_pixels,
    )

    px = make_pixels(spark, months=1, grid=6).select("x", "y", "lon", "lat")
    amen = make_amenities(spark, n=5).select("feature_id", "lon", "lat")
    plan = _plan(proximity_join(px, amen, radius_km=10.0))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_band_join_is_equi_join(spark):
    """The LSH band join must be an equi-join (sort-merge or hash) on
    (band_id, band_hash) — the whole point of banding."""
    plan = _plan(QUERIES["minhash_lsh_pairs"].spark(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_ann_lsh_is_equi_join(spark):
    """The LSH ANN candidate join must be an equi-join on (table_id,
    bucket) — never a cross/nested-loop over all vector pairs."""
    plan = _plan(QUERIES["ann_lsh"].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_bruteforce_broadcasts_probes(spark):
    """Brute force is allowed its nested loop ONLY because the probe
    side broadcasts (map-side, no shuffle of candidates)."""
    plan = _plan(QUERIES["ann_bruteforce"].spark(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_simhash_band_join_is_equi_join(spark):
    plan = _plan(QUERIES["simhash_pairs"].spark(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_broadcasts_spine(spark):
    """The month-spine range join must broadcast the spine side."""
    plan = _plan(QUERIES["interval_join_monthly"].spark(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_date_filter_partition_pruning(spark, tmp_path):
    """P4 over the partitioned pixel store: the date predicate must
    prune partitions at planning time (PartitionFilters), scanning only
    matching directories."""
    from gee_datapipeline_spark.sinks.writers import write_pixels
    from gee_datapipeline_spark.sources.synthetic import make_pixels

    store = str(tmp_path / "pixels")
    write_pixels(make_pixels(spark, months=2, grid=4), store)
    df = spark.read.parquet(store).filter(
        (F.col("dataset") == "no2") & (F.col("date") == F.lit("2025-01-02"))
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "isnotnull(dataset" in plan or "dataset#" in plan


def test_asof_join_single_probe_shuffle_no_explosion(spark):
    """The as-of join must plan as union + ONE window shuffle on the key
    — never a joined pair explosion (no join node at all in the plan)."""
    plan = _plan(QUERIES["asof_clicks_to_errors"].spark(spark, SF_SMOKE))
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin"):
        assert node not in plan


def test_big_orders_fact_never_shuffles_on_join(spark):
    """Q18 shape: the HAVING key-set and the customer dim both broadcast,
    so the orders fact is joined without a shuffle on either key."""
    plan = _plan(QUERIES["big_orders"].spark(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_promo_share_broadcasts_part_single_agg_pass(spark):
    """Q14 shape: part broadcasts; the conditional ratio computes in one
    partial+final aggregation pass over a single lineitem scan."""
    plan = _plan(QUERIES["promo_share"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 2  # lineitem + part, once each


def test_moving_average_no_unpartitioned_window(spark):
    """The trailing-7d frame must not collapse to a single-partition
    window OVER THE FACT: every windowspecdefinition that orders by a
    row-level column carries a partition key (the
    blocked_trailing_window pattern). The one permitted unpartitioned
    spec is the bucket-offset prefix sum ordered by ``__vb`` — its
    input is the per-bucket count table, bounded by the idx domain /
    block size (calendar-sized), never by the corpus."""
    import re

    plan = _plan(QUERIES["moving_average"].spark(spark, SF_SMOKE))
    # An unpartitioned spec renders as "windowspecdefinition(<order> ASC"
    # (no partition expressions before the ordering spec).
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        args = m.group(1)
        head = args.split(",")[0]
        if "__vb" in head:
            continue  # bucket-table prefix sum: block-count-sized input
        assert " ASC" not in head, (
            f"unpartitioned window spec in plan: {args!r}"
        )


def test_blocked_trailing_window_matches_global(spark):
    """blocked_trailing_window == the single-partition global frame,
    including across block seams (idx chosen to straddle multiples of
    the block size)."""
    from pyspark.sql import Window

    from gee_datapipeline_spark.operators.windows import (
        blocked_trailing_window,
    )

    # idx values straddle the 16-block boundaries, with gaps — including
    # EMPTY value-blocks (65 → 300 skips whole 16-ranges) and a sparse
    # tail whose value-blocks hold fewer than n_preceding rows: the
    # sparse-index regime where value-blocking broke the carry chain
    # (caught by the star-schema differential fuzz).
    rows = [(i, float(i * i % 97)) for i in
            [0, 3, 14, 15, 16, 17, 30, 31, 32, 33, 40, 47, 48, 49, 63,
             64, 65, 300, 301, 555, 999, 1000, 1601]]
    df = spark.createDataFrame(rows, ["idx", "v"])
    gw = Window.orderBy("idx").rowsBetween(-3, 0)
    want = {
        (r.idx, round(r.avg, 9))
        for r in df.select("idx", F.avg("v").over(gw).alias("avg")).collect()
    }
    u, w = blocked_trailing_window(df, "idx", n_preceding=3, block=16)
    got = {
        (r.idx, round(r.avg, 9))
        for r in u.withColumn("avg", F.avg("v").over(w))
        .filter(~F.col("__carry"))
        .select("idx", "avg")
        .collect()
    }
    assert got == want


def test_min_cost_supplier_broadcasts_dims_and_double_partial_agg(spark):
    """Q2 shape: part/supplier/nation broadcast; the per-part argmin is
    an aggregate (partial+final), never a window over the fact."""
    plan = _plan(QUERIES["min_cost_supplier"].spark(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Window" not in plan
    # two partial+final pairs: hash agg on (part, supp), then the
    # struct-argmin per part (min of struct plans as SortAggregate)
    assert plan.count("HashAggregate") + plan.count("SortAggregate") >= 4
    assert plan.count("partial_min") >= 2


def test_late_shipment_priority_is_semi_join(spark):
    """Q4 EXISTS must plan as a LeftSemi join — one pass over lineitem,
    no duplicate-order explosion."""
    plan = _plan(QUERIES["late_shipment_priority"].spark(spark, SF_SMOKE))
    assert "LeftSemi" in plan


def test_late_unreturned_orders_semi_then_anti(spark):
    """Q21 shape: EXISTS → LeftSemi and NOT EXISTS → LeftAnti in one
    plan."""
    plan = _plan(QUERIES["late_unreturned_orders"].spark(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_top_revenue_supplier_scalar_broadcast(spark):
    """Q15: the max-revenue scalar joins back via broadcast, and the
    fact table is scanned once (the aggregate reuses one exchange)."""
    plan = _plan(QUERIES["top_revenue_supplier"].spark(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_semantic_dedup_no_global_cross_product(spark):
    """SemDeDup's pair stage must join on the cluster key (equi),
    never a full cross join of the embedding table with itself."""
    df = QUERIES["semantic_dedup"].spark(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan


def test_span_dedup_aggregates_on_digest(spark):
    """Span dedup shuffles digests only: the plan contains hash
    aggregates (map-side combine on the span hash) and no join on raw
    text."""
    plan = _plan(QUERIES["span_dedup"].spark(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_shipping_priority_take_ordered_and_broadcast(spark):
    """Q3: customer (filtered dim) broadcasts; the global top-10 is
    TakeOrderedAndProject, never a full sort of the aggregate."""
    plan = _plan(QUERIES["shipping_priority"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_volume_shipping_single_fact_scan(spark):
    """Q7: one lineitem scan, supplier/customer/nation all broadcast —
    the fact table shuffles only for the orders equi-join."""
    plan = _plan(QUERIES["volume_shipping"].spark(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("lineitem.parquet") <= 1 or "lineitem" in plan


def test_part_supplier_diversity_anti_join_broadcast(spark):
    """Q16: the NOT-IN supplier exclusion must be a broadcast anti-join
    (never a shuffled one for a dimension-sized exclusion list)."""
    plan = _plan(QUERIES["part_supplier_diversity"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_customer_distribution_outer_join_keeps_filter_inside(spark):
    """Q13: the orders-side priority filter must sit below the outer
    join (filter-then-join), not above it where it would wrongly drop
    zero-order customers — and the plan must still show an outer join."""
    df = QUERIES["customer_distribution"].spark(spark, SF_SMOKE)
    opt = _optimized(df)
    assert "LeftOuter" in opt or "RightOuter" in opt


def test_sequence_packing_single_window_shuffle(spark):
    """Packing is one hash-shuffle on the stream key plus a running-sum
    window — no extra exchanges, no text column in the shuffle."""
    plan = _plan(QUERIES["sequence_packing"].spark(spark, SF_SMOKE))
    assert plan.count("Exchange") <= 2  # AQE may show shuffle + read
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_mixture_sampling_no_shuffle(spark):
    """Mixture sampling is a narrow filter + bounded explode: zero
    exchanges in the whole plan."""
    plan = _plan(QUERIES["mixture_sampling"].spark(spark, SF_SMOKE))
    assert "Exchange" not in plan


def test_funnel_stages_reuse_user_partitioning(spark):
    """Funnel: every stage keys on user_id; no broadcast of the raw
    fact table (only aggregated stage outputs may broadcast)."""
    plan = _plan(QUERIES["funnel_conversion"].spark(spark, SF_SMOKE))
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_scd2_windows_share_one_sort(spark):
    """SCD2: the lag (change-detect) and lead (validity) windows use the
    same (user_id | ts, event_id) ordering — one shuffle, one sort
    feeding both."""
    plan = _plan(QUERIES["scd2_user_state"].spark(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_pagerank_iteration_is_join_plus_agg(spark):
    """Each power-method step must be an equi-join + hash aggregate —
    no cartesian products, no window over the edge list."""
    plan = _plan(QUERIES["pagerank_trade_network"].spark(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_token_budget_head_no_global_sort_of_corpus(spark):
    """The histogram-cutoff selection must not globally sort documents;
    the only full Sort allowed is over the SCORE_LEVELS-bounded level
    table (rangepartitioning on `level` only)."""
    plan = _plan(QUERIES["token_budget_head"].spark(spark, SF_SMOKE))
    import re

    for m in re.finditer(r"Sort \[([^\]]*)\].*global=true", plan):
        assert "doc_id" not in m.group(1)


def test_cms_build_partial_aggregates(spark):
    """CMS matrix construction must partial-aggregate map-side (the
    shuffle carries <= d*w rows per partition, not the corpus)."""
    plan = _plan(QUERIES["cms_heavy_hitters"].spark(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2


def test_returned_items_aggregates_before_dimension_joins(spark):
    """Q10: the revenue aggregate runs on the (lineitem ⋈ orders) rows
    BEFORE customer/nation join — the dimensions broadcast onto
    |customers| aggregated rows, never onto raw fact rows."""
    plan = _plan(QUERIES["returned_items"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_contract_audit_single_scan(spark):
    """All declared contracts evaluate in one pass: exactly one scan of
    lineitem, one aggregate, no joins."""
    plan = _plan(QUERIES["contract_audit"].spark(spark, SF_SMOKE))
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan


def test_sql_surface_report_pushes_filter(spark):
    """The raw-SQL front door gets the same pushdown as the DSL."""
    plan = _plan(QUERIES["sql_surface_report"].spark(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_interval_join_bucketized_is_hash_join(spark):
    """The calendar-aligned interval join must collapse to an equi-join
    on the bucket key: BroadcastHashJoin (O(1) probe per fact row),
    never the generic nested-loop's O(|spine|) evaluations per row."""
    plan = _plan(QUERIES["interval_join_bucketized"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bloom_prefilter_broadcasts_all_probes_no_fact_shuffle(spark):
    """Every Bloom probe join must be a BroadcastHashJoin (map-side),
    and the fact must not shuffle before the probes: the only Exchange
    in the plan belongs to the final aggregation, plus the bloom
    build's own tiny-word-table agg."""
    plan = _plan(QUERIES["bloom_prefilter_revenue"].spark(spark, SF_SMOKE))
    from gee_datapipeline_spark.operators.joins import BLOOM_K

    # k probe joins + final exact semi-join, all broadcast
    assert plan.count("BroadcastHashJoin") >= BLOOM_K + 1
    assert "SortMergeJoin" not in plan


def test_quality_classifier_broadcasts_model_artifact(spark):
    """The B-row weight table must broadcast; the corpus must never
    sort-merge-join on the bucket key."""
    plan = _plan(QUERIES["quality_classifier_score"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_inverted_index_no_join_no_window(spark):
    """The segmented postings build is pure keyed aggregation: no join
    node, no window, and partial (map-side) aggregation on the
    (term, doc_id) distinct."""
    plan = _plan(QUERIES["inverted_index_postings"].spark(spark, SF_SMOKE))
    assert "Join" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2
