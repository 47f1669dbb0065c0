"""Structural invariants of the batch-assembly operators — properties
the oracle's value-hash can't articulate (it checks equality, not
meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gee_datapipeline_spark.plans import QUERIES
from gee_datapipeline_spark.plans.registry import _load_all
from gee_datapipeline_spark.plans.packing_queries import (
    CONTEXT_TOKENS,
    MIXTURE_WEIGHTS,
    TOKEN_BUDGET,
    N_SHARDS,
)

from conftest import SF_SMOKE

_load_all()


def test_sequence_packing_is_contiguous_per_stream(spark):
    """Offsets tile each source stream exactly: sorted by doc_id, every
    doc starts where its predecessor ended, and pack_id is its start
    divided by the context length."""
    rows = (
        QUERIES["sequence_packing"].spark(spark, SF_SMOKE)
        .orderBy("source", "doc_id")
        .collect()
    )
    pos = {}
    for r in rows:
        expected = pos.get(r["source"], 0)
        assert r["start_offset"] == expected, r
        assert r["pack_id"] == expected // CONTEXT_TOKENS
        pos[r["source"]] = expected + r["n_tokens"]


def test_mixture_sampling_copy_counts_match_weights(spark):
    """Every document appears floor(w) or ceil(w) times; weight-0
    sources vanish; copy indices are dense from 0."""
    import math

    rows = QUERIES["mixture_sampling"].spark(spark, SF_SMOKE).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault((r["doc_id"], r["source"]), []).append(
            r["copy_idx"]
        )
    assert all(r["source"] != "src3" for r in rows)  # weight 0.0
    for (doc_id, source), copies in per_doc.items():
        w = MIXTURE_WEIGHTS.get(source, 1.0)
        assert sorted(copies) == list(range(len(copies)))
        assert len(copies) in {math.floor(w), math.ceil(w)}, (
            doc_id,
            source,
            len(copies),
        )


def test_token_budget_head_fills_but_never_overflows(spark):
    """Selected mass ≤ budget; every selected doc outranks (by quality
    level) every rejected one, except inside the boundary level."""
    sel = QUERIES["token_budget_head"].spark(spark, SF_SMOKE).collect()
    total = sum(r["n_tokens"] for r in sel)
    corpus = QUERIES["sequence_packing"].spark(spark, SF_SMOKE).collect()
    corpus_tokens = sum(r["n_tokens"] for r in corpus)
    if corpus_tokens > TOKEN_BUDGET:
        assert total <= TOKEN_BUDGET
        assert len(sel) < len(corpus)
    else:
        # corpus fits: "until budget OR exhaustion" keeps everything
        assert len(sel) == len(corpus) and total == corpus_tokens


def test_shard_assignment_positions_dense(spark):
    rows = QUERIES["shard_assignment"].spark(spark, SF_SMOKE).collect()
    shards = {}
    for r in rows:
        assert 0 <= r["shard"] < N_SHARDS
        shards.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, positions in shards.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard


def test_waterfill_partition_invariant(spark):
    """The water line and the doc-level keep set are pure functions of
    the corpus: both queries must return bit-identical rows under an
    adversarial repartitioning of `documents` (integer counts, hash
    ordering — nothing layout-dependent)."""
    import gee_datapipeline_spark.plans.packing_queries as pq

    def rows(name):
        return sorted(
            tuple(r) for r in QUERIES[name].spark(spark, SF_SMOKE).collect()
        )

    base_cap = rows("source_token_waterfill")
    base_keep = rows("waterfill_apply")
    assert base_keep, "the keep set must be non-empty at SF_SMOKE"

    orig = pq.load_table

    def shuffled(s, d, name):
        df = orig(s, d, name)
        return df.repartition(13) if name == "documents" else df

    pq.load_table = shuffled
    try:
        assert rows("source_token_waterfill") == base_cap
        assert rows("waterfill_apply") == base_keep
    finally:
        pq.load_table = orig
