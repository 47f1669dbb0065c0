"""Catalog-wide partition-invariance gate.

The determinism contract (`functions/stable.py`, README) claims results
are bit-identical across partitionings and degrees of parallelism —
that is what makes backfills idempotent and outputs diffable on a real
cluster, where input splits and shuffle fan-in differ run to run. This
battery proves it mechanically for a representative query per family:
every table load is repartitioned to an adversarial prime width AND
``spark.sql.shuffle.partitions`` is changed, and the value hash must
not move.
"""

from __future__ import annotations

import pandas as pd

from conftest import SF_SMOKE
from parity_sweep import value_hash

import gee_datapipeline_spark.catalog as catalog
from gee_datapipeline_spark.plans.registry import QUERIES, _load_all

_load_all()

BATTERY = [
    # decimal-aggregate families
    "pricing_summary",
    "regional_revenue",
    "mean_composite",
    "gini_concentration",
    "lang_source_mi",
    "term_keyness",
    "zipf_slope",
    "lexical_diversity",
    # md5-uniform determinism (sampling / allocation)
    "weighted_sample_wor",
    "source_token_waterfill",
    "waterfill_apply",
    "dp_noisy_counts",
    # window / ordered families
    "moving_average",
    "topk_per_group",
    "cumulative_unique_users",
    "attribution_position",
    # dedup / embedding families
    "minhash_lsh_pairs",
    "embedding_centroids",
    "embedding_pca_power",
]


def _run_all(spark, names):
    out = {}
    for n in names:
        pdf = QUERIES[n].spark(spark, SF_SMOKE).toPandas()
        out[n] = (len(pdf), value_hash(pdf))
    return out


def test_battery_is_partition_invariant(spark):
    base = _run_all(spark, BATTERY)

    orig = catalog.load_table

    def adversarial(s, d, name):
        return orig(s, d, name).repartition(13)

    # plans modules bind load_table (or helpers over it) at import; the
    # single authoritative seam is the catalog module itself plus each
    # module-level alias.
    import gee_datapipeline_spark.plans as plans_pkg

    patched = []
    catalog.load_table = adversarial
    for mod_name in dir(plans_pkg):
        mod = getattr(plans_pkg, mod_name)
        if hasattr(mod, "load_table"):
            patched.append((mod, mod.load_table))
            mod.load_table = adversarial

    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        alt = _run_all(spark, BATTERY)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        catalog.load_table = orig
        for mod, fn in patched:
            mod.load_table = fn

    diffs = {n: (base[n], alt[n]) for n in BATTERY if base[n] != alt[n]}
    assert not diffs, f"partitioning changed results: {diffs}"
