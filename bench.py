#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <float>}

Each query is forced end-to-end with the noop sink (full computation,
zero driver-side materialization cost), timed after a session warm-up so
JVM startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gee_datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the catalog: the flagship aggregate, each join
# family, windows/sessions, and the LLM-pipeline scale paths.
HEADLINE = [
    "pricing_summary",
    "star_join_topk",
    "interval_join_monthly",
    "proximity_pairs",
    "mean_composite",
    "max_composite",
    "minmax_normalize",
    "topk_per_group",
    "grid_resample",
    "rollup_report",
    "session_windows",
    "date_spine_gaps",
    "dedup_exact",
    "text_quality",
    "lang_id_heuristic",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "embedding_centroids",
    "geo_flagship_v1",
    "geo_proximity_amenities",
    "selective_revenue",
    "regional_revenue",
    "cube_report",
    "grouping_sets_report",
    "conditional_agg",
    "above_nation_avg",
    "ntile_quartiles",
    "moving_average",
    "tfidf_top_terms",
    "ngram_jaccard_pairs",
    "multimodal_image_features",
]


def parse_sf(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = get_spark("bench", extra_conf={
        "spark.ui.showConsoleProgress": "false",
    })
    from gee_datapipeline_spark.plans import queries

    qs = queries()
    # Warm up the JVM + parquet footers outside the timed region.
    qs["collection_size"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": parse_sf(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
