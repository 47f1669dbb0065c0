"""Count-Min Sketch properties (functions.sketches): never
underestimates, error bounded by eps*N, and the matrix is a monoid
(sketch(A ∪ B) == merge(sketch(A), sketch(B))) — the property that
makes incremental / distributed maintenance correct by construction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)


def _terms(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], "term string")


def test_cms_never_underestimates_and_bounded(spark):
    # Zipf-ish corpus: term_i appears ~1000/i times.
    rows = []
    for i in range(1, 60):
        rows += [f"term{i}"] * (1000 // i)
    terms = _terms(spark, rows)
    sketch = cms_build(terms)
    exact = terms.groupBy("term").agg(F.count(F.lit(1)).alias("truth"))
    est = cms_estimate(sketch, exact.select("term"))
    joined = {
        r["term"]: (r["truth"], r["cms_estimate"])
        for r in exact.join(est, "term").collect()
    }
    n = len(rows)
    eps = math.e / CMS_WIDTH
    for term, (truth, estimate) in joined.items():
        assert estimate >= truth, f"{term}: CMS must never underestimate"
        # eps*N bound holds per-row with prob 1-1/e; over d=4 rows the
        # min exceeds it with prob ~e^-4 per term — deterministic here
        # because the hash family and corpus are fixed.
        assert estimate - truth <= eps * n, f"{term}: error above eps*N"


def test_cms_matrix_is_monoid(spark):
    a = _terms(spark, [f"w{i % 17}" for i in range(500)])
    b = _terms(spark, [f"w{i % 23}" for i in range(400)])
    merged = (
        cms_build(a).unionAll(cms_build(b))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(a.unionAll(b))
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_cms_matrix_size_bounded(spark):
    terms = _terms(spark, [f"t{i}" for i in range(5000)])
    assert cms_build(terms).count() <= CMS_DEPTH * CMS_WIDTH


def test_cms_estimate_unseen_term_is_zero(spark):
    """A candidate term absent from the sketched corpus must estimate 0
    (missing matrix cells count as zero via the left join), never be
    over-estimated from partial cell matches or silently dropped."""
    from pyspark.sql import functions as F

    from gee_datapipeline_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    docs = spark.createDataFrame(
        [("alpha alpha beta",), ("beta gamma",)], "text string"
    )
    terms = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        )
    )
    sketch = cms_build(terms)
    probes = spark.createDataFrame(
        [("alpha",), ("zzz-never-seen",)], "term string"
    )
    got = {
        r.term: r.cms_estimate
        for r in cms_estimate(sketch, probes).collect()
    }
    assert set(got) == {"alpha", "zzz-never-seen"}
    assert got["alpha"] >= 2  # CMS never under-estimates
    # unseen term: every cell it hashes to is either empty (0) or a
    # collision; with this tiny corpus at CMS width, min must be 0
    assert got["zzz-never-seen"] == 0


# -------------------------------------------------- KMV bottom-k sketch


def test_kmv_exact_when_sketch_not_full(spark, tmp_path):
    """When every source holds fewer than K=16 distinct texts the sketch
    never fills, so KMV must EQUAL the true distinct counts exactly —
    per source, per pairwise union, and per intersection — including
    duplicate texts within a source (content identity, not row count)."""
    import pandas as pd

    from gee_datapipeline_spark.plans.registry import QUERIES, _load_all

    _load_all()
    corpus = {
        "web": ["alpha", "beta", "gamma", "beta", "delta"],  # dup row
        "books": ["gamma", "delta", "epsilon"],
        "code": ["zeta", "alpha", "eta", "theta", "iota", "kappa"],
        "wiki": ["unique-one"],
    }
    rows_pd = [
        {
            "doc_id": f"{s}-{i}",
            "text": t,
            "lang": "en",
            "source": s,
            "n_chars": len(t),
        }
        for s, texts in corpus.items()
        for i, t in enumerate(texts)
    ]
    pd.DataFrame(rows_pd).to_parquet(tmp_path / "documents.parquet")
    rows = QUERIES["kmv_distinct_overlap"].spark(spark, str(tmp_path)).collect()
    truth = {s: set(v) for s, v in corpus.items()}
    n_src = len(truth)
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        ta, tb = truth[r.source_a], truth[r.source_b]
        assert r.est_a == float(len(ta))
        assert r.est_b == float(len(tb))
        assert r.est_union == float(len(ta | tb))
        assert r.est_intersect == float(len(ta & tb))


def test_kmv_estimates_bounded_at_sf001(spark):
    """With full sketches (sf0.01: 25 docs/source > K=16) the estimator
    must land within a loose multiplicative band of the truth — KMV's
    relative error concentrates around 1/sqrt(K-1) ≈ 0.26, so a 2x
    band catches sign/scale bugs without flaking."""
    import duckdb
    from collections import defaultdict

    from conftest import SF_SMOKE
    from gee_datapipeline_spark.plans.registry import QUERIES, _load_all

    _load_all()
    sf = SF_SMOKE.replace("sf0.001", "sf0.01")

    rows = QUERIES["kmv_distinct_overlap"].spark(spark, sf).collect()
    texts = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    by_src = defaultdict(set)
    for src, text in texts:
        by_src[src].add(text)
    for r in rows:
        true_u = len(by_src[r.source_a] | by_src[r.source_b])
        assert 0.5 * true_u <= r.est_union <= 2.0 * true_u
        assert 0.0 <= r.est_jaccard <= 1.0
        assert r.est_intersect >= 0.0
