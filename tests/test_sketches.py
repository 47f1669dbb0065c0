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
