"""Unit tests for the round-8 additions: ``span_dedup_extract``
(maximal cross-doc duplicated spans) and ``bootstrap_ci`` (Poisson
bootstrap). The oracle gate proves engine parity; these tests prove the
SEMANTICS against brute-force pure-Python references on hand-built
corpora the synthetic testdata can't shape."""

from __future__ import annotations

import hashlib
import math

import pytest

from conftest import SF_SMOKE

from gee_datapipeline_spark.plans.curation_queries import (
    SPAN_K,
    _span_dedup_extract,
)
from gee_datapipeline_spark.plans.stats_queries import (
    _BOOT_B,
    _DP_DENOM,
    _POIS1_CUM,
    _bootstrap_ci,
)


# ------------------------------------------------- span extraction


def _ref_spans(texts: dict[int, str], k: int) -> set[tuple]:
    """Brute-force maximal duplicated spans: hash every stride-1
    k-token window, find hashes in >1 doc, merge adjacent offsets."""
    wins: dict[int, list[str]] = {}
    for doc_id, text in texts.items():
        toks = text.lower().strip().split()
        wins[doc_id] = [
            " ".join(toks[s : s + k])
            for s in range(len(toks) - k + 1)
        ]
    from collections import defaultdict

    docs_of: dict[str, set[int]] = defaultdict(set)
    for doc_id, ws in wins.items():
        for w in ws:
            docs_of[w].add(doc_id)
    out = set()
    for doc_id, ws in wins.items():
        dup = [s for s, w in enumerate(ws) if len(docs_of[w]) > 1]
        i = 0
        while i < len(dup):
            j = i
            while j + 1 < len(dup) and dup[j + 1] == dup[j] + 1:
                j += 1
            out.add((doc_id, dup[i], dup[j] + k, j - i + 1))
            i = j + 1
    return out


def _mini_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    rows = [
        (i, t, "en", "src", len(t)) for i, t in sorted(texts.items())
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    import os
    import shutil

    part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    shutil.move(
        os.path.join(out, part), str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_span_extract_matches_bruteforce(spark, tmp_path):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    texts = {
        # doc 1 and 2 share the 12-token run embedded at different
        # offsets; doc 3 shares a SECOND, disjoint run with doc 1.
        1: "one two " + base + " three four unique5 unique6 ending tokens here now "
           "red orange yellow green blue indigo violet gray pink black",
        2: "prefix words differ " + base + " suffix words also differ entirely",
        3: "red orange yellow green blue indigo violet gray pink black "
           "and then something else entirely different follows here now ok",
        # doc 4 shares nothing long enough
        4: "completely distinct vocabulary with no overlapping window at all "
           "zeta eta theta iota kappa",
    }
    sf = _mini_docs(spark, tmp_path, texts)
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in _span_dedup_extract(spark, sf).collect()
    }
    assert got == _ref_spans(texts, SPAN_K)
    # doc 1 must carry two DISJOINT maximal spans; doc 4 none
    d1 = sorted(x for x in got if x[0] == 1)
    assert len(d1) == 2 and d1[0][2] <= d1[1][1]
    assert not [x for x in got if x[0] == 4]


def test_span_extract_short_docs_empty(spark, tmp_path):
    texts = {1: "too short", 2: "also too short"}
    sf = _mini_docs(spark, tmp_path, texts)
    assert _span_dedup_extract(spark, sf).count() == 0


def test_span_extract_spans_are_maximal_on_testdata(spark):
    rows = _span_dedup_extract(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r.span_end - r.span_start == r.n_windows + SPAN_K - 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for spans in by_doc.values():
        spans.sort(key=lambda r: r.span_start)
        for a, b in zip(spans, spans[1:]):
            # maximality: islands of duplicated OFFSETS can't touch —
            # b's first offset (b.span_start) must leave a gap of at
            # least one non-duplicated offset after a's last offset
            # (a.span_end - SPAN_K). Spans themselves MAY overlap by
            # up to SPAN_K - 1 tokens.
            assert b.span_start > a.span_end - SPAN_K + 1


# ------------------------------------------------- Poisson bootstrap


def _pois1_ref(u: float) -> int:
    for k, c in enumerate(_POIS1_CUM):
        if u < c:
            return k
    return len(_POIS1_CUM)


def test_pois1_ladder_matches_cdf():
    # the embedded cumulative constants ARE Poisson(1)'s CDF
    for k, c in enumerate(_POIS1_CUM):
        exact = sum(
            math.exp(-1.0) / math.factorial(i) for i in range(k + 1)
        )
        assert abs(c - exact) < 1e-15


def test_bootstrap_weights_match_python_md5(spark):
    # the Spark-side u -> w pipeline equals hashlib + the ladder
    df = spark.createDataFrame(
        [(b, ok, ln) for b in range(4) for ok, ln in [(1, 1), (7, 3)]],
        "b int, l_orderkey long, l_linenumber int",
    )
    from pyspark.sql import functions as F
    from gee_datapipeline_spark.plans.stats_queries import _pois1

    key = F.concat_ws(
        "|", F.lit("boot"), F.col("b"), F.col("l_orderkey"),
        F.col("l_linenumber"),
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_DP_DENOM)
    got = {
        (r.b, r.l_orderkey, r.l_linenumber): r.w
        for r in df.select("*", _pois1(u).alias("w")).collect()
    }
    for (b, ok, ln), w in got.items():
        mh = hashlib.md5(f"boot|{b}|{ok}|{ln}".encode()).hexdigest()
        uu = (int(mh[:15], 16) + 1) / _DP_DENOM
        assert w == _pois1_ref(uu)


def test_bootstrap_ci_shape_and_determinism(spark):
    a = _bootstrap_ci(spark, SF_SMOKE).collect()
    b = _bootstrap_ci(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3  # return flags A/N/R
    for r in a:
        assert r.n_boot == _BOOT_B
        assert r.ci_lo <= r.boot_mean <= r.ci_hi
        # Poisson(1) resampling keeps the replicate means near the
        # plain mean; at sf0.001 group sizes are hundreds+, so the
        # relative CI width is well under 50%
        assert (r.ci_hi - r.ci_lo) / r.boot_mean < 0.5


def test_bootstrap_ci_empty_lineitem(spark, tmp_path):
    li = spark.read.parquet(SF_SMOKE + "/lineitem.parquet").limit(0)
    li.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "li")
    )
    import os
    import shutil

    part = [
        f
        for f in os.listdir(str(tmp_path / "li"))
        if f.endswith(".parquet")
    ][0]
    shutil.move(
        os.path.join(str(tmp_path / "li"), part),
        str(tmp_path / "lineitem.parquet"),
    )
    assert _bootstrap_ci(spark, str(tmp_path)).count() == 0


def test_bootstrap_ci_plan_runs_one_md5_per_row(spark):
    """Pin the perf-critical plan shape (ADVICE r8): the 18x win in
    commit 26103f1 relies on the seeded projection NOT being collapsed
    into the CASE ladder — if a future Spark version starts merging
    the projection (CollapseProject) or CSE-ing into CASE branches,
    md5 would run ~10x per row and the query would silently regress
    from ~2s back to ~49s at sf0.1 with no functional signal. The
    optimized plan must therefore contain exactly ONE md5 call."""
    plan = (
        _bootstrap_ci(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5(") == 1, plan
