"""Semantics tests for the hashed linear quality classifier and the
segmented inverted-index build on crafted inputs, pinned to
INDEPENDENT pure-Python references (the oracle-parity gate covers them
differentially; these explain the behaviors a hash comparison can't).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from gee_datapipeline_spark.plans.search_queries import (
    POSTING_SHARD,
    _inverted_index_postings,
)
from gee_datapipeline_spark.plans.selection_queries import (
    CLF_BIAS,
    CLF_BUCKETS,
    _quality_classifier_score,
    clf_weights_int,
)


def _fake_docs(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def crafted_docs(spark, tmp_path):
    rows = [
        (1, "alpha beta gamma alpha", "en", "s", 0),
        (2, "single", "en", "s", 0),
        (250, "alpha delta", "en", "s", 0),
        (430, "beta beta beta", "en", "s", 0),
    ]
    d = tmp_path / "docs"
    _fake_docs(spark, rows).write.parquet(str(d / "documents.parquet"))
    return rows, str(d)


def _py_tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _py_score(text: str) -> tuple[int, float, bool]:
    """Independent reference: feature hashing + linear scoring in plain
    Python (no Spark, no DuckDB, no shared helpers)."""
    t = _py_tokens(text)
    feats = list(t) + [f"{a}_{b}" for a, b in zip(t, t[1:])]
    w = clf_weights_int()
    s = 0
    for feat in feats:
        bucket = int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % CLF_BUCKETS
        s += w[bucket]
    z = CLF_BIAS + (float(s) / (1000.0 * float(len(feats))))
    score = 1.0 / (1.0 + math.exp(-z))
    return len(feats), score, score >= 0.5


def test_classifier_matches_pure_python(spark, crafted_docs):
    rows, sf_dir = crafted_docs
    got = {
        r["doc_id"]: r
        for r in _quality_classifier_score(spark, sf_dir).collect()
    }
    assert set(got) == {r[0] for r in rows}
    for doc_id, text, *_ in rows:
        n_feats, score, keep = _py_score(text)
        assert got[doc_id]["n_feats"] == n_feats
        assert got[doc_id]["score"] == pytest.approx(score, abs=1e-6)
        assert got[doc_id]["keep"] == keep


def test_classifier_single_token_doc_has_no_bigrams(spark, crafted_docs):
    rows, sf_dir = crafted_docs
    got = {
        r["doc_id"]: r["n_feats"]
        for r in _quality_classifier_score(spark, sf_dir).collect()
    }
    assert got[2] == 1  # "single": one unigram, zero bigrams
    assert got[1] == 7  # 4 unigrams + 3 bigrams


def test_postings_gaps_reconstruct_doc_ids(spark, crafted_docs):
    """Cumulative-summing each segment's d-gaps must reproduce exactly
    the sorted distinct doc ids holding that term in that shard."""
    rows, sf_dir = crafted_docs
    expected: dict[tuple[str, int], set[int]] = {}
    for doc_id, text, *_ in rows:
        for term in set(_py_tokens(text)):
            expected.setdefault(
                (term, doc_id // POSTING_SHARD), set()
            ).add(doc_id)
    out = _inverted_index_postings(spark, sf_dir).collect()
    assert {(r["term"], r["shard"]) for r in out} == set(expected)
    for r in out:
        ids, acc = [], 0
        for g in r["gaps"].split(" "):
            acc += int(g)
            ids.append(acc)
        assert ids == sorted(expected[(r["term"], r["shard"])])
        assert r["df"] == len(ids)
        # d-gap form: first entry absolute, the rest strictly positive
        assert all(int(g) > 0 for g in r["gaps"].split(" ")[1:])


def test_postings_shard_bounds_group_size(spark, crafted_docs):
    rows, sf_dir = crafted_docs
    for r in _inverted_index_postings(spark, sf_dir).collect():
        assert r["df"] <= POSTING_SHARD
        lo = r["shard"] * POSTING_SHARD
        ids, acc = [], 0
        for g in r["gaps"].split(" "):
            acc += int(g)
            ids.append(acc)
        assert all(lo <= i < lo + POSTING_SHARD for i in ids)
