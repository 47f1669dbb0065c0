"""Semantics tests for the corpus-curation operators (span dedup, Gopher
quality rules, SemDeDup, product quantization) on crafted inputs — the
oracle-parity test covers them differentially; these pin the behaviors a
hash comparison can't explain."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from gee_datapipeline_spark.plans.curation_queries import (
    GOPHER_MIN_WORDS,
    SPAN_K,
    _gopher_quality,
    _span_dedup,
)
from gee_datapipeline_spark.plans.similarity_queries import (
    PQ_K,
    PQ_M,
    SEM_C,
    _pq_codes,
    _semantic_dedup,
)

from conftest import SF_SMOKE


def _fake_docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture()
def crafted_docs(spark, tmp_path, monkeypatch):
    """Route load_table('documents') at a crafted corpus on parquet."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # SPAN_K tokens
    rows = [
        (1, f"{shared} unique1 tail1 one", "en", "s", 0),
        (2, f"{shared} unique2 tail2 two", "en", "s", 0),
        (3, "completely different words with no overlap at all here", "en", "s", 0),
    ]
    d = tmp_path / "docs"
    _fake_docs(spark, rows).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_span_dedup_flags_shared_window(spark, crafted_docs):
    out = {
        r["doc_id"]: r
        for r in _span_dedup(spark, crafted_docs).collect()
    }
    # docs 1 and 2 share exactly the first SPAN_K-token window
    assert out[1]["n_dup_spans"] == 1 and out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0
    # 11 tokens -> 11 - SPAN_K + 1 windows
    assert out[1]["n_spans"] == 11 - SPAN_K + 1
    assert out[1]["dup_span_frac"] == pytest.approx(1 / (11 - SPAN_K + 1))


def test_span_dedup_short_doc_zero_spans(spark, tmp_path):
    d = tmp_path / "docs"
    _fake_docs(spark, [(1, "too short", "en", "s", 0)]).write.parquet(
        str(d / "documents.parquet")
    )
    [r] = _span_dedup(spark, str(d)).collect()
    assert (r["n_spans"], r["n_dup_spans"], r["dup_span_frac"]) == (0, 0, 0.0)


def test_gopher_rules_boundaries(spark, tmp_path):
    good = " ".join(["the", "and", "word"] * 20)  # 60 words, stopwords, alpha
    short = "the and word"  # fails word count only
    numeric = " ".join(["the", "and"] + ["123"] * 58)  # alpha frac 2/60
    d = tmp_path / "docs"
    _fake_docs(
        spark,
        [(1, good, "en", "s", 0), (2, short, "en", "s", 0), (3, numeric, "en", "s", 0)],
    ).write.parquet(str(d / "documents.parquet"))
    out = {r["doc_id"]: r for r in _gopher_quality(spark, str(d)).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["pass_word_count"] is False
    assert out[2]["pass_stopwords"] is True  # 'the','and' both present
    assert out[3]["pass_alpha_frac"] is False
    assert out[2]["n_words"] < GOPHER_MIN_WORDS <= out[1]["n_words"]


def test_semantic_dedup_keeper_invariants(spark):
    out = _semantic_dedup(spark, SF_SMOKE).collect()
    by_id = {r["vec_id"]: r for r in out}
    # centroid seeds assign to themselves with cosine 1
    for c in range(SEM_C):
        assert by_id[c]["cluster_id"] == c
        assert by_id[c]["centroid_cos"] == pytest.approx(1.0)
        assert by_id[c]["keep"] is True  # no smaller-id neighbor exists
    # every cluster retains at least one vector
    kept_clusters = {r["cluster_id"] for r in out if r["keep"]}
    assert kept_clusters == {r["cluster_id"] for r in out}


def test_pq_codes_shape_and_determinism(spark):
    out1 = {r["vec_id"]: r for r in _pq_codes(spark, SF_SMOKE).collect()}
    out2 = {r["vec_id"]: r for r in _pq_codes(spark, SF_SMOKE).collect()}
    assert out1.keys() == out2.keys()
    for vid, r in out1.items():
        codes = [int(c) for c in r["pq_code"].split("-")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes)
        assert r["quant_err"] >= 0.0
        assert out2[vid]["pq_code"] == r["pq_code"]
        assert out2[vid]["quant_err"] == r["quant_err"]
    # codebook seeds reconstruct themselves exactly: code m == own id, err 0
    for vid in range(PQ_K):
        assert out1[vid]["quant_err"] == 0.0
        assert out1[vid]["pq_code"] == "-".join([str(vid)] * PQ_M)


# ------------------------------ compression-ratio pinned reference


def test_compression_ratio_matches_pure_python(spark):
    """The rows-only analogue of an oracle: every (doc_id, ratio,
    bucket) at sf0.001 must equal the direct zlib computation — same
    library, but proves the Arrow batching, NULL/empty guards, and
    bucket thresholds introduce no drift."""
    import zlib

    import duckdb

    from gee_datapipeline_spark.plans.curation_queries import (
        compression_ratio_per_doc,
    )

    got = {
        r.doc_id: (r.n_chars, r.compression_ratio, r.bucket)
        for r in compression_ratio_per_doc(spark, SF_SMOKE).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    assert len(got) == len(docs)
    import math

    for doc_id, text in docs:
        n_chars, ratio, bucket = got[doc_id]
        assert n_chars == len(text)
        raw = text.encode("utf-8")
        if not raw:
            assert ratio is None and bucket == "empty"
            continue
        exp = len(zlib.compress(raw, 6)) / len(raw)
        exp_r = math.floor(exp * 10**6 + 0.5) / 10**6
        assert ratio == pytest.approx(exp_r, abs=0)
        exp_bucket = (
            "repetitive"
            if exp < 0.35
            else ("incompressible" if exp > 0.85 else "normal")
        )
        assert bucket == exp_bucket


def test_compression_pinned_oracle_rows():
    """The oracle for ``compression_ratio_quality`` is a pinned literal
    table keyed by corpus signature. Recompute every pin from the
    parquet on disk with the same public zlib; on mismatch the failure
    message prints the fresh rows to paste into ``_COMPRESSION_PINNED``
    (this test IS the regeneration tool)."""
    import collections
    import math
    import zlib

    import duckdb

    from gee_datapipeline_spark.plans.curation_queries import (
        _COMPRESSION_PINNED,
    )

    con = duckdb.connect()
    fresh = []
    for sf in ("0.001", "0.01", "0.1"):
        p = f"/root/testdata/sf{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        sig = con.execute(
            "SELECT md5(string_agg(md5(text), '' ORDER BY doc_id)) "
            f"FROM '{p}'"
        ).fetchone()[0]
        agg = collections.defaultdict(lambda: [0, 0, 0])
        for _, text in con.execute(
            f"SELECT doc_id, text FROM '{p}'"
        ).fetchall():
            raw = text.encode("utf-8")
            if not raw:
                a = agg["empty"]
                a[0] += 1
                a[1] += len(text)
                continue
            x = len(zlib.compress(raw, 6)) / len(raw)
            b = (
                "repetitive"
                if x < 0.35
                else ("incompressible" if x > 0.85 else "normal")
            )
            a = agg[b]
            a[0] += 1
            a[1] += len(text)
            a[2] += math.floor(x * 10**6 + 0.5)
        for b in sorted(agg):
            n, s, m = agg[b]
            fresh.append((sig, b, n, s, m))
    assert set(fresh) <= set(_COMPRESSION_PINNED), (
        "pinned oracle rows are stale; replace _COMPRESSION_PINNED "
        f"with:\n{fresh}"
    )
