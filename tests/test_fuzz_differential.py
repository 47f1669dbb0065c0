"""Hypothesis-driven differential fuzz over the documents-table battery.

The oracle gate runs every query against ONE fixed corpus per scale
factor; corpus-shape edge cases (a doc that is one word repeated, an
all-hapax doc, a single-source corpus, dyadic count ratios that land on
rounding midpoints) can sit outside it forever. This harness generates
small random corpora, writes them as the same parquet layout the
catalog loads, and hash-compares Spark vs DuckDB for a battery of
documents-only queries — the driver's protocol, arbitrary data.

The corpus contract matched here: non-null non-empty text, ≥3 docs,
≥2 distinct tokens overall (degenerate single-token corpora divide by
zero in the Zipf OLS in BOTH engines with different NULL semantics —
a documented precondition, not a silent divergence).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fuzz_common import run_battery

from gee_datapipeline_spark.plans.registry import _load_all

_load_all()

import os as _os

# soak knob: raise for a long exploratory run (examples are drawn
# deterministically, so a bigger budget extends the same sequence)
_FUZZ_EX = int(_os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))

BATTERY = [
    "lexical_diversity",
    "dedup_exact",
    "doc_fingerprint",
    "token_count",
    "text_quality",
    "lang_profile",
    "doc_length_histogram",
    "dp_noisy_counts",
    "zipf_slope",
    "term_keyness",
    "source_token_waterfill",
    "waterfill_apply",
]

VOCAB = [
    "data", "spark", "merge", "join", "row", "key", "batch",
    "the", "a", "of", "x1", "y2", "zz",
]
LANGS = ["en", "de", "fr"]
SRCS = ["web", "books"]


@st.composite
def corpus(draw):
    n = draw(st.integers(3, 30))
    docs = []
    for i in range(n):
        style = draw(st.integers(0, 3))
        if style == 0:
            # one word repeated: entropy 0, TTR 1/n — boundary city
            w = draw(st.sampled_from(VOCAB))
            words = [w] * draw(st.integers(1, 40))
        elif style == 1:
            # all-unique: every word a hapax
            words = draw(
                st.lists(
                    st.sampled_from(VOCAB),
                    min_size=1,
                    max_size=8,
                    unique=True,
                )
            )
        else:
            words = draw(
                st.lists(st.sampled_from(VOCAB), min_size=1, max_size=50)
            )
        text = " ".join(words)
        docs.append(
            (
                i,
                text,
                draw(st.sampled_from(LANGS)),
                draw(st.sampled_from(SRCS)),
                len(text),
            )
        )
    all_words = {w for _, t, *_ in docs for w in t.split()}
    if len(all_words) < 2:
        docs.append((n, "data spark", "en", "web", 10))
    return docs


def _compare(spark, docs, names):
    pdf = pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    # tiny fixed side tables for the two battery members that read them
    # (contamination_scan: nation names as the benchmark set;
    # lm_perplexity_buckets: part as an auxiliary threshold table)
    nation = pd.DataFrame(
        [(i, f"NATION_{i}", i % 5) for i in range(4)],
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).astype({"n_nationkey": "int32", "n_regionkey": "int32"})
    part = pd.DataFrame(
        [
            (i, f"part {i}", "Brand#1", "PROMO", 10 + i, 1000.0 + i)
            for i in range(3)
        ],
        columns=[
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ],
    ).astype({"p_size": "int32"})
    run_battery(
        spark, {"documents": pdf, "nation": nation, "part": part}, names
    )


# The heavy text/dedup/selection family: shingle- and window-based ops
# whose edge cases live BELOW their width constants (a 1-token doc has
# no 3-gram shingles, no winnowing windows, no chunk overlap), plus the
# sampling/packing/split family whose determinism rides md5 uniforms.
BATTERY2 = [
    "minhash_lsh_pairs",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "ngram_jaccard_capped",
    "winnowing_fingerprints",
    "span_dedup",
    "span_dedup_extract",
    "boilerplate_removal",
    "tfidf_top_terms",
    "vocab_top_terms",
    "lang_id_heuristic",
    "gopher_quality",
    "repetition_ratio",
    "contamination_scan",
    "pii_scrub",
    "doc_chunks",
    "bm25_topk",
    "source_kl_divergence",
    "lm_perplexity_buckets",
    "dsir_importance_weights",
    "quality_classifier_score",
    "inverted_index_postings",
    "cms_heavy_hitters",
    "token_weighted_quality",
    "leakage_safe_split",
    "cluster_representative",
    "dedup_clusters",
    "curation_pipeline_e2e",
    "token_budget_head",
    "mixture_sampling",
    "stratified_sample",
    "shard_assignment",
    "sequence_packing",
    "quality_weighted_sample",
    "weighted_sample_wor",
    "score_calibration",
    "lang_source_mi",
    "kmv_distinct_overlap",
    "set_similarity_prefix_join",
    "phrase_search",
    "corpus_checksum",
    "bpe_token_count",
]


@st.composite
def short_corpus(draw):
    """Corpus biased to docs BELOW the text ops' width constants."""
    n = draw(st.integers(3, 20))
    docs = []
    for i in range(n):
        words = draw(
            st.lists(st.sampled_from(VOCAB), min_size=1, max_size=6)
        )
        if draw(st.booleans()) and docs:
            # exact duplicate (dedup/cluster paths)
            _, text, *_ = docs[draw(st.integers(0, len(docs) - 1))]
        else:
            text = " ".join(words)
        docs.append(
            (
                i,
                text,
                draw(st.sampled_from(LANGS)),
                draw(st.sampled_from(SRCS)),
                len(text),
            )
        )
    return docs


@settings(
    max_examples=_FUZZ_EX or 8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_fuzz_documents_battery(spark, docs):
    _compare(spark, docs, BATTERY)


@settings(
    max_examples=_FUZZ_EX or 4,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(short_corpus())
def test_fuzz_documents_battery2_short_docs(spark, docs):
    _compare(spark, docs, BATTERY2)


def test_fuzz_battery_on_boundary_corpus(spark):
    """Deterministic worst-case shapes in one corpus: a single-token
    doc, a doc of one word repeated a power-of-two number of times
    (dyadic TTR/entropy ratios — midpoint rounding), an all-hapax doc,
    and two exact duplicates across sources."""
    docs = [
        (0, "zz", "en", "web", 2),
        (1, " ".join(["key"] * 32), "en", "web", 127),
        (2, "data spark merge join row", "de", "books", 25),
        (3, "the the the a a of", "fr", "web", 18),
        (4, "data spark merge join row", "en", "books", 25),
    ]
    _compare(spark, docs, BATTERY)
