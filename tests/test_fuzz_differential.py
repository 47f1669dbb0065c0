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

import tempfile

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parity_sweep import value_hash

from gee_datapipeline_spark.plans.registry import QUERIES, _load_all

_load_all()

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
    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/documents.parquet")
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{d}/documents.parquet'"
        )
        for name in names:
            q = QUERIES[name]
            spdf = q.spark(spark, d).toPandas()
            dpdf = con.execute(q.oracle).fetchdf()
            assert len(spdf) == len(dpdf), (name, len(spdf), len(dpdf))
            assert sorted(spdf.columns) == sorted(dpdf.columns), name
            assert value_hash(spdf) == value_hash(dpdf), (
                name,
                spdf.sort_values(spdf.columns.tolist()).head(10),
                dpdf.sort_values(dpdf.columns.tolist()).head(10),
            )
        con.close()


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_fuzz_documents_battery(spark, docs):
    _compare(spark, docs, BATTERY)


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
