"""BPE vocabulary induction (functions.bpe) vs an independent
pure-Python reference: merge sequences must match exactly, including
tie-breaks and greedy non-overlapping merge application."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gee_datapipeline_spark.functions.bpe import learn_bpe, merge_pair


def ref_learn_bpe(word_counts, n_merges, min_count=2):
    """Reference implementation: dict-of-tuples symbol sequences."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        # max count, then lexicographic (left, right)
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _words_df(spark, word_counts):
    return spark.createDataFrame(
        [(w, c) for w, c in word_counts.items()], "word string, count long"
    )


def test_learn_bpe_matches_reference_fixed_corpus(spark):
    wc = {
        "lower": 5, "low": 7, "newest": 6, "widest": 3,
        "newer": 4, "wider": 2, "low_": 1,
    }
    assert learn_bpe(_words_df(spark, wc), 8) == ref_learn_bpe(wc, 8)


def test_merge_pair_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a", "a"],)], "syms array<string>")
    out = df.select(merge_pair(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert out == ["aa", "aa", "a"]


def test_merge_pair_chains_distinct_symbols(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b"],)], "syms array<string>")
    out = df.select(merge_pair(F.col("syms"), "a", "b").alias("m")).first()["m"]
    assert out == ["ab", "ab"]


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=8,
    )
)
def test_learn_bpe_matches_reference_random(spark_global, wc):
    spark = spark_global
    assert learn_bpe(_words_df(spark, wc), 5) == ref_learn_bpe(wc, 5)


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark


def ref_apply(word, merges):
    out = list(word)
    for a, b, _ in merges:
        new = []
        for s in out:
            if new and new[-1] == a and s == b:
                new[-1] = a + b
            else:
                new.append(s)
        out = new
    return out


def test_apply_bpe_matches_reference(spark):
    from gee_datapipeline_spark.functions.bpe import apply_bpe

    wc = {"lower": 5, "low": 7, "newest": 6, "widest": 3, "newer": 4}
    merges = ref_learn_bpe(wc, 6)
    df = _words_df(spark, wc).select("word")
    got = {
        r["word"]: list(r["pieces"])
        for r in apply_bpe(df, merges).collect()
    }
    for w in wc:
        assert got[w] == ref_apply(w, merges), w


def test_chars_empty_string_yields_empty_array(spark):
    """Guard: Spark's sequence(1, 0) is DESCENDING [1, 0], which would
    turn the empty word into a bogus ["", ""] symbol pair."""
    from pyspark.sql import functions as F

    from gee_datapipeline_spark.functions.bpe import chars

    df = spark.createDataFrame([("",), ("ab",), (None,)], "w string")
    got = {r.w: r.c for r in df.select(
        "w", chars(F.col("w")).alias("c")).collect()}
    assert got[""] == []
    assert got["ab"] == ["a", "b"]
    assert got[None] is None
