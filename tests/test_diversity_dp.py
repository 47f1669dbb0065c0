"""Independent references for the round-6 late wave: per-document
lexical diversity (unigram entropy / TTR / hapax) and the ε-DP Laplace
noisy-count release.

Both queries already carry full DuckDB oracles (the gate); these tests
pin them to a THIRD implementation — pure Python + hashlib — so a bug
mirrored into the oracle SQL cannot hide, and check the domain
properties (entropy bounds, DP determinism, suppression) that a value
hash alone doesn't express.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb

from conftest import SF_SMOKE

from gee_datapipeline_spark.plans.registry import QUERIES, _load_all

_load_all()

_LEX_Q = 1e9
_LN2 = 0.6931471805599453


def _round6(x: float) -> float:
    return math.floor(x * 1e6 + 0.5) / 1e6


def _py_lexical(text: str) -> tuple[int, int, float, float, float]:
    toks = text.strip().lower().split()
    cnt = Counter(toks)
    n, t = len(toks), len(cnt)
    s = sum(math.floor(c * math.log(c) * _LEX_Q + 0.5) for c in cnt.values())
    h = (math.log(float(n)) - (float(s) / _LEX_Q) / float(n)) / _LN2
    return (
        n,
        t,
        _round6(h),
        _round6(t / n),
        _round6(sum(1 for c in cnt.values() if c == 1) / t),
    )


def test_lexical_diversity_matches_python_reference(spark):
    out = {
        r["doc_id"]: r
        for r in QUERIES["lexical_diversity"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    assert len(out) == len(docs)
    for doc_id, text in docs:
        n, t, h, ttr, hap = _py_lexical(text)
        row = out[doc_id]
        assert row["n_tokens"] == n
        assert row["n_types"] == t
        assert row["entropy_bits"] == h, doc_id
        assert row["ttr"] == ttr
        assert row["hapax_ratio"] == hap


def test_lexical_diversity_bounds(spark):
    for r in QUERIES["lexical_diversity"].spark(spark, SF_SMOKE).collect():
        # H ∈ [0, log2 n_types]; uniform-over-types is the maximum.
        assert -1e-9 <= r["entropy_bits"] <= math.log2(r["n_types"]) + 1e-6
        assert 0.0 < r["ttr"] <= 1.0
        assert 0.0 <= r["hapax_ratio"] <= 1.0


def _py_laplace_noise(lang: str, source: str, eps: float) -> float:
    hx = hashlib.md5(f"{lang}|{source}".encode()).hexdigest()[:15]
    u = (int(hx, 16) + 1) / float((1 << 60) + 1)
    cu = u - 0.5
    mag = max(1.0 - 2.0 * abs(cu), 1e-18)
    sgn = 0.0 if cu == 0 else math.copysign(1.0, cu)
    return (0.0 - 1.0 / eps) * sgn * math.log(mag)


def test_dp_noisy_counts_matches_python_reference(spark):
    true = {
        (lang, src): c
        for lang, src, c in duckdb.sql(
            f"SELECT lang, source, count(*) FROM "
            f"'{SF_SMOKE}/documents.parquet' GROUP BY 1, 2"
        ).fetchall()
    }
    out = QUERIES["dp_noisy_counts"].spark(spark, SF_SMOKE).collect()
    released = set()
    for r in out:
        key = (r["lang"], r["source"])
        released.add(key)
        expect = true[key] + _py_laplace_noise(r["lang"], r["source"], 1.0)
        assert expect >= 10.0  # suppression already applied
        assert r["noisy_count"] == _round6(expect)
        assert r["epsilon"] == 1.0
    # every suppressed cell really was below the threshold
    for key, c in true.items():
        if key not in released:
            assert c + _py_laplace_noise(key[0], key[1], 1.0) < 10.0


def test_dp_noise_is_deterministic_across_runs(spark):
    a = sorted(
        map(tuple, QUERIES["dp_noisy_counts"].spark(spark, SF_SMOKE).collect())
    )
    b = sorted(
        map(tuple, QUERIES["dp_noisy_counts"].spark(spark, SF_SMOKE).collect())
    )
    assert a == b


def test_dp_salt_changes_noise_but_stays_idempotent(spark):
    """A secret salt must change every cell's noise (it is no longer
    recomputable from public keys) while staying idempotent for a
    fixed salt; the unsalted default is bit-identical to the gate
    entry (oracle parity unchanged)."""
    from gee_datapipeline_spark.plans.stats_queries import _dp_noisy_counts

    base = {
        (r.lang, r.source): r.noisy_count
        for r in _dp_noisy_counts(spark, SF_SMOKE).collect()
    }
    gate = {
        (r.lang, r.source): r.noisy_count
        for r in QUERIES["dp_noisy_counts"].spark(spark, SF_SMOKE).collect()
    }
    assert base == gate
    s1 = {
        (r.lang, r.source): r.noisy_count
        for r in _dp_noisy_counts(spark, SF_SMOKE, salt="k1").collect()
    }
    s2 = {
        (r.lang, r.source): r.noisy_count
        for r in _dp_noisy_counts(spark, SF_SMOKE, salt="k1").collect()
    }
    assert s1 == s2
    shared = set(base) & set(s1)
    assert shared and all(base[k] != s1[k] for k in shared)
