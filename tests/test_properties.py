"""Property tests (SURVEY.md §5.3): semantics corners under generated
inputs — normalize guard/range, month-boundary clamping incl. the
December wrap, classification totality, salted-join equivalence."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from gee_datapipeline_spark.operators.classify import BUCKETS, classify_expr
from gee_datapipeline_spark.operators.skew import salted_join
from gee_datapipeline_spark.operators.windows import minmax_normalize

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_normalize_bounded_and_guarded(spark, vals):
    """W1 — normalized values always land in [0, 1] and a constant
    raster yields 0 (the +1e-6 guard, DataDownloader_V1.py:62)."""
    df = spark.createDataFrame([("img", float(v)) for v in vals], ["img", "value"])
    out = [r.norm_value for r in minmax_normalize(df, ["img"]).collect()]
    assert all(0.0 <= v <= 1.0 for v in out)
    if len(set(vals)) == 1:
        assert all(v == 0.0 for v in out)


@settings(**_SETTINGS)
@given(
    year=st.integers(min_value=1995, max_value=2030),
    month=st.integers(min_value=1, max_value=12),
)
def test_month_end_clamping(spark, year, month):
    """F1 — month-end = start + 1 month - 1 day for every month incl.
    December wrap (DataDownloader_V2.py:176-178; SNPP:229-232) and
    February leap years."""
    df = spark.createDataFrame(
        [(datetime.date(year, month, 1),)], ["month_start"]
    ).select(
        F.last_day("month_start").alias("last"),
        F.date_sub(F.add_months("month_start", 1), 1).alias("clamped"),
    )
    r = df.collect()[0]
    assert r.last == r.clamped
    if month == 12:
        assert r.last == datetime.date(year, 12, 31)


@settings(**_SETTINGS)
@given(
    value=st.floats(
        min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
    ),
    std=st.floats(min_value=0.01, max_value=5),
)
def test_classification_total_and_ordered(spark, value, std):
    """F3 — every (value, std) lands in exactly one bucket, and bucket
    order respects the thresholds (DataDownloader_V3.py:62-73)."""
    df = spark.createDataFrame([(float(value), float(std))], ["v", "s"])
    b = df.select(
        classify_expr(F.col("v"), F.col("s")).alias("bucket")
    ).collect()[0].bucket
    assert b in BUCKETS
    if value < std:
        assert b == "below_standard"
    elif value >= 2 * std:
        assert b == "severe"


def test_salted_join_equals_plain_join(spark):
    """Skew salting must not change join semantics."""
    left = spark.createDataFrame(
        [(k, i) for k in ["hot", "cold"] for i in range(50 if k == "hot" else 3)],
        ["key", "lv"],
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("cold", 2.0), ("never", 3.0)], ["key", "rv"]
    )
    plain = {
        (r.key, r.lv, r.rv)
        for r in left.join(right, on=["key"]).collect()
    }
    salted = {
        (r.key, r.lv, r.rv)
        for r in salted_join(left, right, ["key"], n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 53


def test_asof_join_golden(spark):
    """Hand-computed as-of semantics: latest ref at-or-before each probe
    ts per key; NULL when no prior ref; ref AT the probe ts matches."""
    from gee_datapipeline_spark.operators.joins import asof_join

    probe = spark.createDataFrame(
        [("u1", 5, "p_a"), ("u1", 10, "p_b"), ("u1", 20, "p_c"),
         ("u2", 3, "p_d"), ("u3", 9, "p_e")],
        ["k", "ts", "ptag"],
    )
    ref = spark.createDataFrame(
        [("u1", 4, "r_w"), ("u1", 10, "r_x"), ("u1", 15, "r_y"),
         ("u2", 7, "r_z")],
        ["k", "ts", "rtag"],
    )
    got = {
        (r.k, r.ts, r.ptag): (r.rtag_ref, r.ts_ref)
        for r in asof_join(probe, ref, on=["k"], ts="ts").collect()
    }
    assert got == {
        ("u1", 5, "p_a"): ("r_w", 4),      # strictly before
        ("u1", 10, "p_b"): ("r_x", 10),    # tie: ref at probe ts matches
        ("u1", 20, "p_c"): ("r_y", 15),    # latest of several
        ("u2", 3, "p_d"): (None, None),    # ref exists only later
        ("u3", 9, "p_e"): (None, None),    # key has no refs at all
    }


def test_asof_join_null_payload_stays_atomic(spark):
    """The matched reference row is carried as one struct: a NULL payload
    value in the matched row must surface as NULL, not be back-filled
    from an OLDER reference (native ASOF engines return the matched row
    verbatim)."""
    from pyspark.sql import types as T

    from gee_datapipeline_spark.operators.joins import asof_join

    probe = spark.createDataFrame(
        [("u1", 10, "p_a"), ("u1", 30, "p_b")], ["k", "ts", "ptag"]
    )
    ref = spark.createDataFrame(
        [("u1", 5, "r_old"), ("u1", 20, None)],
        T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("ts", T.LongType()),
                T.StructField("rtag", T.StringType()),
            ]
        ),
    )
    got = {
        (r.k, r.ts): (r.ts_ref, r.rtag_ref)
        for r in asof_join(probe, ref, on=["k"], ts="ts").collect()
    }
    assert got == {
        ("u1", 10): (5, "r_old"),
        # matched ref is ts=20 whose payload is genuinely NULL — it must
        # NOT inherit "r_old" from ts=5
        ("u1", 30): (20, None),
    }


# ------------------------------------------------ behavior-query family
#
# The differential gate cannot see bugs where Spark and the oracle share
# a mistaken SQL shape, so the newest shared-shape family (funnel /
# retention / WAU / SCD2) gets pure-Python references and invariant
# checks over generated event logs.

_EVT_BASE = datetime.datetime(2025, 3, 3, 0, 0, 0)  # a Monday


def _queries():
    from gee_datapipeline_spark.plans import QUERIES
    from gee_datapipeline_spark.plans.registry import _load_all

    _load_all()
    return QUERIES


def _write_events(tmpdir, rows):
    """rows: [(user_id, event_type, ts_offset_seconds)] → events.parquet
    shaped like the driver table."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [
                _EVT_BASE + datetime.timedelta(seconds=off)
                for _, _, off in rows
            ],
            "user_id": [u for u, _, _ in rows],
            "event_type": [t for _, t, _ in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{tmpdir}/events.parquet")
    return tmpdir


_EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),
        st.sampled_from(["signup", "click", "purchase", "view"]),
        st.integers(min_value=0, max_value=21 * 86400),
    ),
    min_size=1,
    max_size=60,
)


@settings(**_SETTINGS)
@given(rows=_EVENT_ROWS)
def test_funnel_matches_python_reference(spark, rows, tmp_path_factory):
    """Funnel: stage counts equal an independent sequential-scan
    reference, and are monotone non-increasing."""
    QUERIES = _queries()

    d = _write_events(str(tmp_path_factory.mktemp("ev")), rows)
    got = {
        r.stage: r.users
        for r in QUERIES["funnel_conversion"].spark(spark, d).collect()
    }
    # python reference: min signup, then min click >= t1, then any
    # purchase >= t2 — per user
    users = {u for u, _, _ in rows}
    s1 = s2 = s3 = 0
    for u in users:
        sign = [o for uu, t, o in rows if uu == u and t == "signup"]
        if not sign:
            continue
        s1 += 1
        t1 = min(sign)
        clicks = [o for uu, t, o in rows if uu == u and t == "click"
                  and o >= t1]
        if not clicks:
            continue
        s2 += 1
        t2 = min(clicks)
        if any(o >= t2 for uu, t, o in rows
               if uu == u and t == "purchase"):
            s3 += 1
    assert got.get("1_signup", 0) == s1
    assert got.get("2_click", 0) == s2
    assert got.get("3_purchase", 0) == s3
    assert got.get("1_signup", 0) >= got.get("2_click", 0) >= got.get(
        "3_purchase", 0
    )


@settings(**_SETTINGS)
@given(rows=_EVENT_ROWS)
def test_retention_cohort_invariants(spark, rows, tmp_path_factory):
    """Retention triangle: offset-0 count equals cohort size, offsets
    are non-negative, and no offset exceeds its cohort's size."""
    QUERIES = _queries()

    d = _write_events(str(tmp_path_factory.mktemp("ev")), rows)
    out = QUERIES["retention_cohorts"].spark(spark, d).collect()
    # python cohort sizes: users grouped by Monday of first event
    first = {}
    for u, _, o in rows:
        first[u] = min(first.get(u, o), o)
    cohort_size = {}
    for u, o in first.items():
        day = (_EVT_BASE + datetime.timedelta(seconds=o)).date()
        monday = day - datetime.timedelta(days=day.weekday())
        key = monday.strftime("%Y-%m-%d")
        cohort_size[key] = cohort_size.get(key, 0) + 1
    zero = {r.cohort_week: r.active_users for r in out
            if r.week_offset == 0}
    assert zero == cohort_size
    for r in out:
        assert r.week_offset >= 0
        assert 0 < r.active_users <= cohort_size[r.cohort_week]


@settings(**_SETTINGS)
@given(rows=_EVENT_ROWS)
def test_wau_matches_python_reference(spark, rows, tmp_path_factory):
    """WAU: trailing-7-day distinct users per activity day equals the
    brute-force reference; WAU(d) >= DAU(d) everywhere."""
    QUERIES = _queries()

    d = _write_events(str(tmp_path_factory.mktemp("ev")), rows)
    got = {
        r.window_end: r.wau
        for r in QUERIES["weekly_active_users"].spark(spark, d).collect()
    }
    user_days = {
        (u, (_EVT_BASE + datetime.timedelta(seconds=o)).date())
        for u, _, o in rows
    }
    days = {day for _, day in user_days}
    expect, dau = {}, {}
    for day in days:
        lo = day - datetime.timedelta(days=6)
        expect[day.strftime("%Y-%m-%d")] = len(
            {u for u, dd in user_days if lo <= dd <= day}
        )
        dau[day.strftime("%Y-%m-%d")] = len(
            {u for u, dd in user_days if dd == day}
        )
    assert got == expect
    for k, wau in got.items():
        assert wau >= dau[k]


@settings(**_SETTINGS)
@given(rows=_EVENT_ROWS)
def test_scd2_intervals_contiguous(spark, rows, tmp_path_factory):
    """SCD2: per user, intervals are contiguous and non-overlapping
    (valid_to == next valid_from), exactly one open current row per
    user, and consecutive states always differ."""
    QUERIES = _queries()

    d = _write_events(str(tmp_path_factory.mktemp("ev")), rows)
    out = QUERIES["scd2_user_state"].spark(spark, d).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == {u for u, _, _ in rows}
    for u, recs in by_user.items():
        recs.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in recs) == 1
        assert recs[-1].is_current and recs[-1].valid_to is None
        for a, b in zip(recs, recs[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no overlap
            assert a.state != b.state  # collapsed consecutive repeats


@settings(**_SETTINGS)
@given(rows=_EVENT_ROWS)
def test_concurrency_profile_matches_python_reference(
    spark, rows, tmp_path_factory
):
    """Sweep-line peak concurrency: per start-day max equals an
    independent interval-overlap scan, and 1 <= max_concurrent <=
    n_sessions."""
    QUERIES = _queries()

    d = _write_events(str(tmp_path_factory.mktemp("ev")), rows)
    out = {
        r.day: r
        for r in QUERIES["concurrency_profile"].spark(spark, d).collect()
    }

    # Reference: 30-min-gap sessionization, then per-day brute overlap.
    by_user = {}
    for i, (u, _t, off) in enumerate(rows):
        by_user.setdefault(u, []).append(
            _EVT_BASE + datetime.timedelta(seconds=off)
        )
    sessions = []
    for u, tss in by_user.items():
        tss.sort()
        start = prev = tss[0]
        for ts in tss[1:]:
            if (ts - prev).total_seconds() > 1800:
                sessions.append((start, prev))
                start = ts
            prev = ts
        sessions.append((start, prev))
    by_day = {}
    for s0, s1 in sessions:
        by_day.setdefault(str(s0.date()), []).append((s0, s1))
    for day, ivs in by_day.items():
        # sweep with starts-before-ends at equal instants
        events = [(s, 1) for s, _ in ivs] + [(e, -1) for _, e in ivs]
        events.sort(key=lambda p: (p[0], -p[1]))
        run = mx = 0
        for _, d_ in events:
            run += d_
            mx = max(mx, run)
        r = out[day]
        assert r.n_sessions == len(ivs)
        assert r.max_concurrent == mx
        assert 1 <= r.max_concurrent <= r.n_sessions
    assert set(out) == set(by_day)


def test_source_kl_nonnegative_and_zero_on_self(spark):
    """KL(P||Q) >= 0 always (Gibbs); and a corpus with a single source
    has KL exactly 0 (P == Q)."""
    QUERIES = _queries()

    rows = QUERIES["source_kl_divergence"].spark(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.kl >= 0.0, r

    import pandas as pd

    d = str(
        __import__("tempfile").mkdtemp()
    )
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["alpha beta gamma", "beta gamma delta"],
            "lang": ["en", "en"],
            "source": ["web", "web"],
            "n_chars": [16, 16],
        }
    ).to_parquet(f"{d}/documents.parquet")
    one = QUERIES["source_kl_divergence"].spark(spark, d).collect()
    assert len(one) == 1 and one[0].kl == 0.0


def test_bm25_scores_positive_and_bounded_topk(spark):
    """BM25: exactly TOP_K rows, strictly positive scores, descending
    with the deterministic (score, doc_id) tie-break."""
    QUERIES = _queries()
    rows = QUERIES["bm25_topk"].spark(spark, SF_SMOKE).collect()
    from gee_datapipeline_spark.plans.search_queries import TOP_K

    assert len(rows) == TOP_K
    for r in rows:
        assert r.bm25 > 0
    ordered = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
    assert [r.doc_id for r in rows] == [r.doc_id for r in ordered]


def test_set_similarity_prefix_equals_bruteforce(spark):
    """Prefix filtering (+ the PPJoin length filter) is exact: pairs ==
    the quadratic shingle-set Jaccard baseline at smoke scale."""
    QUERIES = _queries()
    from gee_datapipeline_spark.plans.text_queries import SSJ_T

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in QUERIES["set_similarity_prefix_join"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    sets = {}
    for r in docs:
        t = r.text.lower().strip().split()
        if len(t) >= 3:
            sets[r.doc_id] = {
                " ".join(t[i : i + 3]) for i in range(len(t) - 2)
            }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            j = __import__("math").floor(j * 1e6 + 0.5) / 1e6
            if j >= SSJ_T:
                want[(a, b)] = j
    assert got == want and len(got) > 0


# --------------------------------------------------------------------------
# Data-selection family (plans/selection_queries.py): invariants the
# differential gate can't see if both engines shared a mistaken shape.


def test_lm_perplexity_covers_every_doc_once(spark):
    """Perplexity buckets: one row per document, positive cross-entropy,
    bucket label consistent with the fixed thresholds."""
    QUERIES = _queries()
    from gee_datapipeline_spark.plans.selection_queries import (
        NLL_HEAD,
        NLL_TAIL,
    )

    rows = QUERIES["lm_perplexity_buckets"].spark(spark, SF_SMOKE).collect()
    n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    for r in rows:
        assert r.nll > 0
        want = (
            "head"
            if r.nll < NLL_HEAD
            else ("middle" if r.nll < NLL_TAIL else "tail")
        )
        assert r.bucket == want


def test_lm_perplexity_self_trained_corpus_beats_shuffled_tail(spark):
    """A bigram LM trained on the corpus must assign lower average
    cross-entropy to the corpus overall than the uniform-smoothing
    floor ln((c1+aV)/a) would: sanity that the LM actually learned."""
    import math

    QUERIES = _queries()
    rows = QUERIES["lm_perplexity_buckets"].spark(spark, SF_SMOKE).collect()
    toks = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"))
    )
    v = toks.agg(F.count_distinct("w")).first()[0]
    # Unseen-bigram cost with the corpus's largest left-context count is
    # the worst-case per-bigram nll; the average must sit well below it.
    avg_nll = sum(r.nll for r in rows) / len(rows)
    assert avg_nll < math.log(v)  # far below the uniform ln(V) ceiling


def test_dsir_weights_favor_target_language_docs(spark):
    """DSIR: the mean log importance weight of target-slice (en) docs
    must exceed the mean over non-target docs — the defining property
    of importance resampling toward the target distribution."""
    QUERIES = _queries()
    rows = QUERIES["dsir_importance_weights"].spark(spark, SF_SMOKE).collect()
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    en = [r.log_weight for r in rows if langs[r.doc_id] == "en"]
    other = [r.log_weight for r in rows if langs[r.doc_id] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_hybrid_rrf_score_consistent_with_ranks(spark):
    """RRF: every fused score must equal the closed form from its two
    ranks, and the result must be descending with the deterministic
    tie-break."""
    QUERIES = _queries()
    from gee_datapipeline_spark.plans.selection_queries import (
        RRF_K,
        RRF_TOP,
    )

    rows = QUERIES["hybrid_rrf_topk"].spark(spark, SF_SMOKE).collect()
    assert len(rows) == RRF_TOP
    for r in rows:
        want = 0.0
        if r.lex_rank > 0:
            want += 1.0 / (RRF_K + r.lex_rank)
        if r.vec_rank > 0:
            want += 1.0 / (RRF_K + r.vec_rank)
        import math

        assert math.isclose(r.rrf_score, math.floor(want * 1e6 + 0.5) / 1e6)
        assert r.lex_rank > 0 or r.vec_rank > 0
    ordered = sorted(rows, key=lambda r: (-r.rrf_score, r.doc_id))
    assert [r.doc_id for r in rows] == [r.doc_id for r in ordered]


def test_label_propagation_covers_nodes_and_merges(spark):
    """LPA: one row per graph node, every community id is itself a node
    id, and propagation merged at least some labels (fewer communities
    than nodes)."""
    QUERIES = _queries()
    rows = QUERIES["label_propagation"].spark(spark, SF_SMOKE).collect()
    nodes = {r.node for r in rows}
    comms = {r.community for r in rows}
    assert len(rows) == len(nodes)
    assert comms <= nodes
    assert len(comms) < len(nodes)


def test_weighted_sample_wor_matches_python_aes(spark):
    """The A-ES draw agrees ID-for-ID with an independent pure-Python
    implementation (hashlib md5 + math.log), and shows the defining
    length bias: mean selected weight above the corpus mean."""
    import hashlib
    import math

    import duckdb

    from gee_datapipeline_spark.plans.selection_queries import (
        _WSAMPLE_DENOM,
        _WSAMPLE_K,
    )

    QUERIES = _queries()
    rows = QUERIES["weighted_sample_wor"].spark(spark, SF_SMOKE).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    keyed = []
    for doc_id, n_chars in docs:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        u = (h + 1) / _WSAMPLE_DENOM
        keyed.append((math.log(u) / n_chars, doc_id, n_chars))
    keyed.sort(reverse=True)
    expect = {d for _, d, _ in keyed[:_WSAMPLE_K]}
    assert {r.doc_id for r in rows} == expect
    corpus_mean = sum(n for _, n in docs) / len(docs)
    sel_mean = sum(r.weight for r in rows) / len(rows)
    assert sel_mean > corpus_mean


def test_weighted_sample_wor_plans_take_ordered(spark):
    """Global top-k must be TakeOrderedAndProject, never a total sort."""
    QUERIES = _queries()
    df = QUERIES["weighted_sample_wor"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
