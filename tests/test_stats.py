"""Invariant and pure-Python-reference tests for the stats/linkage and
graph-completion families (revenue trend, rolling z-score, k-anonymity,
fuzzy pairs, OHLC cascade, basket lift, BFS, k-core, phrase search).

The oracle gate proves Spark == DuckDB; these prove both engines aren't
sharing a mistaken shape, by checking against independently-coded
references and closed-form invariants on the real sf0.001 tables.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from conftest import SF_SMOKE

from gee_datapipeline_spark.plans.registry import _load_all, QUERIES

_load_all()


def _run(spark, name, sf=SF_SMOKE):
    return QUERIES[name].spark(spark, sf).collect()


# ------------------------------------------------------------- trend


def test_trend_slope_matches_numpy_polyfit(spark):
    """Per-nation OLS slope/intercept agrees with numpy's least-squares
    on the same (day, price) points, to within the 6-dp quantization."""
    import numpy as np

    got = {r.n_name: (r.slope, r.intercept) for r in _run(spark, "revenue_trend_slope")}
    pts = duckdb.sql(
        f"""
        SELECT n_name,
               datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS x,
               o_totalprice AS y
        FROM read_parquet('{SF_SMOKE}/orders.parquet') o
        JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
          ON o_custkey = c_custkey
        JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
          ON c_nationkey = n_nationkey
        """
    ).fetchall()
    by_nation = defaultdict(list)
    for n, x, y in pts:
        by_nation[n].append((x, y))
    assert set(got) == set(by_nation)
    for n, xy in by_nation.items():
        xs = np.array([p[0] for p in xy], dtype=float)
        ys = np.array([p[1] for p in xy], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert got[n][0] == pytest.approx(slope, abs=1e-4)
        assert got[n][1] == pytest.approx(intercept, abs=0.02)


# ----------------------------------------------------------- z-score


def test_zscore_flags_match_python_reference(spark):
    """Every flagged event agrees with a sequential pure-Python rolling
    window over the same (ts, event_id) order — and the flagged set is
    exactly the |z|>3 set, not a sample of it."""
    evs = duckdb.sql(
        f"SELECT event_id, event_type, ts, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    by_type = defaultdict(list)
    for eid, et, ts, v in evs:
        by_type[et].append((eid, v))
    expected = {}
    for et, seq in by_type.items():
        for i, (eid, v) in enumerate(seq):
            if i < 20:
                continue
            win = [x[1] for x in seq[i - 20 : i]]
            mean = sum(win) / 20.0
            var = (sum(x * x for x in win) - sum(win) ** 2 / 20.0) / 20.0
            if var <= 0:
                continue
            z = (v - mean) / math.sqrt(var)
            if abs(z) > 3.0:
                expected[eid] = z
    got = {r.event_id: r.zscore for r in _run(spark, "rolling_zscore_anomaly")}
    assert set(got) == set(expected)
    for eid, z in expected.items():
        assert got[eid] == pytest.approx(z, abs=1e-5)


# ------------------------------------------------------- k-anonymity


def test_k_anonymity_groups_are_exactly_the_small_ones(spark):
    rows = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment, "
        f"CAST(floor(c_acctbal / 1000.0) AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/customer.parquet')"
    ).fetchall()
    counts = Counter(rows)
    expected = {g: k for g, k in counts.items() if k < 5}
    got = {
        (r.c_nationkey, r.c_mktsegment, r.bal_band): r.k
        for r in _run(spark, "k_anonymity_audit")
    }
    assert got == expected


# -------------------------------------------------------- OHLC bars


def test_ohlc_daily_bars_invariants_and_reference(spark):
    """low ≤ open/close ≤ high per bar; volumes partition the events;
    open/close equal the sequentially-first/last values of the day."""
    bars = _run(spark, "ohlc_rollup_cascade")
    evs = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    by_day = defaultdict(list)
    for et, day, v in evs:
        by_day[(et, day.isoformat())].append(v)
    assert {(b.event_type, b.day) for b in bars} == set(by_day)
    for b in bars:
        seq = by_day[(b.event_type, b.day)]
        assert b.low <= b.open <= b.high
        assert b.low <= b.close <= b.high
        assert b.volume == len(seq)
        assert b.open == seq[0]
        assert b.close == seq[-1]
        assert b.high == max(seq)
        assert b.low == min(seq)


# ------------------------------------------------------ basket lift


def test_basket_lift_matches_brute_force(spark):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchall()
    baskets = defaultdict(set)
    for o, p in rows:
        baskets[o].add(p)
    item = Counter()
    pair = Counter()
    for ps in baskets.values():
        sps = sorted(ps)
        for p in sps:
            item[p] += 1
        for i, a in enumerate(sps):
            for b in sps[i + 1 :]:
                pair[(a, b)] += 1
    n = len(baskets)
    expected = {k: v for k, v in pair.items() if v >= 3}
    got = {(r.a, r.b): r for r in _run(spark, "basket_lift_pairs")}
    assert set(got) == set(expected)
    for (a, b), s in expected.items():
        r = got[(a, b)]
        assert r.support_ab == s
        assert r.support_a == item[a] and r.support_b == item[b]
        assert r.support_ab <= min(item[a], item[b])
        assert 0 < r.confidence <= 1
        assert r.lift == pytest.approx(s * n / (item[a] * item[b]), abs=1e-5)


# ------------------------------------------------------------- BFS


def _und_edges(sf=SF_SMOKE):
    rows = duckdb.sql(
        f"SELECT DISTINCT l_suppkey * 2, o_custkey * 2 + 1 FROM "
        f"read_parquet('{sf}/lineitem.parquet') li JOIN "
        f"read_parquet('{sf}/orders.parquet') o ON l_orderkey = o_orderkey"
    ).fetchall()
    adj = defaultdict(set)
    for s, d in rows:
        adj[s].add(d)
        adj[d].add(s)
    return adj


def test_bfs_matches_python_bfs(spark):
    adj = _und_edges()
    seeds = [n for n in adj if n <= 4 and n % 2 == 0]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for k in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = k
                    nxt.append(v)
        frontier = nxt
    got = {r.node: r.dist for r in _run(spark, "bfs_reachability")}
    assert got == dist


# ----------------------------------------------------------- k-core


def test_kcore_rounds_contain_true_core(spark):
    """The converged k-core (pure-Python peel to fixpoint) must survive
    all 3 unrolled rounds; and every peeled round only removes nodes."""
    adj = _und_edges()
    K = 30
    # converged core
    deg = {u: len(vs) for u, vs in adj.items()}
    alive = set(adj)
    changed = True
    while changed:
        drop = {u for u in alive if deg[u] < K}
        changed = bool(drop)
        alive -= drop
        for u in drop:
            for v in adj[u]:
                if v in alive:
                    deg[v] -= 1
    got = {r.node: r.degree for r in _run(spark, "kcore_decomposition")}
    assert alive <= set(got)
    for u in alive:
        # residual degree after 3 rounds can only overcount the
        # converged core degree (later rounds remove more neighbors)
        assert got[u] >= sum(1 for v in adj[u] if v in alive)


# ---------------------------------------------------- phrase search


def test_phrase_search_matches_python_scan(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    import re

    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in docs}
    bigram = Counter()
    for ts in toks.values():
        for i in range(len(ts) - 1):
            bigram[(ts[i], ts[i + 1])] += 1
    probes = sorted(bigram.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    expected = Counter()
    for d, ts in toks.items():
        for i in range(len(ts) - 1):
            if (ts[i], ts[i + 1]) in dict(probes):
                expected[(f"{ts[i]} {ts[i+1]}", d)] += 1
    got = {
        (r.phrase, r.doc_id): r.n_occurrences
        for r in _run(spark, "phrase_search")
    }
    assert got == dict(expected)


# ---------------------------------------------------- fuzzy linkage


def test_fuzzy_pairs_symmetric_blocked_and_bounded(spark):
    rows = _run(spark, "fuzzy_name_pairs")
    assert rows, "expected at least one fuzzy candidate pair"
    for r in rows:
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[0] == r.name_b.split(" ")[0]
        assert 1 <= r.edit_dist <= 3


# ------------------------------------------------------ attribution


def test_attribution_matches_python_last_touch(spark):
    """Per-conversion credit agrees with a sequential pure-Python
    last-touch walk, and total conversions partition the purchases."""
    evs = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts, value, "
        f"CAST(json_extract_string(props, '$.k') AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    import datetime

    last_click = {}
    credit = Counter()
    value = defaultdict(float)
    for eid, uid, et, ts, v, k in evs:
        if et == "click":
            # min(campaign) per (user, ts): only relevant on exact-ts
            # ties, which the synthetic data doesn't produce
            last_click[uid] = (ts, f"camp_{k % 5}")
        elif et == "purchase":
            camp = "unattributed"
            if uid in last_click:
                cts, c = last_click[uid]
                if cts >= ts - datetime.timedelta(days=7):
                    camp = c
            credit[camp] += 1
            value[camp] += v
    got = {r.campaign: (r.n_conversions, r.attributed_value) for r in _run(spark, "attribution_last_touch")}
    assert {k: v[0] for k, v in got.items()} == dict(credit)
    for c, (n, av) in got.items():
        assert av == pytest.approx(value[c], abs=0.02)
    n_purchases = sum(1 for e in evs if e[2] == "purchase")
    assert sum(credit.values()) == n_purchases


# ------------------------------------------------------ compaction


def test_compaction_plan_bins_partition_the_listing(spark):
    rows = _run(spark, "compaction_plan")
    listing = duckdb.sql(
        f"SELECT source, count(*), sum(n_chars) FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') GROUP BY 1"
    ).fetchall()
    per_source = defaultdict(lambda: [0, 0])
    for r in rows:
        per_source[r.source][0] += r.n_files
        per_source[r.source][1] += r.bin_bytes
        # every bin except possibly the last is filled past target
        assert r.bin_bytes > 0 and r.n_files > 0
    for source, n, total in listing:
        assert per_source[source][0] == n
        assert per_source[source][1] == total
    # bins are contiguous 0..max per source
    bins = defaultdict(set)
    for r in rows:
        bins[r.source].add(r.bin_id)
    for s, bs in bins.items():
        assert bs == set(range(len(bs)))


# ----------------------------------------------------- seasonality


def test_weekday_seasonality_devs_weighted_zero(spark):
    """Count-weighted seasonal deviations sum to ~0 per stream (the
    defining property of deviation-from-own-mean), and dow covers
    exactly the weekdays present."""
    rows = _run(spark, "weekday_seasonality")
    by_type = defaultdict(list)
    for r in rows:
        assert 0 <= r.dow <= 6
        by_type[r.event_type].append(r)
    for et, rs in by_type.items():
        n = sum(r.n for r in rs)
        wsum = sum(r.seasonal_dev * r.n for r in rs)
        assert abs(wsum / n) < 1e-5


# --------------------------------------------------- snapshot diff


def test_snapshot_diff_partitions_parts_and_delta_consistent(spark):
    """Classes partition the part set of the NEW snapshot; 'added'
    parts contribute their entire new-snapshot quantity to the delta;
    'unchanged' contributes zero."""
    from gee_datapipeline_spark.plans.maintenance_queries import (
        _SNAP_NEW,
        _SNAP_OLD,
    )

    rows = {r.status: r for r in _run(spark, "snapshot_diff")}
    n_parts_new, = duckdb.sql(
        f"SELECT count(DISTINCT l_partkey) FROM "
        f"read_parquet('{SF_SMOKE}/lineitem.parquet') "
        f"WHERE l_shipdate < TIMESTAMP '{_SNAP_NEW}'"
    ).fetchone()
    assert sum(r.n_parts for r in rows.values()) == n_parts_new
    if "unchanged" in rows:
        assert rows["unchanged"].qty_delta == 0.0
    if "added" in rows:
        added_qty, = duckdb.sql(
            f"SELECT round(sum(l_quantity), 2) FROM "
            f"read_parquet('{SF_SMOKE}/lineitem.parquet') l "
            f"WHERE l_shipdate < TIMESTAMP '{_SNAP_NEW}' "
            f"AND NOT EXISTS (SELECT 1 FROM "
            f"read_parquet('{SF_SMOKE}/lineitem.parquet') o "
            f"WHERE o.l_partkey = l.l_partkey "
            f"AND o.l_shipdate < TIMESTAMP '{_SNAP_OLD}')"
        ).fetchone()
        assert rows["added"].qty_delta == pytest.approx(added_qty)


# ------------------------------------------------------ MAD outliers


def test_mad_outliers_matches_numpy_reference(spark):
    """Flagged set agrees with a NumPy median/MAD reference; every
    flagged row clears the K threshold in |robust_z|."""
    import numpy as np

    from gee_datapipeline_spark.plans.stats_queries import _MAD_C, _MAD_K

    rows = _run(spark, "mad_outliers")
    evs = duckdb.sql(
        f"SELECT event_id, event_type, value FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    by_type = defaultdict(list)
    for eid, et, v in evs:
        by_type[et].append((eid, v))
    expect = set()
    for et, pairs in by_type.items():
        vals = np.array([v for _, v in pairs])
        med = np.quantile(vals, 0.5)
        mad = np.quantile(np.abs(vals - med), 0.5)
        for eid, v in pairs:
            if abs(v - med) > _MAD_K * _MAD_C * mad:
                expect.add(eid)
    got = {r.event_id for r in rows}
    assert got == expect
    for r in rows:
        assert abs(r.robust_z) > _MAD_K - 1e-9


# ------------------------------------------------------------- Gini


def test_gini_matches_python_reference_and_bounds(spark):
    """Per-nation Gini equals the pure-Python sorted-rank computation
    and sits in [0, 1)."""
    rows = _run(spark, "gini_concentration")
    per = duckdb.sql(
        f"""
        SELECT n_name, sum(o_totalprice) AS rev
        FROM read_parquet('{SF_SMOKE}/orders.parquet') o
        JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
             ON o_custkey = c_custkey
        JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
             ON c_nationkey = n_nationkey
        GROUP BY n_name, o_custkey
        """
    ).fetchall()
    by_nation = defaultdict(list)
    for n_name, rev in per:
        by_nation[n_name].append(rev)
    for r in rows:
        xs = sorted(by_nation[r.n_name])
        n, s = len(xs), sum(xs)
        si = sum((i + 1) * x for i, x in enumerate(xs))
        expect = (2.0 * si - (n + 1) * s) / (n * s)
        assert r.gini == pytest.approx(expect, abs=2e-6)
        assert 0.0 <= r.gini < 1.0
        assert r.n_customers == n


# -------------------------------------- position-based attribution


def test_attribution_position_matches_python_reference(spark):
    """Fractional credits agree with a sequential pure-Python U-shaped
    walk; per-purchase weights always sum to exactly 1 for attributed
    purchases."""
    import datetime

    evs = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts, value, "
        f"CAST(json_extract_string(props, '$.k') AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') ORDER BY ts, event_id"
    ).fetchall()
    clicks = defaultdict(list)
    for eid, uid, et, ts, v, k in evs:
        if et == "click":
            clicks[uid].append((ts, f"camp_{k % 5}"))
    credit = defaultdict(float)
    value = defaultdict(float)
    for eid, uid, et, ts, v, k in evs:
        if et != "purchase":
            continue
        window = [
            (cts, c)
            for cts, c in clicks[uid]
            if cts <= ts and cts >= ts - datetime.timedelta(days=7)
        ]
        window.sort()
        n = len(window)
        if n == 0:
            continue
        for i, (_, c) in enumerate(window):
            if n == 1:
                w = 1.0
            elif n == 2:
                w = 0.5
            elif i == 0 or i == n - 1:
                w = 0.4
            else:
                w = 0.2 / (n - 2)
            credit[c] += w
            value[c] += w * v
    got = {r.campaign: r for r in _run(spark, "attribution_position")}
    assert set(got) == set(credit)
    for c, r in got.items():
        assert r.credited_conversions == pytest.approx(credit[c], abs=1e-5)
        assert r.credited_value == pytest.approx(value[c], abs=0.02)


# ------------------------------------------------- top session paths


def test_top_paths_counts_and_caps(spark):
    """Paths have at most the cap's segments, counts are positive and
    non-increasing in rank order, and no path count exceeds the total
    session count."""
    from gee_datapipeline_spark.plans.behavior_queries import _PATH_CAP

    rows = _run(spark, "top_paths")
    assert rows
    counts = [r.n_sessions for r in rows]
    assert counts == sorted(counts, reverse=True)
    total_sessions = sum(
        r.n_sessions for r in _run(spark, "session_windows")
    )
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= _PATH_CAP
        assert 0 < r.n_sessions <= total_sessions


# ------------------------------------------- mutual information


def test_lang_source_mi_matches_numpy_and_bounds(spark):
    """MI equals the NumPy contingency computation; information
    inequalities hold: 0 <= MI <= min(H_lang, H_source)."""
    import numpy as np

    row = _run(spark, "lang_source_mi")[0]
    pairs = duckdb.sql(
        f"SELECT lang, source, count(*) FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    langs = sorted({l for l, _, _ in pairs})
    srcs = sorted({s for _, s, _ in pairs})
    m = np.zeros((len(langs), len(srcs)))
    for l, s, c in pairs:
        m[langs.index(l), srcs.index(s)] = c
    p = m / m.sum()
    pl, ps = p.sum(axis=1), p.sum(axis=0)
    nz = p > 0
    mi = (p[nz] * np.log(p[nz] / np.outer(pl, ps)[nz])).sum()
    h_l = -(pl[pl > 0] * np.log(pl[pl > 0])).sum()
    h_s = -(ps[ps > 0] * np.log(ps[ps > 0])).sum()
    assert row.mi == pytest.approx(mi, abs=2e-6)
    assert row.h_lang == pytest.approx(h_l, abs=2e-6)
    assert row.h_source == pytest.approx(h_s, abs=2e-6)
    assert -1e-9 <= row.mi <= min(row.h_lang, row.h_source) + 1e-9
    assert row.n_docs == int(m.sum())


# -------------------------------------------------- audience overlap


def test_audience_overlap_sparse_synthetic(spark, tmp_path_factory):
    """On a hand-built sparse dataset the bitmask fold must reproduce
    the brute-force pairwise intersections exactly (the real testdata
    is degenerate — every user does every type — so this exercises
    partial overlaps, absent pairs, and the n_both>0 filter)."""
    import itertools

    from gee_datapipeline_spark.plans.registry import QUERIES

    users = {
        1: {"click", "view"},
        2: {"click"},
        3: {"view", "purchase"},
        4: {"click", "view", "purchase"},
        5: {"signup"},
        6: {"signup", "click"},
    }
    rows = []
    i = 0
    for u, types in users.items():
        for t in sorted(types):
            rows.append((i, u, t, "2024-01-01 00:%02d:00" % i, 1.0, "{}"))
            i += 1
    d = str(tmp_path_factory.mktemp("ov"))
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts string, value double, props string"
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "CAST(ts AS TIMESTAMP) AS ts", "value", "props"
    ).write.mode("overwrite").parquet(d + "/events.parquet")
    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["audience_overlap"].spark(spark, d).collect()
    }
    marg = Counter()
    both = Counter()
    for types in users.values():
        for t in types:
            marg[t] += 1
        for a, b in itertools.combinations(sorted(types), 2):
            both[(a, b)] += 1
    assert set(got) == {k for k, v in both.items() if v > 0}
    for (a, b), n in both.items():
        r = got[(a, b)]
        assert r.n_both == n and r.n_a == marg[a] and r.n_b == marg[b]
        assert r.jaccard == pytest.approx(
            n / (marg[a] + marg[b] - n), abs=1e-6
        )


# ------------------------------------------------ A/B significance


def test_ab_test_zscores_matches_python_reference(spark):
    """z statistics agree with an independent pure-Python two-proportion
    computation; the pair grid is complete and antisymmetric-consistent
    (z(a,b) computed from the same rates the row reports)."""
    evs = duckdb.sql(
        f"SELECT user_id, event_type, ts, "
        f"CAST(json_extract_string(props, '$.k') AS BIGINT) FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    exposure = {}
    last_purchase = {}
    for uid, et, ts, k in evs:
        if et == "click":
            c = f"camp_{k % 5}"
            key = (c, uid)
            if key not in exposure or ts < exposure[key]:
                exposure[key] = ts
        elif et == "purchase":
            if uid not in last_purchase or ts > last_purchase[uid]:
                last_purchase[uid] = ts
    n = Counter()
    x = Counter()
    for (c, uid), ets in exposure.items():
        n[c] += 1
        if uid in last_purchase and last_purchase[uid] > ets:
            x[c] += 1
    rows = _run(spark, "ab_test_zscores")
    camps = sorted(n)
    assert {(r.camp_a, r.camp_b) for r in rows} == {
        (a, b) for i, a in enumerate(camps) for b in camps[i + 1 :]
    }
    for r in rows:
        pa, pb = x[r.camp_a] / n[r.camp_a], x[r.camp_b] / n[r.camp_b]
        pool = (x[r.camp_a] + x[r.camp_b]) / (n[r.camp_a] + n[r.camp_b])
        se = math.sqrt(
            pool * (1 - pool) * (1 / n[r.camp_a] + 1 / n[r.camp_b])
        )
        z = (pa - pb) / se if se > 0 else 0.0
        assert r.n_a == n[r.camp_a] and r.n_b == n[r.camp_b]
        assert r.rate_a == pytest.approx(pa, abs=1e-6)
        assert r.rate_b == pytest.approx(pb, abs=1e-6)
        assert r.zscore == pytest.approx(z, abs=1e-5)
        assert r.significant == (abs(z) > 1.959963984540054)


# --------------------------------------------------- Benford screen


def test_benford_screen_consistency(spark):
    """Digits cover 1..9; observed shares and Benford expectations both
    sum to 1; chi2_total equals the sum of per-digit terms; the
    histogram partitions the positive order totals."""
    rows = sorted(_run(spark, "benford_screen"), key=lambda r: r.digit)
    assert [r.digit for r in rows] == list(range(1, 10))
    assert sum(r.p_obs for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.p_exp for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert rows[0].chi2_total == pytest.approx(
        sum(r.chi2_term for r in rows), abs=len(rows) * 1e-4
    )
    n_pos, = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/orders.parquet') "
        f"WHERE o_totalprice > 0"
    ).fetchone()
    assert sum(r.n for r in rows) == n_pos
    for r in rows:
        expect = math.log10(1.0 + 1.0 / r.digit)
        assert r.p_exp == pytest.approx(expect, abs=1e-6)


# ------------------------------------------- cumulative unique users


def test_cumulative_unique_users_monotone_and_reference(spark):
    """Curve is non-decreasing, new_users partition the user set, the
    final value equals the total distinct user count, and each day's
    cumulative equals the brute-force distinct-so-far count."""
    rows = sorted(_run(spark, "cumulative_unique_users"),
                  key=lambda r: r.day)
    evs = duckdb.sql(
        f"SELECT CAST(ts AS DATE), user_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    seen_by_day = defaultdict(set)
    for d, u in evs:
        seen_by_day[d.isoformat()].add(u)
    days = sorted(seen_by_day)
    assert [r.day for r in rows] == days
    seen = set()
    prev = 0
    for r in rows:
        seen |= seen_by_day[r.day]
        assert r.cumulative_users == len(seen)
        assert r.cumulative_users >= prev
        assert r.cumulative_users - prev == r.new_users
        prev = r.cumulative_users
    assert sum(r.new_users for r in rows) == len(seen)


# ------------------------------------------- multivariate OLS (normal eq)


def test_linear_model_matches_numpy_lstsq(spark):
    """The one-pass normal-equation fit agrees with numpy's QR-based
    least squares on the same design matrix, to within quantization."""
    import numpy as np

    row = _run(spark, "linear_model_normal_eq")[0]
    data = duckdb.sql(
        f"""
        SELECT l_quantity, l_discount, l_extendedprice
        FROM read_parquet('{SF_SMOKE}/lineitem.parquet')
        """
    ).fetchnumpy()
    X = np.column_stack(
        [
            np.ones_like(data["l_quantity"]),
            data["l_quantity"],
            data["l_discount"],
        ]
    )
    y = data["l_extendedprice"]
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n_rows == len(y)
    assert row.intercept == pytest.approx(beta[0], abs=1e-3)
    assert row.coef_quantity == pytest.approx(beta[1], abs=1e-3)
    assert row.coef_discount == pytest.approx(beta[2], abs=1e-3)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert row.r2 == pytest.approx(1.0 - ss_res / ss_tot, abs=1e-4)


def test_linear_model_plan_single_pass(spark):
    """The fit is ONE map-side-combinable aggregate over the fact table:
    exactly one scan of lineitem, no join, no window, partial agg
    present (the 100 TB contract from the docstring)."""
    df = QUERIES["linear_model_normal_eq"].spark(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_linear_model_partition_invariant(spark):
    """DECIMAL(38,0) sufficient statistics are associative: the fit is
    bit-identical under an adversarial repartitioning of the fact table
    (the property that makes the result independent of cluster layout)."""
    from gee_datapipeline_spark.catalog import load_table

    base = QUERIES["linear_model_normal_eq"].spark(spark, SF_SMOKE).collect()

    import gee_datapipeline_spark.plans.stats_queries as sq

    orig = sq.load_table

    def shuffled(s, d, name):
        df = orig(s, d, name)
        return df.repartition(13) if name == "lineitem" else df

    sq.load_table = shuffled
    try:
        alt = QUERIES["linear_model_normal_eq"].spark(spark, SF_SMOKE).collect()
    finally:
        sq.load_table = orig
    assert [tuple(r) for r in base] == [tuple(r) for r in alt]


def test_cusum_drift_detects_level_shift(spark, tmp_path):
    """Hand-built series with a KNOWN change point: 10 days at the
    baseline then 10 days shifted up. With target ~= the grand mean,
    pre-shift days drain the sum to 0 and post-shift days accumulate
    (shift/2 - K) per day — the first alarm lands a computable number
    of days after the change."""
    import datetime as dt
    import math
    import os
    import shutil

    from gee_datapipeline_spark.plans.stats_queries import (
        _CUSUM_H,
        _CUSUM_K,
        _cusum_drift,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    vals = [50.0] * 10 + [70.0] * 10  # +20 shift at day 10
    for i, v in enumerate(vals):
        # two identical events per day -> daily mean == v exactly
        for j in range(2):
            rows.append(
                (i * 2 + j, base + dt.timedelta(days=i, hours=j),
                 1, "shifted", v, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(out, part), str(tmp_path / "events.parquet"))

    got = {r.event_type: r for r in _cusum_drift(spark, str(tmp_path)).collect()}
    r = got["shifted"]
    # pure-Python reference with the same quantization
    target = 60.0  # mean of 10x50 + 10x70
    s, smax, alarms, first = 0.0, 0.0, 0, None
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - (target + _CUSUM_K)))
        smax = max(smax, s)
        if s > _CUSUM_H:
            alarms += 1
            if first is None:
                first = str((base + dt.timedelta(days=i)).date())
    assert r.n_days == 20
    assert r.n_alarms == alarms > 0
    assert r.max_cusum == math.floor(smax * 1e6 + 0.5) / 1e6
    assert r.first_alarm_day == first
    # the alarm must postdate the change point (no false positive in
    # the baseline regime: pre-shift deviations are negative)
    assert first >= str((base + dt.timedelta(days=10)).date())


def test_holt_forecast_converges_on_linear_series(spark, tmp_path):
    """On an exactly linear series x_t = 10 + 2t the Holt trend must
    converge toward the true slope and the one-ahead errors must
    shrink — checked against a pure-Python mirror of the recursion."""
    import datetime as dt
    import math
    import os
    import shutil

    from gee_datapipeline_spark.plans.stats_queries import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        _holt_forecast,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    vals = [10.0 + 2.0 * t for t in range(25)]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "linear", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    part = [f for f in os.listdir(out) if f.endswith(".parquet")][0]
    shutil.move(os.path.join(out, part), str(tmp_path / "events.parquet"))

    r = _holt_forecast(spark, str(tmp_path)).collect()[0]

    l, b, esum = vals[0], 0.0, 0.0
    for x in vals[1:]:
        esum = esum + abs(x - (l + b))
        l_new = _HOLT_ALPHA * x + (1.0 - _HOLT_ALPHA) * (l + b)
        b = _HOLT_BETA * (l_new - l) + (1.0 - _HOLT_BETA) * b
        l = l_new
    q = lambda v: math.floor(v * 1e6 + 0.5) / 1e6
    assert r.n_days == 25
    assert r.level == q(l)
    assert r.trend == q(b)
    assert r.forecast_next == q(l + b)
    assert r.mae == q(esum / 24)
    # convergence: the learned trend is close to the true slope and
    # the next-day forecast is close to the true next value (60)
    assert abs(r.trend - 2.0) < 0.1
    assert abs(r.forecast_next - 60.0) < 0.5
