"""Value-column analytics (ops/events.py): planted-data recomputation
of the exact semantics the driver's SQL compare also checks — the
nearest-rank percentile rule (incl. the pinned double-ceil quirk) and
the histogram's last-bin clamp."""

import math

import pandas as pd
import pytest

from searchengine_spark.ops.events import (
    value_histogram,
    value_percentiles,
)


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "event_type", "value"]
    )
    pdf["ts"] = pd.Timestamp(2024, 1, 1)
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_value_percentiles_nearest_rank(spark, tmp_path):
    """p50/p90/p99 = value at rank ceil(p * n) over the (value,
    event_id) total order — the rank recomputed with the SAME IEEE
    double product both engines use (the ::DOUBLE oracle cast pins
    that; a decimal product could pick a different rank whenever
    p * n is integral in decimal but not in binary)."""
    rows = [(i, "a", float(i)) for i in range(1, 21)]      # values 1..20
    rows += [(100 + i, "b", float(i)) for i in range(1, 4)]  # n = 3
    sf = _write_events(spark, tmp_path, rows)

    got = {
        (r["event_type"], r["pct"]): r["value"]
        for r in value_percentiles(spark, sf).collect()
    }

    def nearest(vals, p):
        vals = sorted(vals)
        return vals[math.ceil(p * len(vals)) - 1]   # double product

    a_vals = [float(i) for i in range(1, 21)]
    for pct, p in ((50, 0.5), (90, 0.9), (99, 0.99)):
        assert got[("a", pct)] == nearest(a_vals, p)
        assert got[("b", pct)] == nearest([1.0, 2.0, 3.0], p)
    assert got[("a", 50)] == 10.0 and got[("a", 90)] == 18.0
    assert got[("a", 99)] == 20.0 and got[("b", 50)] == 2.0


def test_value_histogram_edges_and_clamp(spark, tmp_path):
    """Global [min, max] edges shared across types; the max value
    clamps into the last bin; counts and 6dp sums match a recompute."""
    rows = [(1, "a", 0.0), (2, "a", 5.0), (3, "a", 10.0),
            (4, "b", 9.99), (5, "b", 10.0)]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["bin"]): (r["n_events"], r["sum_value"])
        for r in value_histogram(spark, sf).collect()
    }
    # lo=0, hi=10, width=1: value 10.0 -> floor(10)=10 -> clamped to 9
    assert got[("a", 0)] == (1, 0.0)
    assert got[("a", 5)] == (1, 5.0)
    assert got[("a", 9)] == (1, 10.0)
    assert got[("b", 9)] == (2, round(9.99 + 10.0, 6))
    assert len(got) == 4


def _write_user_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    )
    pdf["value"] = 1.0
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_funnel_conversion_strict_order(spark, tmp_path):
    """First-match sequential funnel semantics on planted users: a
    step counts only events STRICTLY after the user's previous-step
    first match (same-timestamp pinned out), and a user whose steps
    occur out of order stops at the last in-order step."""
    T = pd.Timestamp
    rows = [
        # user 1: view < click < purchase — reaches all three
        (1, 1, "view", T("2024-01-01 09:00:00")),
        (2, 1, "click", T("2024-01-01 10:00:00")),
        (3, 1, "purchase", T("2024-01-01 11:00:00")),
        # user 2: click BEFORE first view — stops at step 1
        (4, 2, "click", T("2024-01-01 09:00:00")),
        (5, 2, "view", T("2024-01-01 10:00:00")),
        (6, 2, "purchase", T("2024-01-01 11:00:00")),
        # user 3: click at the SAME instant as view — strict > fails
        (7, 3, "view", T("2024-01-01 09:00:00")),
        (8, 3, "click", T("2024-01-01 09:00:00")),
        # user 4: no view at all — never enters the funnel
        (9, 4, "click", T("2024-01-01 09:00:00")),
        (10, 4, "purchase", T("2024-01-01 10:00:00")),
    ]
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import funnel_conversion

    got = [
        (r["step"], r["event_type"], r["n_users"], r["conv"])
        for r in funnel_conversion(spark, sf).collect()
    ]
    assert got == [
        (1, "view", 3, 1.0),
        (2, "click", 1, round(1 / 3, 6)),
        (3, "purchase", 1, round(1 / 3, 6)),
    ]


def test_retention_cohorts_planted(spark, tmp_path):
    """Retention triangle on planted cohorts: cohort = first-activity
    day, same-day repeat events collapse (distinct (user, day)), days
    beyond RET_MAX_DAYS are excluded, and retention divides by the
    k=0 cohort size."""
    T = pd.Timestamp
    rows = [
        # user 1 (cohort 01-01): active day 0, 1, 3, and day 9 (> max)
        (1, 1, "view", T("2024-01-01 08:00:00")),
        (2, 1, "view", T("2024-01-02 08:00:00")),
        (3, 1, "view", T("2024-01-04 08:00:00")),
        (4, 1, "view", T("2024-01-10 08:00:00")),
        # user 2 (cohort 01-01): two events on day 0 only — collapses
        (5, 2, "click", T("2024-01-01 09:00:00")),
        (6, 2, "view", T("2024-01-01 10:00:00")),
        # user 3 (cohort 01-02): active day 0 and day 2
        (7, 3, "view", T("2024-01-02 09:00:00")),
        (8, 3, "view", T("2024-01-04 09:00:00")),
    ]
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import retention_cohorts

    got = [
        (r["cohort"], r["k"], r["n_active"], r["retention"])
        for r in retention_cohorts(spark, sf).collect()
    ]
    assert got == [
        ("2024-01-01", 0, 2, 1.0),
        ("2024-01-01", 1, 1, 0.5),
        ("2024-01-01", 3, 1, 0.5),
        ("2024-01-02", 0, 1, 1.0),
        ("2024-01-02", 2, 1, 1.0),
    ]


def test_event_transitions_planted(spark, tmp_path):
    """Path matrix on a planted stream: pairs follow the per-user
    (ts, event_id) total order (same-ts ties broken by event_id),
    streams never cross users, and p is row-conditional."""
    T = pd.Timestamp
    rows = [
        # user 1: view -> click -> view   (ordered by ts)
        (1, 1, "view", T("2024-01-01 09:00:00")),
        (2, 1, "click", T("2024-01-01 10:00:00")),
        (3, 1, "view", T("2024-01-01 11:00:00")),
        # user 2: same-ts tie — event_id breaks it: view -> click
        (4, 2, "view", T("2024-01-01 09:00:00")),
        (5, 2, "click", T("2024-01-01 09:00:00")),
        # user 3: single event — no pairs
        (6, 3, "purchase", T("2024-01-01 09:00:00")),
    ]
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import event_transitions

    got = [
        (r["src"], r["dst"], r["n"], r["p"])
        for r in event_transitions(spark, sf).collect()
    ]
    assert got == [
        ("click", "view", 1, 1.0),
        ("view", "click", 2, 1.0),
    ]


def test_props_stats_planted(spark, tmp_path):
    """JSON $.k extraction: missing/malformed props count in n_events
    but not the stats; avg divides the exact integer sum by the
    non-null count."""
    T = pd.Timestamp
    rows = [
        {"event_id": 1, "ts": T("2024-01-01"), "user_id": 1,
         "event_type": "a", "value": 1.0, "props": '{"k": 10}'},
        {"event_id": 2, "ts": T("2024-01-01"), "user_id": 1,
         "event_type": "a", "value": 1.0, "props": '{"k": 25}'},
        {"event_id": 3, "ts": T("2024-01-01"), "user_id": 1,
         "event_type": "a", "value": 1.0, "props": '{"other": 1}'},
        {"event_id": 4, "ts": T("2024-01-01"), "user_id": 1,
         "event_type": "b", "value": 1.0, "props": '{"k": 7}'},
    ]
    sf = str(tmp_path)
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(
        f"{sf}/events.parquet"
    )
    from searchengine_spark.ops.events import props_stats

    got = [
        (r["event_type"], r["n_events"], r["n_with_k"], r["sum_k"],
         r["avg_k"], r["min_k"], r["max_k"])
        for r in props_stats(spark, sf).collect()
    ]
    assert got == [
        ("a", 3, 2, 35, 17.5, 10, 25),
        ("b", 1, 1, 7, 7.0, 7, 7),
    ]


def test_funnel_latency_planted(spark, tmp_path):
    """Time-to-convert: exact microsecond first-to-last durations for
    completing users only, nearest-rank percentiles (ceil(p*n) over
    (delta, user_id))."""
    T = pd.Timestamp
    rows = []
    # users 1..3 convert with deltas 2h, 1h, 3h; user 4 stops at view
    for u, (h1, h3) in enumerate([(9, 11), (9, 10), (9, 12)], start=1):
        rows += [
            (u * 10 + 1, u, "view", T(f"2024-01-01 0{h1}:00:00")),
            (u * 10 + 2, u, "click", T(f"2024-01-01 0{h1}:30:00")),
            (u * 10 + 3, u, "purchase", T(f"2024-01-01 {h3}:00:00")),
        ]
    rows.append((41, 4, "view", T("2024-01-01 09:00:00")))
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import funnel_latency

    got = funnel_latency(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    hours = 3_600_000_000
    # deltas sorted: [1h, 2h, 3h]; p50 -> rank ceil(.5*3)=2 (2h),
    # p90 -> rank ceil(.9*3)=3 (3h)
    assert (r["n_converters"], r["p50_us"], r["p90_us"]) == (
        3, 2 * hours, 3 * hours,
    )


def test_asof_attribution_planted(spark, tmp_path):
    """As-of last-touch attribution on planted streams: INCLUSIVE
    same-microsecond match, max-event_id tie-break among equal-ts
    clicks, later clicks never match, and unmatched purchases encode
    (click_id 0, lag_us -1)."""
    T = pd.Timestamp
    rows = [
        # user 1: two clicks before, one after — latest prior wins
        (1, 1, "click", T("2024-01-01 09:00:00")),
        (2, 1, "click", T("2024-01-01 10:00:00")),
        (3, 1, "purchase", T("2024-01-01 11:00:00")),
        (4, 1, "click", T("2024-01-01 12:00:00")),      # after: ignored
        # user 2: click at the SAME instant — inclusive <= matches;
        # two equal-ts clicks -> max event_id wins
        (5, 2, "click", T("2024-01-01 09:00:00")),
        (6, 2, "click", T("2024-01-01 09:00:00")),
        (7, 2, "purchase", T("2024-01-01 09:00:00")),
        # user 3: purchase with no click at all — unmatched encoding
        (8, 3, "purchase", T("2024-01-01 09:00:00")),
        # user 4: only a view (filtered out) then purchase
        (9, 4, "view", T("2024-01-01 08:00:00")),
        (10, 4, "purchase", T("2024-01-01 09:00:00")),
        # user 5: second purchase re-attributes to the same click
        (11, 5, "click", T("2024-01-01 09:00:00")),
        (12, 5, "purchase", T("2024-01-01 10:00:00")),
        (13, 5, "purchase", T("2024-01-01 11:00:00")),
    ]
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import asof_attribution

    got = [
        (r["event_id"], r["user_id"], r["click_id"], r["lag_us"])
        for r in asof_attribution(spark, sf).collect()
    ]
    hour = 3_600_000_000
    assert got == [
        (3, 1, 2, hour),
        (7, 2, 6, 0),
        (8, 3, 0, -1),
        (10, 4, 0, -1),
        (12, 5, 11, hour),
        (13, 5, 11, 2 * hour),
    ]


def test_burst_pairs_planted(spark, tmp_path):
    """Bucketed range self-join semantics: strict lower / inclusive
    upper bound, same-instant pairs excluded, a pair straddling a
    bucket boundary is still found (the explode's +1 tag), and each
    pair counts exactly once."""
    T = pd.Timestamp
    rows = [
        # type a, gap 60s: ts at 0s, 30s, 90s, 91s
        #  (0,30) d=30 in; (0,90) d=90 out; (0,91) d=91 out
        #  (30,90) d=60 INCLUSIVE in; (30,91) d=61 out; (90,91) d=1 in
        (1, 1, "a", T("2024-01-01 00:00:00")),
        (2, 1, "a", T("2024-01-01 00:00:30")),
        (3, 1, "a", T("2024-01-01 00:01:30")),
        (4, 1, "a", T("2024-01-01 00:01:31")),
        # type b: same-instant pair (excluded) + cross-bucket pair:
        # 00:00:59 (bucket 0) and 00:01:01 (bucket 1), d=2s in
        (5, 2, "b", T("2024-01-01 00:00:59")),
        (6, 2, "b", T("2024-01-01 00:00:59")),
        (7, 2, "b", T("2024-01-01 00:01:01")),
        # type c: lone event — no pairs, no output row
        (8, 3, "c", T("2024-01-01 00:00:00")),
    ]
    sf = _write_user_events(spark, tmp_path, rows)
    from searchengine_spark.ops.events import burst_pairs

    got = [
        (r["event_type"], r["n_pairs"], r["sum_delta_us"])
        for r in burst_pairs(spark, sf, gap_sec=60).collect()
    ]
    s = 1_000_000
    assert got == [
        ("a", 3, (30 + 60 + 1) * s),
        ("b", 2, (2 + 2) * s),
    ]


def test_new_join_ops_plan_shapes(spark):
    """Plan-shape guards for the event-join family: asof_attribution
    is ONE user_id shuffle + window (no join at all — the merge-scan
    kernel); burst_pairs is an equi-join on (type, bucket) — never a
    cartesian/broadcast-nested-loop theta join."""
    from searchengine_spark.ops.events import (
        asof_attribution,
        burst_pairs,
    )

    sf = "/root/testdata/sf0.001"
    asof_plan = (
        asof_attribution(spark, sf)._jdf.queryExecution()
        .toString().lower()
    )
    assert "join" not in asof_plan, "as-of must be the window scan"
    assert "window" in asof_plan

    bp_plan = (
        burst_pairs(spark, sf)._jdf.queryExecution()
        .executedPlan().toString().lower()
    )
    assert "cartesianproduct" not in bp_plan
    assert "broadcastnestedloop" not in bp_plan
