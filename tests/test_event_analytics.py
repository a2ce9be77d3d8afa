"""Tests for operators/events.py — funnel, cohort retention, top paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, event_id long")


def test_event_funnel_strict_ordering(spark):
    from crawler_spark.operators.events import event_funnel

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        # u1 completes all three in order
        (1, "view", "2024-01-01 10:00:00", 1),
        (1, "click", "2024-01-01 10:05:00", 2),
        (1, "buy", "2024-01-01 10:10:00", 3),
        # u2 clicks BEFORE viewing: click must not count
        (2, "click", "2024-01-01 09:00:00", 4),
        (2, "view", "2024-01-01 10:00:00", 5),
        # u3 views only
        (3, "view", "2024-01-01 11:00:00", 6),
        # u4 view and click at the SAME ts: strictness rejects the click
        (4, "view", "2024-01-01 12:00:00", 7),
        (4, "click", "2024-01-01 12:00:00", 8),
    ]
    out = {r["step"]: r for r in
           event_funnel(_ev(spark, rows), ("view", "click", "buy"))
           .collect()}
    assert out["view"]["n_users"] == 4
    assert out["click"]["n_users"] == 1     # only u1
    assert out["buy"]["n_users"] == 1
    assert out["view"]["conv_from_prev"] == 1.0
    assert out["click"]["conv_from_prev"] == 0.25
    assert out["buy"]["conv_from_prev"] == 1.0


def test_cohort_retention_week_offsets(spark):
    from crawler_spark.operators.events import cohort_retention

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (1, "x", "2024-01-01 00:00:00", 1),   # cohort week W
        (1, "x", "2024-01-08 00:00:00", 2),   # W+1
        (2, "x", "2024-01-02 00:00:00", 3),   # same cohort week
        (3, "x", "2024-01-09 00:00:00", 4),   # next cohort
    ]
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(_ev(spark, rows)).collect()}
    weeks = sorted({w for w, _ in out})
    w0 = weeks[0]
    assert out[(w0, 0)] == 2
    assert out[(w0, 1)] == 1
    assert out[(w0 + 1, 0)] == 1
    assert len(weeks) == 2


def test_top_event_paths_counts_and_cut(spark):
    from crawler_spark.operators.events import top_event_paths

    rows = []
    eid = 0
    for u in range(3):                     # 3 users: view>click>buy
        for i, t in enumerate(("view", "click", "buy")):
            eid += 1
            rows.append((u, t, f"2024-01-01 10:0{i}:00", eid))
    eid += 1
    rows.append((9, "view", "2024-01-01 10:00:00", eid))   # too short
    out = top_event_paths(_ev(spark, rows), path_len=3, top_k=5).collect()
    assert out[0]["path"] == "view>click>buy" and out[0]["n"] == 3
    assert all("None" not in r["path"] for r in out)


def test_rate_anomaly_flags_planted_spike(spark):
    from crawler_spark.operators.events import rate_anomaly

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows, eid = [], 0
    # 20 steady hours of 5 events, then one hour with 100
    for h in range(20):
        for i in range(5):
            eid += 1
            rows.append((1, "fetch", f"2024-01-01 {h:02d}:00:{i:02d}", eid))
    for i in range(100):
        eid += 1
        rows.append((1, "fetch", f"2024-01-01 23:{i % 60:02d}:{i // 60:02d}", eid))
    out = rate_anomaly(_ev(spark, rows), z_thresh=3.0).collect()
    spikes = [r for r in out if r["is_anomaly"]]
    assert len(spikes) == 1 and spikes[0]["cnt"] == 100
    assert all(not r["is_anomaly"] for r in out if r["cnt"] == 5)


def test_rate_anomaly_constant_rate_z_zero(spark):
    from crawler_spark.operators.events import rate_anomaly

    rows = [(1, "x", f"2024-01-01 {h:02d}:00:00", h) for h in range(6)]
    out = rate_anomaly(_ev(spark, rows)).collect()
    assert all(r["z"] == 0.0 and not r["is_anomaly"] for r in out)


def test_activity_heatmap_known_cells(spark):
    from crawler_spark.operators.events import activity_heatmap

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # 2024-01-01 is a Monday (dow 0); 2024-01-06 a Saturday (dow 5)
    rows = [
        (1, "x", "2024-01-01 00:30:00", 1),
        (2, "x", "2024-01-01 00:45:00", 2),
        (3, "x", "2024-01-06 23:10:00", 3),
    ]
    out = {(r["dow"], r["hour"]): r["n_events"]
           for r in activity_heatmap(_ev(spark, rows)).collect()}
    assert out[(0, 0)] == 2
    assert out[(5, 23)] == 1
