"""Temporal module: plan-shape assertions (the docstrings' one-shuffle
claims, executed-plan-verified) plus a pandas third engine for the as-of
join and sessionization invariants — independent of both Spark's window
formulation and DuckDB's ASOF JOIN."""

from __future__ import annotations

import re

import pandas as pd

from ocr_suite_spark.queries.temporal import (
    SESSION_GAP_US,
    asof_join_prior_view,
    range_join_nearby,
    rolling_range_1d,
    sessionize_gap,
)

SF = "/root/testdata/sf0.001"


def _exchanges(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)


def test_plan_asof_is_single_user_shuffle(spark):
    """The union+carry-forward as-of needs exactly ONE shuffle (user_id) —
    the whole point of not writing it as a range join."""
    ex = _exchanges(asof_join_prior_view(spark, SF))
    assert len(ex) == 1 and ex[0].startswith("user_id"), ex


def test_plan_sessionize_groupby_reuses_window_partitioning(spark):
    """groupBy(user_id, session_id) must NOT re-shuffle: the window's
    hashpartitioning(user_id) already clusters the finer key."""
    ex = _exchanges(sessionize_gap(spark, SF))
    assert len(ex) == 1 and ex[0].startswith("user_id"), ex


def test_plan_rolling_is_single_user_shuffle(spark):
    ex = _exchanges(rolling_range_1d(spark, SF))
    assert len(ex) == 1 and ex[0].startswith("user_id"), ex


def test_plan_range_join_is_equi_join(spark):
    """The ±W predicate must execute as a bucket EQUI-join — any
    NestedLoop/Cartesian in the plan means the bucketing failed and the
    join is all-pairs-per-user (quadratic at scale)."""
    plan = range_join_nearby(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    ex = _exchanges(range_join_nearby(spark, SF))
    assert all(e.startswith(("user_id", "event_id")) for e in ex), ex


def test_asof_matches_bruteforce(spark):
    """Third engine: per-click brute-force max(view.ts <= click.ts) in
    pandas over the raw parquet."""
    got = asof_join_prior_view(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    views = ev[ev.event_type == "view"]
    clicks = ev[ev.event_type == "click"]
    want = {}
    for r in clicks.itertuples():
        prior = views[(views.user_id == r.user_id) & (views.ts_us <= r.ts_us)]
        want[r.event_id] = (
            None if prior.empty else int(prior.loc[prior.ts_us.idxmax(), "event_id"])
        )
    assert len(got) == len(clicks)
    for r in got.itertuples():
        expect = want[r.event_id]
        actual = None if pd.isna(r.prior_view_id) else int(r.prior_view_id)
        assert actual == expect, (r.event_id, actual, expect)


def test_sessionize_invariants(spark):
    """Partition property: sessions tile each user's events exactly; every
    inter-session gap >= GAP (half-open boundary, matching
    session_window)."""
    sess = sessionize_gap(spark, SF).toPandas()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    assert int(sess.n_events.sum()) == len(ev)
    for uid, g in sess.groupby("user_id"):
        g = g.sort_values("session_id")
        # session ids are 1..k dense per user
        assert list(g.session_id) == list(range(1, len(g) + 1))
        # sessions are disjoint and ordered, separated by > GAP
        prev_end = None
        for r in g.itertuples():
            assert r.start_us <= r.end_us
            if prev_end is not None:
                assert r.start_us - prev_end >= SESSION_GAP_US
            prev_end = r.end_us
        # event count per user matches
        n_user = int((ev.user_id == uid).sum())
        assert int(g.n_events.sum()) == n_user


def test_range_join_counts_match_bruteforce_sample(spark):
    """Spot the bucketized range join against a direct pandas count for
    every anchor (sf0.001 is small enough to brute-force)."""
    from ocr_suite_spark.queries.temporal import NEARBY_US

    got = range_join_nearby(spark, SF).toPandas().set_index("event_id")
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    errors = ev[ev.event_type == "error"]
    assert len(got) == len(errors)
    for r in errors.itertuples():
        n = int(
            (
                (ev.user_id == r.user_id)
                & ((ev.ts_us - r.ts_us).abs() <= NEARBY_US)
                & (ev.event_id != r.event_id)
            ).sum()
        )
        assert int(got.loc[r.event_id, "n_nearby"]) == n, (r.event_id, n)
