"""Unit tests: cohort retention triangle on hand-computed data."""

from __future__ import annotations

import datetime

import pytest

from datalake_nba_dmc_spark.operators.cohort import cohort_retention


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_weekly_retention_triangle(spark):
    # u1 cohort = week of Jan 1 (Mon); active weeks 0, 1, 3
    # u2 cohort = week of Jan 1; active week 0 only
    # u3 cohort = week of Jan 8; active weeks 0, 1
    events = spark.createDataFrame(
        [
            (1, _ts("2024-01-02 10:00:00")),
            (1, _ts("2024-01-03 11:00:00")),  # same week, must not double-count
            (1, _ts("2024-01-10 09:00:00")),
            (1, _ts("2024-01-22 09:00:00")),
            (2, _ts("2024-01-05 09:00:00")),
            (3, _ts("2024-01-08 09:00:00")),
            (3, _ts("2024-01-15 09:00:00")),
        ],
        ["user_id", "ts"],
    )
    out = {
        (r["cohort"].date().isoformat(), r["period_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_rate"],
        )
        for r in cohort_retention(events, "user_id", "ts", "week").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 2, 0.5)
    assert out[("2024-01-01", 3)] == (1, 2, 0.5)
    assert ("2024-01-01", 2) not in out  # nobody active in week 2
    assert out[("2024-01-08", 0)] == (1, 1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1, 1.0)


def test_monthly_offsets_use_calendar_months(spark):
    events = spark.createDataFrame(
        [(1, _ts("2024-01-31 23:00:00")), (1, _ts("2024-02-01 00:00:00"))],
        ["user_id", "ts"],
    )
    out = {
        r["period_offset"]: r["active_users"]
        for r in cohort_retention(events, "user_id", "ts", "month").collect()
    }
    assert out == {0: 1, 1: 1}


def test_unknown_period_rejected(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], ["u", "t"])
    with pytest.raises(ValueError):
        cohort_retention(df, "u", "t", "quarter")


def test_funnel_steps_strict_ordering(spark):
    import datetime as dt

    from datalake_nba_dmc_spark.operators.cohort import funnel_steps

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1 completes in order
        (1, "view", ts(0)), (1, "click", ts(10)), (1, "purchase", ts(20)),
        # user 2: purchase BEFORE click → step 3 must be null
        (2, "view", ts(0)), (2, "purchase", ts(5)), (2, "click", ts(10)),
        # user 3: click before any view → steps 2,3 null
        (3, "click", ts(0)), (3, "view", ts(5)),
        # user 4: never viewed → absent entirely
        (4, "click", ts(0)), (4, "purchase", ts(1)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user_id: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel_steps(df, ["view", "click", "purchase"]).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (ts(0), ts(10), ts(20))
    assert got[2] == (ts(0), ts(10), None)  # early purchase doesn't count
    assert got[3] == (ts(5), None, None)


def test_last_touch_attribution(spark):
    from datetime import datetime as dt

    from datalake_nba_dmc_spark.operators.cohort import last_touch_attribution

    rows = [
        # user 1: click d1, view d3, purchase d4 -> attributed to the view
        (1, dt(2024, 1, 1), 1, "click", 0.0, None),
        (2, dt(2024, 1, 3), 1, "view", 0.0, None),
        (3, dt(2024, 1, 4), 1, "purchase", 10.0, None),
        # user 2: click 10 days before purchase -> outside the 7-day window
        (4, dt(2024, 1, 1), 2, "click", 0.0, None),
        (5, dt(2024, 1, 11), 2, "purchase", 20.0, None),
        # user 3: purchase with no touch at all
        (6, dt(2024, 1, 5), 3, "purchase", 30.0, None),
        # user 4: touch AFTER the purchase only -> no credit
        (7, dt(2024, 1, 6), 4, "purchase", 40.0, None),
        (8, dt(2024, 1, 7), 4, "click", 0.0, None),
        # user 5: simultaneous click+view at the same ts -> max event_id wins
        (9, dt(2024, 1, 2), 5, "click", 0.0, None),
        (10, dt(2024, 1, 2), 5, "view", 0.0, None),
        (11, dt(2024, 1, 2, 12), 5, "purchase", 50.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    got = {
        r.event_id: r
        for r in last_touch_attribution(
            df, ["click", "view"], "purchase", attribution_window_days=7
        ).collect()
    }
    assert set(got) == {3, 5, 6, 7, 11}
    assert got[3].touch_event_id == 2 and got[3].touch_type == "view"
    assert got[5].touch_event_id is None  # outside window
    assert got[6].touch_event_id is None  # never touched
    assert got[7].touch_event_id is None  # touch after conversion
    assert got[11].touch_event_id == 10 and got[11].touch_type == "view"


def test_transition_counts_basic(spark):
    from datalake_nba_dmc_spark.operators.cohort import transition_counts
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> b ; user 2: b -> a ; user 3 single event (no step)
        (1, t0, 1, "a"), (2, t0 + dt.timedelta(minutes=1), 1, "b"),
        (3, t0 + dt.timedelta(minutes=2), 1, "b"),
        (4, t0, 2, "b"), (5, t0 + dt.timedelta(minutes=5), 2, "a"),
        (6, t0, 3, "c"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        (r["from_type"], r["to_type"]): r["n_steps"]
        for r in transition_counts(df).collect()
    }
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_transition_counts_simultaneous_events_use_tiebreaker(spark):
    from datalake_nba_dmc_spark.operators.cohort import transition_counts
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(10, t0, 1, "x"), (11, t0, 1, "y"), (12, t0, 1, "z")]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {
        (r["from_type"], r["to_type"])
        for r in transition_counts(df).collect()
    }
    # event_id order: x -> y -> z
    assert got == {("x", "y"), ("y", "z")}


def test_transition_counts_ignores_null_types(spark):
    from datalake_nba_dmc_spark.operators.cohort import transition_counts
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "a"),
        (2, t0 + dt.timedelta(minutes=1), 1, None),
        (3, t0 + dt.timedelta(minutes=2), 1, "b"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {
        (r["from_type"], r["to_type"]): r["n_steps"]
        for r in transition_counts(df).collect()
    }
    # the NULL event is skipped entirely: a -> b, never (a -> NULL) steps
    assert got == {("a", "b"): 1}
