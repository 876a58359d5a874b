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
