"""Lakehouse maintenance queries: MERGE upsert, SCD type-2 history,
time-series gap fill.

The reference only ever overwrites whole tables (SURVEY.md §2.2) and keeps
only latest-state marts; these queries cover the table-maintenance surface
a switching user needs next: applying a change batch (MERGE), keeping
full attribute history (SCD2), and densifying a per-entity daily series
(gap fill + forward fill). All three are single-window / single-join
declarative plans — no iteration, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_nba_dmc_spark.operators.merge import merge_upsert, snapshot_diff
from datalake_nba_dmc_spark.operators.scd import scd2_from_changes
from datalake_nba_dmc_spark.operators.temporal import gap_fill
from datalake_nba_dmc_spark.sources import TableRegistry
from datalake_nba_dmc_spark.suite import query

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


@query(
    "merge_upsert_orders",
    oracle="""
    WITH target AS (
      SELECT * FROM orders WHERE o_orderkey % 4 <> 0
    ), source AS (
      SELECT o_orderkey, o_custkey, 'U-MERGED' AS o_orderstatus,
             o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                ELSE t.o_custkey END AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderdate
                ELSE t.o_orderdate END AS o_orderdate,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
                ELSE t.o_orderpriority END AS o_orderpriority
    FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on the orders table: a change batch (every
    even orderkey, re-priced and re-statused) upserted into a target
    (three quarters of the table) — matched rows updated, unmatched
    source rows inserted, target-only rows untouched. One full-outer
    shuffle join on the merge key (operators/merge.py); with Delta jars
    the same call-site becomes a transactional file-pruned MERGE."""
    t = TableRegistry(spark, sf_dir)
    orders = t.orders.select(*_ORDER_COLS)
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U-MERGED").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    return merge_upsert(target, source, keys=["o_orderkey"])


@query(
    "scd2_user_event_history",
    oracle="""
    SELECT user_id, event_type, value, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST, event_id ASC)
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 build over the events stream: each event opens a version
    of the user's (event_type, value) state valid until the next event;
    the last per user is current. One window shuffle on user_id
    (operators/scd.py), event_id as the same-instant tiebreaker."""
    events = TableRegistry(spark, sf_dir).events
    return scd2_from_changes(
        events,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type", "value"],
        tiebreak_cols=["event_id"],
    )


@query(
    "gapfill_user_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
               AS day_value,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ), spans AS (
      SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM daily GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM spans
    ), joined AS (
      SELECT g.user_id, g.day, d.day_value, d.n_events,
             CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END AS is_observed
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT user_id, day,
           carried.v AS day_value, carried.n AS n_events, is_observed
    FROM (
      SELECT user_id, day, is_observed,
             -- carry the last OBSERVED ROW as a struct (row-granularity
             -- LOCF, matching gap_fill's last(_obs struct)): an observed
             -- day whose only value is NULL stays NULL instead of being
             -- back-filled field-by-field
             LAST_VALUE(CASE WHEN is_observed = 1
                             THEN struct_pack(v := day_value, n := n_events)
                        END IGNORE NULLS) OVER w AS carried
      FROM joined
      WINDOW w AS (PARTITION BY user_id ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    """,
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity series densified to a continuous calendar
    (missing days forward-filled from the last active day, flagged
    is_observed=0). Grid built per key via sequence()+explode — bounded by
    each user's own span, no global-calendar cross join
    (operators/temporal.py gap_fill). Cent-exact value sums."""
    events = TableRegistry(spark, sf_dir).events
    daily = events.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("day_value"),
        F.count("*").alias("n_events"),
    )
    return gap_fill(
        daily,
        key_cols=["user_id"],
        bucket_col="day",
        value_cols=["day_value", "n_events"],
        step="interval 1 day",
        forward_fill=True,
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey % 5 <> 0
    ), new AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                THEN 'update' END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE CASE WHEN n.o_orderkey IS NULL THEN 'delete'
               WHEN o.o_orderkey IS NULL THEN 'insert'
               WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                 OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
               THEN 'update' END IS NOT NULL
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two snapshots of orders (one with keys
    %5 removed, one with keys %7 removed and every third price bumped):
    emits (key, insert|delete|update), suppressing identical rows. One
    full-outer join + one null-safe struct compare
    (operators/merge.snapshot_diff) — the batch equivalent of a Delta CDF
    read, and the input generator for merge_upsert."""
    t = TableRegistry(spark, sf_dir)
    base = t.orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    old = base.filter(F.col("o_orderkey") % 5 != 0)
    new = t.orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


@query(
    "lakehouse_version_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 != 0
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 != 0
    )
    SELECT o_orderkey, change_type FROM (
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN b.o_orderkey IS NULL THEN 'delete'
                  WHEN a.o_orderkey IS NULL THEN 'insert'
                  WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                       THEN 'update' END AS change_type
      FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
    WHERE change_type IS NOT NULL
    """,
)
def lakehouse_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two COMMITTED table versions: two snapshots go
    through sinks.versioned_write (overlapping subsets with some rows
    doubled — inserts, deletes, AND updates all present), then
    operators/merge.snapshot_diff runs over two time-travel reads — the
    poor-man's Delta CDF: version history from the rename-as-commit
    store, the change feed from one full-outer diff, no table-format
    jars. Every change row is oracle-checked against the same diff
    computed from the source definitions."""
    from datalake_nba_dmc_spark.operators.merge import snapshot_diff
    from datalake_nba_dmc_spark.sinks import versioned_read, versioned_write

    from datalake_nba_dmc_spark.suite.sink_roundtrip import _scratch, _scratch_reset

    root = _scratch(sf_dir, "vdiff")
    _scratch_reset(spark, root)

    o = TableRegistry(spark, sf_dir).orders.select("o_orderkey", "o_totalprice")
    v1 = o.filter(F.col("o_orderkey") % 4 != 0)
    v2 = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 2
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    n1 = versioned_write(spark, v1, root)
    n2 = versioned_write(spark, v2, root)
    return snapshot_diff(
        versioned_read(spark, root, version=n1),
        versioned_read(spark, root, version=n2),
        keys=["o_orderkey"],
    )
