"""Temporal operators: as-of join (point-in-time lookup) and range join.

Neither exists in the reference (batch NBA marts need no time-travel), but
they are table-stakes for event/feature pipelines, and naive formulations
(theta-join on ``r.t <= l.t`` + argmax) are quadratic per key. The shapes
here stay linear at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` within the same ``key`` (LEFT ASOF
    JOIN, DuckDB/kdb semantics).

    Implementation is the union-merge shape: tag both sides, union, one
    shuffle+sort per key ordered by (t, side) with right-before-left on
    ties, then ``last(value, ignorenulls)`` over an unbounded-preceding
    frame carries each right value forward to the left rows it governs.
    Cost: ONE exchange + sort over |L|+|R| — no range-explosion, no
    per-key quadratic argmax, skew handled by AQE like any other sort.

    The carried payload is a single STRUCT of all right columns, not one
    ``last(ignorenulls)`` per column: per-column carries would resurrect a
    stale value from an OLDER right row whenever the truly-latest right row
    holds a legitimate NULL (and different columns could then come from
    different right rows). The struct itself is never NULL for right rows,
    so ``last(struct, ignorenulls)`` always pins ALL carried columns to the
    same latest governing right row and real NULLs survive — matching
    DuckDB/kdb ASOF semantics.

    ``right`` must be unique per (key, right_ts); pre-aggregate if not
    (duplicate timestamps would make "the" as-of row ambiguous).

    NULL timestamps: ``right_ts <= left_ts`` is undefined against NULL, so
    NULL-ts right rows can never govern anyone and are dropped up front —
    left unfiltered, they sort NULLS FIRST into the partition head and get
    carried onto NULL-ts left rows, fabricating matches no comparison
    semantics justifies (robustness_audit `nulls` finding). NULL-ts left
    rows then naturally carry NULL (they sort before every real right row).

    The union-merge internals (``_k``, ``_t``, ``_is_left``, ``_rv``,
    ``_cv``) are reserved: a left frame (or ``right_cols``) already
    carrying one would produce a duplicate-column select with a
    confusing ambiguity error deep in the plan, so the collision raises
    the same explicit contract ValueError as the derived operators'
    name guards (r14 ADVICE) — and, because every as-of consumer
    (:func:`asof_join_within`, the trailing-window forms,
    :func:`nearest_value_join`) funnels through here, one guard covers
    them all.
    """
    from pyspark.sql.types import StructField, StructType

    internals = {"_k", "_t", "_is_left", "_rv", "_cv"}
    clash = sorted(internals & (set(left.columns) | set(right_cols)))
    if clash:
        raise ValueError(
            f"asof_join: column(s) {clash} collide with reserved "
            "union-merge internals (_k, _t, _is_left, _rv, _cv); rename "
            "them before the as-of"
        )
    right = right.filter(F.col(right_ts).isNotNull())
    lcols = left.columns
    rstruct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    tagged_l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct_type).alias("_rv"),
    )
    tagged_r = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).cast(left.schema[left_ts].dataType).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_cols]).alias("_rv"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*", F.last("_rv", ignorenulls=True).over(w).alias("_cv")
    )
    return carried.filter(F.col("_is_left") == 1).select(
        *lcols,
        *[F.col("_cv").getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def asof_join_within(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str = "interval 7 days",
    prefix: str = "asof_",
) -> DataFrame:
    """:func:`asof_join` with a MAX-STALENESS tolerance (pandas
    ``merge_asof(tolerance=...)`` / kdb window-join semantics): the
    carried right row only counts if it is no older than ``tolerance``
    before the left timestamp — older matches are nulled out, exactly
    as if no right row governed.

    Correctness rides the as-of invariant: the carried row is THE
    latest right row <= left_ts, so if IT is outside the tolerance,
    every other candidate is older still — one post-filter on the
    carried timestamp is a complete implementation, no second join.
    Cost is therefore identical to :func:`asof_join` (one union-merge
    exchange + sort) plus a map-side conditional; the tolerance never
    touches the shuffle.

    The right timestamp is carried inside the same struct as the
    payload columns (the all-from-one-row rule), compared, then
    dropped; ``right_cols`` must not already contain ``right_ts``,
    and ``left`` must not already contain the prefixed output names
    (``prefix + right_ts`` rides the carry struct too) — the final
    select would silently resolve the wrong column otherwise."""
    if right_ts in right_cols:
        raise ValueError("right_ts is carried implicitly; remove it "
                         "from right_cols")
    reserved = {f"{prefix}{right_ts}", *(f"{prefix}{c}" for c in right_cols)}
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join_within: left already contains reserved output "
            f"column(s) {clash}; rename them or pass a different prefix"
        )
    carried = asof_join(
        left,
        right,
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        right_cols=[right_ts, *right_cols],
        prefix=prefix,
    )
    within = F.col(f"{prefix}{right_ts}") >= (
        F.col(left_ts) - F.expr(tolerance)
    )
    return carried.select(
        *[c for c in left.columns],
        *[
            F.when(within, F.col(f"{prefix}{c}"))
            .alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )


def gap_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_cols: Sequence[str],
    step: str = "interval 1 day",
    forward_fill: bool = True,
) -> DataFrame:
    """Densify a per-key regular time series: emit one row per ``step``
    between each key's first and last bucket, carrying observed values and
    (optionally) forward-filling the gaps.

    ``df`` must be one-row-per-(key, bucket) — i.e. already aggregated to
    the bucket grain (use a groupBy on ``date_trunc`` first). Output adds
    ``is_observed`` (1 for real rows, 0 for generated gap rows).

    Scale shape: the grid is built per key from a one-shuffle min/max agg
    and ``sequence()`` + ``explode`` — grid size is bounded by
    span/step per key, never a cross join against a global calendar; the
    observed values come back via an equi-join on (key, bucket) that
    reuses the agg's hash partitioning; the optional forward fill is one
    window pass per key. Total: two shuffles on the key, both
    AQE-coalesced, all expressions JVM-side."""
    keys = list(key_cols)
    spans = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step))
        ).alias(bucket_col),
    )
    observed = df.select(
        *keys, bucket_col, F.struct(*value_cols).alias("_obs")
    )
    out = grid.join(observed, on=[*keys, bucket_col], how="left").withColumn(
        "is_observed", F.col("_obs").isNotNull().cast("int")
    )
    if forward_fill:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(bucket_col).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.withColumn("_obs", F.last("_obs", ignorenulls=True).over(w))
    return out.select(
        *keys,
        bucket_col,
        *[F.col("_obs").getField(c).alias(c) for c in value_cols],
        "is_observed",
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (left, right) pairs sharing ``key`` whose half-open intervals
    overlap (``l_start < r_end AND r_start < l_end``).

    A raw theta join on the band condition degenerates to per-key
    nested-loop work on hot keys; instead each interval EXPLODES into the
    fixed-width time buckets it covers and the join becomes an equi-join
    on (key, bucket) — overlapping intervals must share a bucket, so the
    bucket join finds every candidate; a distinct + exact band filter
    removes multi-bucket duplicates and same-bucket non-overlaps. Cost is
    O(rows × span/bucket) exploded rows and one hash join: pick
    ``bucket_seconds`` near the typical interval span so the fan-out
    stays small. This is the standard distributed interval-join shape
    (the same bucketize-then-equi-join trick as the LSH families)."""
    ms = 1000 * bucket_seconds

    def buckets(start: str, end: str) -> Column:
        b0 = F.floor(F.unix_millis(F.col(start)) / ms)
        b1 = F.floor((F.unix_millis(F.col(end)) - 1) / ms)
        return F.sequence(b0, F.greatest(b0, b1))

    l = left.select(
        F.col(key).alias("_k"),
        F.struct(*left.columns).alias("_l"),
        F.explode(buckets(left_start, left_end)).alias("_b"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.struct(*right.columns).alias("_r"),
        F.explode(buckets(right_start, right_end)).alias("_b"),
    )
    pairs = l.join(r, on=["_k", "_b"]).drop("_b").distinct()
    overlap = (F.col(f"_l.{left_start}") < F.col(f"_r.{right_end}")) & (
        F.col(f"_r.{right_start}") < F.col(f"_l.{left_end}")
    )
    lcols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    rcols = [
        F.col(f"_r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
    ]
    return pairs.filter(overlap).select(*lcols, *rcols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    point: str,
    range_start: Column,
    range_end: Column,
) -> DataFrame:
    """Join left points into right intervals sharing ``key``:
    ``range_start <= point < range_end``. Catalyst plans the equality on
    ``key`` as the join key and evaluates the band as a post-join filter —
    linear when keys are selective. (For band-only joins with no equi-key,
    bucketize the time axis first so an equi-key exists.)"""
    return left.join(right, on=(left[key] == right[key]) & (left[point] >= range_start) & (left[point] < range_end))


def band_lookup_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bin_width: float = 25_000.0,
) -> DataFrame:
    """Keyless range-containment lookup: each fact row joins the band row
    whose half-open interval ``[lo, hi)`` contains ``value_col`` — the
    price-tier / IP-geolocation / CIDR-table shape, where NO equi-key
    exists and a naive ``BETWEEN`` theta-join compiles to a broadcast
    nested loop that evaluates every band per fact row.

    Bin acceleration: each band EXPLODES into the fixed-width value bins
    it covers, the fact row computes its single bin arithmetically, and
    the join becomes an equi-join on the bin (hash lookup, O(1) per fact
    row) + a residual containment filter. The same bucketize-then-equi
    trick as ``interval_overlap_join``, on the value axis. Pick
    ``bin_width`` near the typical band width so the explode fan-out per
    band stays small; the exploded band table is still tiny and is
    broadcast."""
    overlap = set(fact.columns) & set(bands.columns)
    if overlap:
        raise ValueError(
            f"fact and bands share column names {sorted(overlap)}: rename one"
            " side (the output carries both schemas side by side)"
        )
    if "_bin" in fact.columns or "_bin" in bands.columns:
        raise ValueError("'_bin' is reserved by band_lookup_join")
    exploded = bands.select(
        F.struct(*bands.columns).alias("_band"),
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ).alias("_bin"),
    )
    keyed = fact.withColumn(
        "_bin", F.floor(F.col(value_col) / bin_width).cast("long")
    )
    out = keyed.join(F.broadcast(exploded), "_bin").filter(
        (F.col(value_col) >= F.col(f"_band.{lo_col}"))
        & (F.col(value_col) < F.col(f"_band.{hi_col}"))
    )
    band_cols = [F.col(f"_band.{c}").alias(c) for c in bands.columns]
    return out.select(*[F.col(c) for c in fact.columns], *band_cols)


def nearest_value_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_val: str,
    right_val: str,
    right_cols: Sequence[str],
    prefix: str = "nearest_",
) -> DataFrame:
    """For each left row, the right row (same ``key``) whose ``right_val``
    is CLOSEST to ``left_val`` on the number line — nearest-calibration /
    nearest-tier matching, where as-of's one-sided "latest ≤" is the
    wrong semantics. Ties (exact midpoints) go to the smaller right
    value; left rows with no right rows for their key keep NULLs.
    Sub-ulp nuance (property-tested): when two same-side right values sit
    within one double ulp of equal distance, the as-of construction picks
    the truly nearer one (largest-below / smallest-above), where a naive
    argmin over rounded double distances could pick either.

    Composition, not a new engine primitive: two :func:`asof_join`
    union-merge passes — backward (largest right ≤ left) and forward
    (smallest right ≥ left, which is just as-of on the NEGATED axis) —
    then a per-row pick of the nearer candidate. Cost: two exchanges+
    sorts over |L|+|R|, no range explosion, no per-key quadratic argmin
    (the naive plan is a theta-join + window over |L|·|R| rows)."""
    rcols = list(dict.fromkeys([right_val, *right_cols]))
    lcols = left.columns
    reserved = {"_negl", "_negr"} & (set(lcols) | set(right.columns))
    if reserved:
        raise ValueError(f"{sorted(reserved)} are reserved by nearest_value_join")
    clash = {f"{prefix}{c}" for c in rcols} & set(lcols)
    if clash:
        raise ValueError(
            f"output columns {sorted(clash)} collide with left columns;"
            " pick a different prefix"
        )

    b = asof_join(left, right, key, left_val, right_val, rcols, prefix="_b_")
    ln = b.withColumn("_negl", -F.col(left_val))
    rn = right.withColumn("_negr", -F.col(right_val))
    f = asof_join(ln, rn, key, "_negl", "_negr", rcols, prefix="_f_")

    b_rv, f_rv = F.col(f"_b_{right_val}"), F.col(f"_f_{right_val}")
    take_b = b_rv.isNotNull() & (
        f_rv.isNull()
        | ((F.col(left_val) - b_rv) <= (f_rv - F.col(left_val)))
    )
    chosen = F.when(
        take_b, F.struct(*[F.col(f"_b_{c}").alias(c) for c in rcols])
    ).otherwise(F.struct(*[F.col(f"_f_{c}").alias(c) for c in rcols]))
    return f.select(
        *lcols,
        *[chosen.getField(c).alias(f"{prefix}{c}") for c in rcols],
    )


def _trailing_cum_table(
    right: DataFrame, key: str, right_ts: str, value_col: str, scale: int
) -> DataFrame:
    """The per-(key, ts) running (count, scaled-sum) prefix-sum table
    BOTH trailing-window forms difference — one definition of the NULL
    filtering, the scaled-long rounding, and the cumulative frame, so
    the single- and multi-horizon operators (and the reduction law
    pinning them equal) cannot drift apart. Ties at one timestamp
    pre-aggregate so the as-of right side is unique per (key, ts)."""
    per_ts = (
        right.filter(
            F.col(right_ts).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(key), F.col(right_ts).alias("_rt"))
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.sum(F.round(F.col(value_col) * scale).cast("long")).alias(
                "_s"
            ),
        )
    )
    w_cum = (
        Window.partitionBy(key)
        .orderBy("_rt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_ts.select(
        key,
        "_rt",
        F.sum("_c").over(w_cum).alias("cum_c"),
        F.sum("_s").over(w_cum).alias("cum_s"),
    )


def trailing_window_agg(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    window: str = "interval 1 hour",
    scale: int = 100,
    prefix: str = "win_",
) -> DataFrame:
    """Windowed-join aggregate (kdb ``wj`` / the time-windowed feature
    join every event-driven training pipeline needs): for each left
    row, the COUNT and scaled-long SUM of right rows whose timestamp
    falls in the trailing window ``(left_ts − window, left_ts]`` for
    the same ``key`` — "purchases in the last hour", computed exactly.

    Shape: the classic range join explodes |L|·|R per window| rows and
    a per-left-row window aggregate re-sorts the union per left row.
    This instead DIFFERENCES PREFIX SUMS: right collapses to one row
    per (key, ts) carrying running (count, scaled-sum) per key — the
    per-key cumulative table — and each left row reads the cumulative
    at ``left_ts`` and at ``left_ts − window`` via TWO as-of passes
    (:func:`asof_join`, one union-merge exchange + sort each); the
    trailing-window aggregate is their difference. Cost: two sorts
    over |L|+|R per key| rows, NO range explosion, no per-row window
    re-scan — the same reason HDR/ECDF stats use prefix sums. Ties at
    one timestamp pre-aggregate so the as-of right side is unique per
    (key, ts) as its contract requires.

    Values are scaled to longs (``round(v·scale)``, the suite rule) so
    counts AND sums are exact integers on any engine and partitioning;
    a NULL left timestamp yields (0, 0) — no window, nothing in it.

    ``left`` must not already carry the internal carry/output names
    (``_lo_ts``, the ``_hi_``/``_lo_`` cumulative columns, or the
    ``prefix``ed outputs) — the differencing select would silently
    read the caller's column otherwise, so collisions raise."""
    reserved = {
        "_lo_ts", "_hi_cum_c", "_hi_cum_s", "_lo_cum_c", "_lo_cum_s",
        f"{prefix}count", f"{prefix}sum_scaled",
    }
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"trailing_window_agg: left already contains reserved "
            f"internal/output column(s) {clash}; rename them or pass a "
            f"different prefix"
        )

    cum = _trailing_cum_table(right, key, right_ts, value_col, scale)
    at_ts = asof_join(
        left,
        cum,
        key=key,
        left_ts=left_ts,
        right_ts="_rt",
        right_cols=["cum_c", "cum_s"],
        prefix="_hi_",
    )
    shifted = at_ts.withColumn(
        "_lo_ts", F.col(left_ts) - F.expr(window)
    )
    both = asof_join(
        shifted,
        cum,
        key=key,
        left_ts="_lo_ts",
        right_ts="_rt",
        right_cols=["cum_c", "cum_s"],
        prefix="_lo_",
    )
    cnt = F.coalesce("_hi_cum_c", F.lit(0)) - F.coalesce(
        "_lo_cum_c", F.lit(0)
    )
    ssum = F.coalesce("_hi_cum_s", F.lit(0)) - F.coalesce(
        "_lo_cum_s", F.lit(0)
    )
    return both.select(
        *left.columns,
        cnt.cast("long").alias(f"{prefix}count"),
        ssum.cast("long").alias(f"{prefix}sum_scaled"),
    )


def trailing_window_agg_multi(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    windows: dict[str, str],
    scale: int = 100,
    prefix: str = "win_",
) -> DataFrame:
    """N trailing windows in ONE pass — the multi-horizon feature block
    ("purchases in the last 1h / 24h / 7d") every event-driven feature
    store ships per event. Same prefix-sum differencing as
    :func:`trailing_window_agg`, amortized: the per-key cumulative
    table is built ONCE, the at-``left_ts`` cumulative is read ONCE,
    and each extra window adds exactly one more as-of pass for its
    lower edge — N windows cost N+1 sorts instead of the 2N of N
    separate calls (and instead of the |L|·|window| explosion of N
    range joins). Window edges per horizon: ``(left_ts − w, left_ts]``.

    ``windows`` maps an identifier-safe horizon name to its INTERVAL
    expression (e.g. ``{"1h": "interval 1 hour", "24h": "interval 24
    hours"}``); outputs are ``{prefix}{name}_count`` /
    ``{prefix}{name}_sum_scaled`` per horizon, and a single-entry map
    is bit-identical to :func:`trailing_window_agg` modulo the column
    names (pytest law). Reserved internal/output names are guarded
    against ``left`` collisions like the single-window form."""
    import re as _re

    if not windows:
        raise ValueError("trailing_window_agg_multi: windows is empty")
    for name in windows:
        if not _re.fullmatch(r"[A-Za-z0-9_]+", name):
            raise ValueError(
                f"trailing_window_agg_multi: window name {name!r} must "
                "be identifier-safe ([A-Za-z0-9_]+) — it becomes a "
                "column-name suffix"
            )
    gen: list[str] = ["_hi_cum_c", "_hi_cum_s"]
    for name in windows:
        gen += [
            f"_lo_ts_{name}",
            f"_lo{name}_cum_c",
            f"_lo{name}_cum_s",
            f"{prefix}{name}_count",
            f"{prefix}{name}_sum_scaled",
        ]
    # horizon names must not collide with EACH OTHER's generated
    # internals either (e.g. "_ts_foo" vs "foo_cum_c" both pass the
    # identifier check yet generate the same "_lo_ts_foo_cum_c"
    # string) — a silent withColumn replacement otherwise
    if len(gen) != len(set(gen)):
        dupes = sorted({n for n in gen if gen.count(n) > 1})
        raise ValueError(
            f"trailing_window_agg_multi: horizon names generate "
            f"colliding internal column(s) {dupes}; rename the horizons"
        )
    reserved = set(gen)
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"trailing_window_agg_multi: left already contains reserved "
            f"internal/output column(s) {clash}; rename them or pass a "
            f"different prefix"
        )
    cum = _trailing_cum_table(right, key, right_ts, value_col, scale)
    cur = asof_join(
        left,
        cum,
        key=key,
        left_ts=left_ts,
        right_ts="_rt",
        right_cols=["cum_c", "cum_s"],
        prefix="_hi_",
    )
    for name, w in windows.items():
        cur = asof_join(
            cur.withColumn(f"_lo_ts_{name}", F.col(left_ts) - F.expr(w)),
            cum,
            key=key,
            left_ts=f"_lo_ts_{name}",
            right_ts="_rt",
            right_cols=["cum_c", "cum_s"],
            prefix=f"_lo{name}_",
        )
    outs = []
    for name in windows:
        cnt = F.coalesce("_hi_cum_c", F.lit(0)) - F.coalesce(
            f"_lo{name}_cum_c", F.lit(0)
        )
        ssum = F.coalesce("_hi_cum_s", F.lit(0)) - F.coalesce(
            f"_lo{name}_cum_s", F.lit(0)
        )
        outs.append(cnt.cast("long").alias(f"{prefix}{name}_count"))
        outs.append(
            ssum.cast("long").alias(f"{prefix}{name}_sum_scaled")
        )
    return cur.select(*left.columns, *outs)


def trailing_distinct_count(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    window: str = "interval 24 hours",
    prefix: str = "win_",
) -> DataFrame:
    """EXACT trailing-window DISTINCT count ("distinct SKUs in the last
    24 h") — the feature prefix-sum differencing cannot express
    (:func:`trailing_window_agg` sums are subtractable; distinct sets
    are not), computed WITHOUT a range join via INTERVAL STABBING:

    A value is counted in ``(t − w, t]`` iff it has an occurrence
    there, iff exactly ONE of its occurrences is the first-in-window
    one (occurrence at ``a`` with previous same-value occurrence at
    ``b``): that requires ``b <= t − w < a`` and ``a > t − w >= a − w``,
    i.e. the window START ``s = t − w`` falls in the half-open interval
    ``[max(b, a − w), a)``. So each distinct (key, value, ts)
    occurrence emits one interval on the window-start axis, and the
    distinct count at any left row is the number of intervals
    containing ``s`` — a classic stabbing count: +1 at interval start,
    −1 at interval end, one per-key running sum over the boundary
    events, then ONE :func:`asof_join` of the left frame (shifted to
    ``s``) into that cumulative table. Exact for ANY window length and
    ANY per-key cardinality.

    Cost: one lag window + one hash-agg over O(distinct (key, value,
    ts)) occurrence rows, one running-sum window over O(2·occ)
    boundary events, one union-merge as-of sort over |L| + |events| —
    NO |L|·|R-per-window| range explosion, no per-left-row set
    re-scan, no sketch error. Duplicate occurrences collapse at the
    (key, value, ts) grain first (they cannot change a distinct
    count); a NULL left timestamp yields 0 (no window, nothing in it);
    NULL keys/values/timestamps on the right are excluded (SQL join
    semantics: NULL never equals anything, so a NULL-key occurrence
    can match no left row and a NULL value cannot be "a distinct value
    seen" — NULL-key LEFT rows therefore report 0, matching the
    equality-join oracle instead of Spark's NULLs-group-together
    window partitioning).

    ``left`` must not already carry the internal/output names
    (``_lo_ts``, the carried ``_d_open_cnt``, or ``{prefix}distinct``)
    — collisions raise, like every temporal operator's guard."""
    reserved = {"_lo_ts", "_d_open_cnt", f"{prefix}distinct"}
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"trailing_distinct_count: left already contains reserved "
            f"internal/output column(s) {clash}; rename them or pass a "
            f"different prefix"
        )
    w_expr = F.expr(window)
    occ = (
        right.filter(
            F.col(key).isNotNull()
            & F.col(right_ts).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(key).alias("_k2"),
            F.col(value_col).alias("_v2"),
            F.col(right_ts).alias("_a"),
        )
        .distinct()
    )
    w_prev = Window.partitionBy("_k2", "_v2").orderBy("_a")
    iv = occ.withColumn(
        "_lo",
        F.greatest(
            F.coalesce(F.lag("_a").over(w_prev), F.col("_a") - w_expr),
            F.col("_a") - w_expr,
        ),
    )
    events = iv.select(
        F.col("_k2"), F.col("_lo").alias("_et"), F.lit(1).alias("_d")
    ).unionByName(
        iv.select(
            F.col("_k2"), F.col("_a").alias("_et"), F.lit(-1).alias("_d")
        )
    )
    deltas = events.groupBy("_k2", "_et").agg(F.sum("_d").alias("_dd"))
    w_cum = (
        Window.partitionBy("_k2")
        .orderBy("_et")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = deltas.select(
        F.col("_k2").alias(key),
        F.col("_et"),
        F.sum("_dd").over(w_cum).alias("open_cnt"),
    )
    shifted = left.withColumn("_lo_ts", F.col(left_ts) - w_expr)
    both = asof_join(
        shifted,
        cum,
        key=key,
        left_ts="_lo_ts",
        right_ts="_et",
        right_cols=["open_cnt"],
        prefix="_d_",
    )
    return both.select(
        *left.columns,
        F.coalesce("_d_open_cnt", F.lit(0))
        .cast("long")
        .alias(f"{prefix}distinct"),
    )
