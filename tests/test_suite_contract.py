"""Driver-contract tests: every registered query analyzes cleanly against the
sf0.001 tables; oracle keys are a subset of query keys; entry() smoke."""

from __future__ import annotations

import importlib.util
import os

import pytest

from datalake_nba_dmc_spark.suite import load_all

SF0001 = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


def test_registry_shape():
    specs = load_all()
    assert len(specs) >= 45
    for name, spec in specs.items():
        assert spec.name == name
        assert callable(spec.builder)


@needs_testdata
def test_every_query_analyzes(spark):
    """df.schema forces Catalyst analysis (column/type resolution) without
    executing the plan — catches broken column refs in every suite entry."""
    for name, spec in load_all().items():
        df = spec.builder(spark, SF0001)
        assert len(df.schema.fields) > 0, name


@needs_testdata
def test_entry_smoke(spark):
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())


def test_driver_window_priority():
    """The driver checks only the first ~50 registry entries per round
    (observed cap: exactly 50 in every CORRECTNESS_r0N). Data-driven
    invariants that hold BOTH before and after the driver deposits the
    current round's CORRECTNESS file (the r5 version of this test was
    self-invalidating: the window under test is precisely what the newest
    file records, so its entries flip to "freshly checked" the moment the
    artifact lands — VERDICT r5 "What's wrong" #1):

    1. every registered query with NO driver row sits inside the 50-slot
       window (nothing ships unchecked longer than one round — the
       registry freeze, enforced strictly this time);
    2. the remaining slots go to the STALEST queries: a window entry was
       last checked no later than latest_round - 2, OR exactly in
       latest_round (meaning this very window produced that row);
    3. backlog entries that didn't fit sit contiguously just past the
       edge (they lead the next round's cut);
    4. the NO_ORACLE_PINNED names (rows-only by design — a window slot
       spent on them can only yield a `no_oracle` err row) sit at the
       absolute BOTTOM of the rotation, outside the window forever
       (VERDICT r11 ask #2); they are exempt from the staleness and
       contiguity rules their pinning intentionally violates.
    """
    import glob
    import json
    import os

    from datalake_nba_dmc_spark.suite import NO_ORACLE_PINNED, TOUCHED_R16

    specs = load_all()
    names = list(specs)
    window = names[:50]
    pinned = set(NO_ORACLE_PINNED)
    # VERDICT r15 ask #1: optimization-round rewrites must be re-proved by
    # the driver's own oracle even when a slot checked them recently —
    # TOUCHED_R16 names are exempt from the staleness rule (and must all
    # actually BE in the window).
    touched = set(TOUCHED_R16)
    assert touched <= set(window), (
        f"touched queries outside the window: {sorted(touched - set(window))}"
    )

    # the pin itself: all 11 at the very bottom, none with an oracle
    assert names[-len(NO_ORACLE_PINNED) :] == NO_ORACLE_PINNED
    assert all(specs[n].oracle is None for n in NO_ORACLE_PINNED)
    # and the pinned list is EXACTLY the registry's no-oracle set — a new
    # rows-only registration must either get an oracle or join the pin
    assert pinned == {n for n, s in specs.items() if s.oracle is None}

    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        for q in json.load(open(path)):
            last[q] = max(last.get(q, 0), rnd)
    latest_round = max(last.values())

    never_checked = [n for n in names if n not in last and n not in pinned]
    overflow = [n for n in never_checked if n not in window]
    assert overflow == [], (
        f"never-checked queries outside the window: {overflow} — new "
        "registrations belong inside their own round's window"
    )

    for n in window:
        if n not in last or last[n] == latest_round or n in touched:
            continue
        assert last[n] <= latest_round - 2, (
            f"{n} was checked in r{last[n]} — window slots belong to the "
            f"never-checked and the stalest (r{latest_round - 2} or older)"
        )
    # just past the edge: the OLDEST cohort present in the tail (the
    # deliberately-deferred backlog) queues contiguously, leading the
    # next round's cut — nothing fresher interleaves ahead of it (the
    # pinned names are exempt: they sit at the bottom by design)
    tail = [n for n in names[50:] if n not in pinned]
    tail_last = [last[n] for n in tail if n in last]
    min_last = min(tail_last)
    tail_oldest = [n for n in tail if last.get(n) == min_last]
    assert tail_oldest == tail[: len(tail_oldest)], (
        "deferred-backlog entries must sit contiguously at the window edge"
    )


def test_bench_final_line_fits_tail_window():
    """VERDICT r10 ask #8 / r15 ask #2: the driver parses JSON from the
    LAST ~2000 bytes of bench stdout. The FINAL line now inlines the
    full HEADLINE per-query dict (so the driver's PERF per_query tables
    populate), and must stay under budget even in the WORST case —
    maximal float widths, every headline query unstable, every watch
    entry present. _final_line degrades the queries dict to the
    `_detail` pointer rather than ever busting the window; this pins
    both the normal-case fit AND the degradation guard."""
    import json

    import bench

    worst_timings = {n: 99999.999 for n in bench.HEADLINE}
    worst_ext = {n: 99999.999 for n in bench._WATCH + bench.CACHE_RIDDEN}
    line = bench._final_line(
        99999.999,
        0.1,
        worst_timings,
        99999.999,
        99999.999,
        worst_ext,
        120.0,
        list(bench.HEADLINE),  # worst case: ALL unstable
    )
    assert len(line) <= bench._FINAL_LINE_BUDGET - 100, (
        f"FINAL line worst case is {len(line)} bytes — too close to the "
        f"driver's ~{bench._FINAL_LINE_BUDGET}-byte tail window"
    )
    # the realistic case (nothing unstable) must carry per-query inline
    typical = bench._final_line(
        19.999, 0.1, worst_timings, 105.99, 22.99, worst_ext, 0.0, []
    )
    parsed = json.loads(typical)
    assert set(parsed["queries"]) == set(bench.HEADLINE), (
        "typical FINAL line must inline the full headline per-query dict"
    )
    assert len(typical) <= bench._FINAL_LINE_BUDGET - 100


def test_staged_specs_disjoint_and_planned():
    """Staged specs (suite/staged.py) must never leak into the driver's
    registry, and must exactly match the r16 slate (the audit batteries
    run over precisely these names). The 5-op r14 slate registered in
    r15 — those names now live in the registry with oracles."""
    from datalake_nba_dmc_spark.suite import load_all
    from datalake_nba_dmc_spark.suite.staged import staged_specs

    registered = set(load_all())
    staged = staged_specs()
    assert set(staged) == _R16_SLATE
    assert {
        "stat_psi_by_segment",
        "sim_ivf_sq8_recall",
        "sample_eval_decontaminated_split",
        "stat_bootstrap_ci_by_segment",
        "events_trailing_windows_multi",
    } <= registered
    assert not (set(staged) & registered)
    # the audit view appends them; the driver view must not contain them
    with_staged = load_all(include_staged=True)
    assert set(with_staged) == registered | set(staged)
    for spec in staged.values():
        assert spec.oracle is None and callable(spec.builder)


#: The planned r16 registration slate (updated as this round stages ops).
_R16_SLATE: set[str] = {
    "events_trailing_distinct_items",
    "sample_stratified_split",
    "stat_drift_panel_by_segment",
}
