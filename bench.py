"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes its FULL physical plan into the noop sink (no driver
collect, no write amplification) — the honest "how fast does the engine
compute this" number.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_nba_dmc_spark.session import get_spark
from datalake_nba_dmc_spark.suite import load_all

#: Headline set: one per operator family — reference parity (scan/conform/
#: join/agg/window/flagship) + each extension family (dedup/similarity/text).
HEADLINE = [
    "flagship_customer_resume",
    "j1_left_join_single_key",
    "a2_dynamic_sum_agg",
    "a3_multi_measure_agg",
    "w1_latest_order_per_customer",
    "w4_running_sum",
    "agg_rollup",
    "sort_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "curation_pipeline",
    "sim_bruteforce_topk",
    "text_stats",
    "text_token_histogram",
    "text_tfidf",
    "media_metadata",
    "events_tumbling_agg",
    "events_sessionization",
    "events_asof_latest_order",
    "stat_exact_moments",
    "w6_moving_avg",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customers",
]

#: Extended set (r5+): separately-totaled perf signal for the expensive
#: non-headline queries, so a plan regression outside the 29-query headline
#: becomes visible round-over-round (VERDICT r4 "What's wrong" #2). The
#: headline list above stays untouched for cross-round comparability; this
#: section's total is reported under "extended_total" and never mixed into
#: the headline "value".
#: DEFINITION CHANGE (r7, as promised in the r6 note here): the four
#: r6-registered queries (dedup_url_canonical, text_domain_quota,
#: text_dsir_selection, text_bpe_pair_counts) plus r7's three registrations
#: (text_bpe_segment, text_bm25_topk, dedup_paragraphs) joined the list —
#: see _EXTENDED_R6_DEF below; "extended_total_r6def" reports the old
#: 24-query subtotal once more for round-over-round continuity (recorded
#: in PERF.md).
EXTENDED = [
    "er_fuzzy_name_pairs",
    "text_gopher_quality",
    "text_unigram_logprob",
    "text_heavy_hitters",
    "text_gram_novelty",
    "sketch_distinct_rollup",
    "sketch_quantile_rollup",
    "sketch_theta_overlap",
    "lakehouse_version_diff",
    "mart_basket_pairs",
    "mart_supplier_pareto",
    "dedup_incremental",
    "text_decontaminate",
    "sim_ivf_topk",
    "sim_lsh_multiprobe_topk",
    "emb_pq_codes",
    "events_top_paths",
    "events_last_touch_attribution",
    "agg_incremental_maintenance",
    "stat_psi_price_drift",
    "dedup_repeated_spans",
    "sim_semantic_dedup",
    "text_quality_classifier",
    "sim_embedding_near_dups",
    # -- r7 additions (definition change; see note above)
    "dedup_url_canonical",
    "text_domain_quota",
    "text_dsir_selection",
    "text_bpe_pair_counts",
    "text_bpe_segment",
    "text_bm25_topk",
    "dedup_paragraphs",
    "sample_group_split",
    "corpus_temperature_mix",
    "text_ccnet_buckets",
    "text_js_divergence",
    "media_png_roundtrip_stats",
    # -- r8 additions (same definition-change protocol: the r6def
    #    continuity subtotal below is unaffected)
    "media_jpeg_decode_stats",
    "media_png_palette_roundtrip",
    "text_bm25_multiquery",
    "text_unigram_lm_segment",
    # r9 registrations (first same-harness baseline: BENCH_r09)
    "dedup_contamination_bloom",
    "dedup_substring_spans",
    "media_phash_dup_certificate",
    # r10 registrations (first same-harness baseline: BENCH_r10; staged
    # pre-baselines from the r9 session, same host/sf0.1: pack 1.54 s,
    # y4m_stats 0.65 s, pagerank@10it 3.43 s — the registered pagerank
    # runs 5 iterations, so expect roughly half that)
    "corpus_pack_sequences",
    "media_y4m_frame_stats",
    "media_wav_pcm_stats",
    "graph_pagerank_micro",
    "graph_harmonic_centrality",
    "mart_containment_pairs",
    # dedup_prefix_ssjoin deliberately NOT benched: it is the documented
    # slower-at-toy-scale skew-insurance path (PERF.md crossover receipt);
    # timing it would bill the suite for an operator whose contract is a
    # worst-case bound, not a clean-corpus constant.
    # r11 registrations (first same-harness baseline: BENCH_r11; staged
    # pre-baselines from the r10 session, same host/sf0.1: bigram 1.93 s,
    # hb_registers@3 4.06 s, hb_estimate@3 4.61 s, hll_portable 0.70 s,
    # quarantine 0.74 s; the error certificate runs exact+estimate
    # together, first baseline this round)
    "text_bigram_logprob",
    "graph_hyperball_registers",
    "graph_hyperball_harmonic_est",
    "graph_hyperball_error_certificate",
    "sketch_hll_portable",
    "media_quarantine_report",
    # r12 registrations (first same-harness baseline: BENCH_r12; staged
    # pre-baselines from the r11 session, same host/sf0.1, PERF.md
    # "r12-staged pre-baselines": c4 0.27 s steady, label_prop 5.7 s
    # end-to-end @4 rounds, cdc 2.6-5.6 s, minhash_portable 4.38 s,
    # simhash_portable 0.85 s, coreness 2.4 s @8 rounds, clusters
    # 2.6-2.9 s steady (plan-cache reuse of the persisted signatures —
    # the documented deliberate design), CC 2.2 s steady, triangles
    # 0.85 s, cms_counters 0.96 s, cms_heavy_hitters 1.17 s,
    # bootstrap_ci 1.44 s steady @64 resamples)
    "text_c4_filters",
    "graph_label_propagation",
    "dedup_cdc_chunks",
    "dedup_minhash_portable",
    "dedup_minhash_portable_clusters",
    "dedup_simhash_portable",
    "graph_connected_components",
    "graph_triangle_count",
    "sketch_cms_counters",
    "sketch_cms_heavy_hitters",
    "stat_bootstrap_ci",
    "graph_coreness",
    # r13 registrations (first same-harness baseline: BENCH_r13; staged
    # pre-baselines from the r12 sessions, same host/sf0.1, PERF.md
    # "r13-staged pre-baselines": ks_drift 1.42 s steady, mann_whitney
    # 1.74 s, hashed_tfidf 1.58-2.0 s, span_suppress 1.41-1.75 s,
    # hyperball_m64 6.4-8.1 s (REBUILD_EACH_PASS, ~2x the m=32 query —
    # the expected cost of doubling the register count), theta_vocab
    # 1.51 s, theta_vocab_overlap 2.09-2.76 s, cdc_reuse 5.4-6.0 s)
    "stat_ks_drift",
    "stat_mann_whitney",
    "text_hashed_tfidf",
    "dedup_span_suppress",
    "graph_hyperball_m64_est",
    "sketch_theta_vocab",
    "sketch_theta_vocab_overlap",
    "dedup_cdc_reuse",
    # r14 registrations (first same-harness baseline: BENCH_r14; staged
    # pre-baselines from the r13 session, same host/sf0.1, PERF.md
    # "r14-staged pre-baselines": coreness_bucketed 2.92 s
    # (REBUILD_EACH_PASS), exactsubstr_pipeline 1.48 s steady,
    # ks_by_segment 1.86 s, mw_by_segment 1.27 s, quantiles_by 1.08 s,
    # theta_difference 1.45 s, asof_within 0.69 s, trailing_window
    # 0.90 s, int8_topk 0.76 s, leakage_split 3.10 s steady / 15.7 s
    # honest rebuild — cache-rides the clusters signature frame, see
    # CACHE_RIDDEN)
    "graph_coreness_bucketed",
    "dedup_exactsubstr_pipeline",
    "stat_ks_drift_by_segment",
    "stat_mann_whitney_by_segment",
    "stat_exact_quantiles_by_segment",
    "sketch_theta_vocab_difference",
    "events_asof_within_tolerance",
    "events_trailing_window_features",
    "sim_int8_dot_topk",
    "sample_leakage_safe_split",
    # r15 registrations (first same-harness baseline: BENCH_r15; staged
    # pre-baselines from the r14 session, same host/sf0.1, PERF.md
    # "r15-staged pre-baselines", all measured REBUILD-style:
    # psi_by_segment 0.82 s steady, ivf_sq8_recall 3.71 s steady
    # (REBUILD_EACH_PASS — eager KMeans training, the hyperball
    # precedent), eval_decontaminated_split 5.95 s steady / 21.0 s
    # first — rides the clusters signature frame in a shared session,
    # see CACHE_RIDDEN, bootstrap_ci_by_segment 2.44 s steady,
    # trailing_windows_multi 1.65 s steady)
    "stat_psi_by_segment",
    "sim_ivf_sq8_recall",
    "sample_eval_decontaminated_split",
    "stat_bootstrap_ci_by_segment",
    "events_trailing_windows_multi",
]

#: Bench rows that ride another query's PERSISTED/cached intermediate by
#: documented design, so their per-pass second count is a CACHE-HIT
#: receipt, not the operator's independent cost (PERF.md carries the
#: independent numbers). Emitted in the FINAL line as `cache_ridden` so
#: a bare BENCH reader can't mistake the row for a speedup claim
#: (VERDICT r12 "what's wrong" #2).
CACHE_RIDDEN = [
    # rides dedup_minhash_portable_clusters' persisted signature frame
    # (independent cost ~4 s; the 0.08 s row is the plan-cache hit)
    "dedup_minhash_portable",
    # r14: same design — the split is the clusters pipeline + a
    # map-side mixer, so after clusters runs its persisted signature
    # frame serves this row too (honest independent cost 15.7 s first
    # build / 3.10 s steady, PERF.md "r14-staged pre-baselines")
    "sample_leakage_safe_split",
    # r15: the decontaminated split composes the same clusters
    # pipeline (plus the Bloom->exact screen), so it rides the same
    # persisted signature frame in a shared session (honest
    # independent cost 21.0 s first build / 5.95 s steady, PERF.md
    # "r15-staged pre-baselines")
    "sample_eval_decontaminated_split",
]

#: The r6-era extended membership (first 24 names) — used only to emit the
#: like-for-like "extended_total_r6def" continuity subtotal.
_EXTENDED_R6_DEF = EXTENDED[:24]


#: Variance controls (r7, VERDICT r6 ask #2): the official reading swung
#: ±14% round-over-round on identical code (tpch_q4/q5 ±40%) because the
#: harness sampled whatever machine state it landed on. Two mechanisms:
#: an idle gate that refuses to start timing while the host is busy, and
#: adaptive re-sampling that grants extra interleaved passes to queries
#: whose min/max spread stays above _SPREAD_TOL after the base passes.
_IDLE_MAX_WAIT_S = 120.0
_IDLE_LOAD_PER_CORE = 0.25
_SPREAD_TOL = 0.20
_EXTRA_PASS_LIMIT = 3


def _idle_gate() -> float:
    """Block until the 1-minute load average drops below
    ``_IDLE_LOAD_PER_CORE × cores`` (or the wait cap expires), so the
    timed region doesn't start while a previous heavy job (pytest, a
    concurrent build) is still draining. Returns seconds waited —
    reported in the output JSON so a gated run is visible."""
    target = (os.cpu_count() or 1) * _IDLE_LOAD_PER_CORE
    waited = 0.0
    while waited < _IDLE_MAX_WAIT_S and os.getloadavg()[0] > target:
        time.sleep(5.0)
        waited += 5.0
    return waited


def _spread(samples: list[float]) -> float:
    """Convergence measure for a min-of-N estimator: the relative gap
    between the two SMALLEST samples. (max-min would never settle — one
    early slow sample pins it high no matter how many clean samples
    arrive.) When the two best agree, the min is a trustworthy floor."""
    lo, lo2 = sorted(samples)[:2]
    return (lo2 - lo) / lo if lo > 0 else 0.0


#: FINAL-line budget (VERDICT r10 ask #8): the driver parses JSON from the
#: LAST ~2000 bytes of stdout (measured: every BENCH_r*.json tail is exactly
#: 2000 bytes; the r07 detail line overflowed it and parsed null). The FINAL
#: line must stay under this window or the driver records parsed: null.
_FINAL_LINE_BUDGET = 2000

#: Round-over-round movers under explicit watch (VERDICT r7 ask #6; r11 adds
#: the three r10 A/B movers) — surfaced in the FINAL line so the DRIVER
#: record carries them even though the extended detail doesn't fit the tail.
#: r16: tpch_q4_order_priority left this dict — it is a HEADLINE query, so
#: the inline `queries` dict now carries it (the entry was redundant bytes).
_WATCH = [
    "er_fuzzy_name_pairs",
    "text_unigram_logprob",
    "mart_basket_pairs",
]


def _final_line(
    total: float,
    sf: float | None,
    timings: dict[str, float],
    ext_total: float,
    ext_total_r6def: float,
    ext_timings: dict[str, float],
    idle_wait: float,
    still_unstable: list[str],
) -> str:
    """The compact FINAL stdout line. r16 (VERDICT r15 ask #2): the full
    HEADLINE per-query dict is inlined so the driver's PERF per_query /
    scaling tables populate again — ~1.3 KB of the 2000-byte tail window
    (the r15 `_detail` indirection blanked them and flipped bench_ok
    false). The EXTENDED dict (90+ rows, ~4 KB) cannot fit the measured
    window — it stays in BENCH_DETAIL.json (printed in full on the first
    stdout line as before). If a pathological case (every headline row
    unstable at maximal float width) would overflow, the queries dict
    degrades to the `_detail` pointer rather than bust the parser."""
    payload = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": dict(timings),
        "extended_total": ext_total,
        "extended_total_r6def": ext_total_r6def,
        "watch": {n: ext_timings[n] for n in _WATCH if n in ext_timings},
        "idle_wait_s": idle_wait,
        "unstable": still_unstable,
        "cache_ridden": [n for n in CACHE_RIDDEN if n in ext_timings],
    }
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > _FINAL_LINE_BUDGET - 100:
        payload["queries"] = {"_detail": "see BENCH_DETAIL.json"}
        line = json.dumps(payload, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # Steady-state warmup: fork the Python UDF workers (one per core) and
    # touch the fact table so JVM/codegen/process-pool startup isn't billed
    # to whichever query happens to run first.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(10_000, numPartitions=64).select(_warm(F.col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).write.format(
        "noop"
    ).mode("overwrite").save()
    # r12 (VERDICT r11 ask #4): the two windowed-events headliners
    # (events_tumbling_agg, events_sessionization) flagged `unstable` in
    # the r11 driver run — their first timed pass was paying the events
    # scan + the one-time JIT of the window/session-window aggregate
    # classes that no other warmup touches. Warm both plan shapes on a
    # tiny slice so pass 1 starts from the same steady state as pass 3.
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.write.format("noop").mode("overwrite").save()
    ev.limit(2048).groupBy(
        F.window("ts", "1 hour"), "event_type"
    ).count().write.format("noop").mode("overwrite").save()
    ev.limit(2048).groupBy(
        F.session_window("ts", "10 minutes"), "user_id"
    ).count().write.format("noop").mode("overwrite").save()
    # r13 (VERDICT r12 "what's wrong" #1): events_asof_latest_order was
    # the one `unstable` flag in the r12 record run — the same
    # first-pass-JIT class as the r11 windowed pair above. Warm the
    # as-of union-merge plan shape (tagged union + partitioned sort +
    # last(struct, ignorenulls) carry) on a tiny slice.
    from datalake_nba_dmc_spark.operators.temporal import asof_join

    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    asof_join(
        ev.limit(2048).select("event_id", "user_id", "ts"),
        od.limit(2048).select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ot"),
            "o_orderkey",
        ).groupBy("user_id", "ot").agg(F.max("o_orderkey").alias("o_orderkey")),
        key="user_id",
        left_ts="ts",
        right_ts="ot",
        right_cols=["o_orderkey"],
    ).write.format("noop").mode("overwrite").save()

    specs = load_all()
    dfs = {name: specs[name].builder(spark, sf_dir) for name in HEADLINE}

    # Queries whose BUILDER performs the heavy work eagerly (versioned-
    # snapshot writes, eager localCheckpoint materialization of admission
    # intermediates): timing only the noop write of the pre-built frame
    # would measure the cheap tail. These rebuild inside the timed region
    # every pass so the number stays the honest end-to-end cost.
    REBUILD_EACH_PASS = {
        "dedup_incremental",
        "lakehouse_version_diff",
        "agg_incremental_maintenance",
        # r7: gram rows now eagerly checkpointed before the self-join —
        # rebuild so the materialization is billed every pass
        "dedup_ngram_jaccard",
        # r11: the HyperBall builders eagerly localCheckpoint every
        # max-merge round — pre-building would bill only the final noop
        # of an already-materialized frame (the r10 "eager builder work
        # never billed" gotcha). First baselines are r11, so the honest
        # end-to-end definition starts clean here.
        "graph_hyperball_registers",
        "graph_hyperball_harmonic_est",
        "graph_hyperball_error_certificate",
        # r12: the three eager-checkpoint iterative graph loops (the
        # hyperball precedent — their builders materialize every round
        # eagerly, so pre-building would bill only the final noop).
        # dedup_minhash_portable_clusters is deliberately NOT here: its
        # persisted-signature plan-cache reuse across passes IS the
        # documented steady-state contract (operators/portable_sketch
        # docstring + PERF.md receipt).
        "graph_label_propagation",
        "graph_connected_components",
        "graph_coreness",
        # r13: the m=64 HyperBall estimate is the same eager-checkpoint
        # iterative builder as the m=32 trio above
        "graph_hyperball_m64_est",
        # r14: the bucketed coreness is the same eager-checkpoint
        # iterative loop as graph_coreness (PERF.md pre-baseline 2.92 s
        # was measured under this definition)
        "graph_coreness_bucketed",
        # r15: the IVF-SQ8 certificate trains KMeans eagerly in the
        # builder (the ivf_index contract) — pre-building would bill
        # only the final probe of an already-trained index; the 3.71 s
        # pre-baseline was measured under this definition
        "sim_ivf_sq8_recall",
    }

    samples: dict[str, list[float]] = {}

    def run_passes(names: list[str], passes: int) -> None:
        # Per-query min ACROSS full passes: back-to-back repeats of one
        # query share any transient slowdown (host noise, GC pause), so
        # each query's samples are separated by full suite passes instead.
        # Round-over-round comparisons at this scale are dominated by host
        # noise with only two samples (observed ±30% suite-total swings).
        for _ in range(passes):
            for n in names:
                start = time.perf_counter()
                df = (
                    specs[n].builder(spark, sf_dir)
                    if n in REBUILD_EACH_PASS
                    else dfs[n]
                )
                df.write.format("noop").mode("overwrite").save()
                samples.setdefault(n, []).append(time.perf_counter() - start)

    def run_set(names: list[str], passes: int) -> dict[str, float]:
        run_passes(names, passes)
        return {n: round(min(samples[n]), 3) for n in names}

    idle_wait = _idle_gate()

    # Three passes for the headline set (the graded, cross-round number),
    # then adaptive re-sampling: queries whose min/max spread is still
    # above _SPREAD_TOL get extra interleaved passes (as a group, so the
    # full-pass separation argument above still holds) until they settle
    # or the pass budget runs out. min-of-N converges onto the true cost
    # as N grows — this spends the extra N exactly where the noise is.
    run_set(HEADLINE, passes=3)
    for _ in range(_EXTRA_PASS_LIMIT):
        unstable = [n for n in HEADLINE if _spread(samples[n]) > _SPREAD_TOL]
        if not unstable:
            break
        run_passes(unstable, 1)
    still_unstable = [n for n in HEADLINE if _spread(samples[n]) > _SPREAD_TOL]
    timings = {n: round(min(samples[n]), 3) for n in HEADLINE}
    total = round(sum(timings.values()), 3)

    # Extended set: two passes (regression visibility, not the headline
    # metric — min-of-2 is enough to catch a plan regression, which shows
    # up as 2×+, not ±10%). Kept out of "value" for comparability.
    # REBUILD_EACH_PASS queries are NOT pre-built: their builders do the
    # heavy work eagerly (localCheckpoints, versioned-snapshot writes), so
    # a pre-build here would pay a full un-timed build whose frame run_set
    # never uses (it rebuilds them inside the timed region).
    for n in EXTENDED:
        if n not in dfs and n not in REBUILD_EACH_PASS:
            dfs[n] = specs[n].builder(spark, sf_dir)
    ext_timings = run_set(EXTENDED, passes=2)
    ext_total = round(sum(ext_timings.values()), 3)
    ext_total_r6def = round(sum(ext_timings[n] for n in _EXTENDED_R6_DEF), 3)

    detail = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extended_total": ext_total,
        # like-for-like continuity subtotal under the r6 membership
        # (see _EXTENDED_R6_DEF / PERF.md definition-change note)
        "extended_total_r6def": ext_total_r6def,
        "extended": ext_timings,
        # variance-control telemetry (r7): seconds spent in the
        # pre-run idle gate, and any queries whose two best
        # samples still disagreed >20% after the extra passes
        "idle_wait_s": idle_wait,
        "unstable": still_unstable,
        "cache_ridden": [n for n in CACHE_RIDDEN if n in ext_timings],
    }
    # Full per-query detail: printed first, and persisted to the repo so the
    # per-query history survives even when the driver's tail capture window
    # can't hold it.
    print(json.dumps(detail))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    # FINAL line = compact record with the HEADLINE per-query dict inline
    # (r16, VERDICT r15 ask #2; see _final_line for the byte budget —
    # r7's parsed-null defect is why the EXTENDED dict stays out).
    print(
        _final_line(
            total,
            sf,
            timings,
            ext_total,
            ext_total_r6def,
            ext_timings,
            idle_wait,
            still_unstable,
        )
    )


if __name__ == "__main__":
    main()
