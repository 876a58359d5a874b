"""Full-registry physical-plan census — the per-round self-audit tool.

For every registered query, build the frame at sf0.001, count plan
features that matter at 100 TB, then EXECUTE it into the noop sink while
watching the JVM's stderr for whole-stage-codegen compile failures. Each
round audits a dimension (r5: FileScan duplication + broadcast
direction; r6: window rank-limit pushdown + cartesian / Python-marker /
exchange-count screen; r11: janino compile-failure scan — the r10
portable-HLL finding: a generated aggregate output method past janino's
64 KB limit logs `ERROR CodeGenerator ... Failed to compile` and
silently falls back to INTERPRETED execution, correct but unbilled-slow;
this was a manual grep until now). Usage:

    python tools/plan_census.py            # summary + flagged queries
    python tools/plan_census.py --all      # per-query table
    python tools/plan_census.py --no-exec  # analyze-only (skip codegen scan)
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: Codegen-health patterns: janino's method-size overflow and the generic
#: compile-failure banner both precede a silent interpreted fallback.
CODEGEN_BAD = re.compile(
    r"Failed to compile|grows beyond 64 KB|Code of method .* exceeds"
)

#: Queries allowed to show a ranking Window WITHOUT WindowGroupLimit:
#: their window result is NOT filtered by a rank bound (full ranking is
#: the deliverable), so there is nothing to push down.
UNFILTERED_RANK_OK = {
    "w2_rank_in_group",      # full per-group ranking is the output
    "w5_ntile_quartiles",    # ntile has no limit semantics
    "w8_percent_rank",       # full distribution is the output
    "mart_rfm_segments",     # quintile labels for every row
    "mart_supplier_pareto",  # cumulative shares for every supplier
    "text_length_deciles",   # decile labels for every doc
}

#: Audited BroadcastNestedLoopJoin sites (r6 census): every one is a
#: crossJoin against a side that is BOUNDED BY CONSTRUCTION — a one-row
#: global aggregate (corpus totals / scalar avg), a <=10-row Range of
#: quantile bounds, or the MAX_QUERY_ROWS-guarded broadcast query set of
#: the topk/recall family. A BNLJ in any query NOT on this list is a new
#: unbounded nested loop and must be triaged.
BNLJ_AUDITED = {
    "corpus_resample_balanced",   # one-row per-source totals broadcast
    "corpus_temperature_mix",     # one-row min-count broadcast onto k strata rows
    "events_user_idle_report",    # one-row stream-horizon aggregate
    "mart_basket_pairs",          # one-row basket-count total
    "mart_supplier_pareto",       # one-row revenue grand total
    "sim_bruteforce_topk",        # guarded (MAX_QUERY_ROWS) query set
    "sim_hard_negatives",         # guarded query set
    "sim_ivf_recall",             # guarded query set (brute baseline)
    "sim_lsh_multiprobe_recall",  # guarded query set
    "sim_lsh_recall",             # guarded query set
    "sim_pq_adc_recall",          # guarded query set
    "sketch_theta_overlap",       # one-row sketch blobs
    "stat_psi_price_drift",       # one-row pre/post totals
    "text_collocations",          # one-row token grand total
    "text_bm25_topk",             # one-row (N, avgdl) corpus-stats broadcast
    "text_bm25_multiquery",       # same one-row (N, avgdl) broadcast, shared
                                  # across the whole query workload (r8)
    "text_ccnet_buckets",         # one-row token grand total (via unigram_logprob)
    "text_dsir_selection",        # one-row LM-totals broadcast
    "text_js_divergence",         # one-row token-totals broadcast
    "text_length_deciles",        # Range(10) decile bounds
    "text_tfidf",                 # one-row doc-count total
    "text_unigram_logprob",       # one-row token grand total
    "text_vocab_coverage",        # one-row token grand total
    "stat_bootstrap_ci",          # one-row point-estimate broadcast onto
                                  # the one-row interval (r12)
    "stat_ks_drift",              # one-row (n_a, n_b) totals broadcast +
                                  # one-row bucket-range broadcast (r13 slate)
    "stat_mann_whitney",          # same one-row totals/range broadcasts
                                  # (shared _cohort_value_cum substrate)
    "text_hashed_tfidf",          # one-row distinct-doc-count broadcast
                                  # (r13 slate)
    "sketch_theta_vocab_overlap", # groups x groups pair grid of two
                                  # theta frames (<= |groups| rows each —
                                  # sketch rows, never corpus rows)
    "sketch_theta_vocab_difference",  # same ordered pair grid + the
                                  # anti-membership probe over <= k*groups
                                  # kept-sketch rows (r14 slate; the
                                  # NOT-IN null-check join is non-equi by
                                  # SQL shape, bounded by the sketch)
    "sim_int8_dot_topk",          # guarded broadcast query set (the
                                  # n_queries-row code frame; the
                                  # candidate scan is the documented
                                  # exact-baseline contract, r14 slate)
    "sim_ivf_sq8_recall",         # two BNLJ Cross nodes, both building
                                  # the guarded 3-row query set: the
                                  # brute-force exact leg (the
                                  # sim_ivf_recall audited shape) and
                                  # the certificate's recall join —
                                  # the IVF-SQ8 stage itself joins
                                  # equi on centroid_id (r15 slate)
    "sample_eval_decontaminated_split",  # one BNLJ building the one-row
                                  # bit-packed Bloom sketch map probed
                                  # per corpus gram — the
                                  # dedup_contamination_bloom audited
                                  # shape riding inside the two-stage
                                  # screen (r15 slate)
    "tpch_q11_important_stock",   # one-row global-value threshold
    "corpus_pack_sequences",      # one-row (min_id, id_span) broadcast for
                                  # the order-preserving bucket split (r10;
                                  # the two Window nodes are the documented
                                  # two-phase prefix sum: a <=256-row
                                  # bucket-offset window + the
                                  # partitionBy(bucket) parallel running
                                  # sum — plan-asserted in test_packing)
    "dedup_contamination_bloom",  # one-row bit-packed Bloom sketch map
                                  # broadcast onto the corpus gram stream
                                  # (r9; the whole point of the operator —
                                  # a fixed ~1 MiB sketch replaces the
                                  # gram-string broadcast)
    "tpch_q22_dormant_customers", # one-row avg(acctbal) scalar
    "text_bigram_logprob",        # one-row vocabulary-size broadcast onto
                                  # the per-(doc,bigram) count stream (r11;
                                  # same shape as text_unigram_logprob's
                                  # token grand total — the smoothing
                                  # denominator V is a corpus scalar)
}


def main() -> int:
    show_all = "--all" in sys.argv
    do_exec = "--no-exec" not in sys.argv

    # JVM stderr capture for the codegen scan: the JVM inherits fd 2 at
    # fork time, so the redirect must happen BEFORE the SparkSession
    # (hence before get_spark's first import-time use). Python-side
    # stderr keeps flowing to the same file; per-query attribution reads
    # the file's delta after each execution.
    cap = tempfile.NamedTemporaryFile(
        mode="w+b", prefix="census_stderr_", suffix=".log", delete=False
    )
    saved_fd2 = os.dup(2)
    os.dup2(cap.fileno(), 2)

    from datalake_nba_dmc_spark.session import get_spark
    from datalake_nba_dmc_spark.suite import load_all

    spark = get_spark("plan_census")

    def stderr_delta(pos: int) -> tuple[str, int]:
        with open(cap.name, "rb") as f:
            f.seek(pos)
            chunk = f.read()
        return chunk.decode("utf-8", "replace"), pos + len(chunk)

    flagged: list[str] = []
    rows = []
    # drain JVM startup noise before attributing anything
    _, cap_pos = stderr_delta(0)
    for name, spec in load_all().items():
        try:
            df = spec.builder(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"BUILD-ERROR {type(e).__name__}"))
            flagged.append(name)
            continue
        n_exchange = len(re.findall(r"\bExchange \(", plan))
        n_window = len(re.findall(r"\bWindow \(", plan))
        n_wgl = plan.count("WindowGroupLimit")
        cartesian = "CartesianProduct" in plan
        bnlj = "BroadcastNestedLoopJoin" in plan
        py = [
            m
            for m in ("BatchEvalPython",)
            if m in plan
        ]
        # a ranking window feeding a rank filter should carry the
        # pushdown; detect "row_number()... Filter (rank <= k)" shape by
        # Window present + a Filter on the rank alias right above it
        rank_filtered = bool(
            re.search(r"Condition : .*(rn|rank|_rn|quota_rank)\S* <= \d", plan)
        )
        problems = []
        if cartesian:
            problems.append("CARTESIAN")
        if bnlj and name not in BNLJ_AUDITED:
            problems.append("NEW-BNLJ")
        if py:
            problems.append("ROW-PYTHON")
        if rank_filtered and n_wgl == 0 and name not in UNFILTERED_RANK_OK:
            problems.append("RANK-FILTER-NO-PUSHDOWN")
        if do_exec:
            # run the real plan (codegen compiles at execution, same
            # generated methods at every scale) and scan the JVM stderr
            # delta for the silent-interpreted-fallback banner
            try:
                df.write.format("noop").mode("overwrite").save()
            except Exception as e:  # noqa: BLE001
                problems.append(f"EXEC-ERROR {type(e).__name__}")
            delta, cap_pos = stderr_delta(cap_pos)
            if CODEGEN_BAD.search(delta):
                problems.append("JANINO-FALLBACK")
        line = (
            f"exch={n_exchange} win={n_window} wgl={n_wgl}"
            + (" " + ",".join(problems) if problems else "")
        )
        rows.append((name, line))
        if problems:
            flagged.append(name)
    os.dup2(saved_fd2, 2)
    os.close(saved_fd2)
    if show_all:
        for n, line in rows:
            print(f"{n:45s} {line}")
    print(f"\n{len(rows)} queries; flagged: {len(flagged)}")
    for n in flagged:
        print(" ", n, dict(rows)[n])
    return 1 if flagged else 0


if __name__ == "__main__":
    main()
