"""Physical-plan shape assertions for the headline queries.

Correctness tests prove the numbers; these prove the PLAN is the one that
survives a 100 TB scale-up: filters reach the Parquet scan, dimensions
broadcast, EXISTS compiles to a semi join, top-k avoids a global sort, and
aggregates are map-side combined. A regression that silently de-optimizes a
plan (a lost pushdown, a broadcast that became a sort-merge join) fails
here even though results stay correct.
"""

from __future__ import annotations

import os

import pytest

from datalake_nba_dmc_spark.suite import load_all

SF0001 = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF0001), reason="driver testdata not present"
)


def plan_of(spark, name: str) -> str:
    import contextlib
    import io

    df = load_all()[name].builder(spark, SF0001)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@needs_testdata
def test_q6_filters_push_to_scan(spark):
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


@needs_testdata
def test_q1_scan_prunes_columns(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    read = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    assert "l_comment" not in read
    assert "l_partkey" not in read  # unused column must not be scanned
    assert "l_quantity" in read


@needs_testdata
@pytest.mark.parametrize(
    "name",
    ["tpch_q3_shipping_priority", "tpch_q5_local_supplier_volume", "tpch_q14_promo_revenue"],
)
def test_dimensions_broadcast(spark, name):
    plan = plan_of(spark, name)
    assert "BroadcastHashJoin" in plan, f"no broadcast join in {name}"


@needs_testdata
def test_q4_exists_is_semi_join(spark):
    plan = plan_of(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan


@needs_testdata
def test_q22_not_exists_is_anti_join(spark):
    plan = plan_of(spark, "tpch_q22_dormant_customers")
    assert "LeftAnti" in plan


@needs_testdata
def test_topk_avoids_global_sort(spark):
    plan = plan_of(spark, "tpch_q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_agg_is_partial_then_final(spark):
    plan = plan_of(spark, "tpch_q1_pricing_summary")
    # two HashAggregate nodes around one Exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


@needs_testdata
def test_q1_wholestage_codegen(spark):
    """The executed (AQE-final) plan must run the scan→agg pipeline inside
    WholeStageCodegen — the formatted pre-execution plan hides codegen ids,
    so force execution first."""
    import contextlib
    import io

    df = load_all()["tpch_q1_pricing_summary"].builder(spark, SF0001)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    plan = buf.getvalue()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, f"no WholeStageCodegen stage markers:\n{plan}"


@needs_testdata
def test_flagship_broadcasts_dim_join(spark):
    plan = plan_of(spark, "flagship_customer_resume")
    assert "BroadcastHashJoin" in plan


@needs_testdata
def test_q2_all_dims_broadcast_window_argmin(spark):
    """q2's correlated MIN must be a window over the already-joined (and
    therefore tiny) candidate set, with every dimension broadcast — a
    sort-merge join here means a fact-sized shuffle of the offers table
    against a dim that should have broadcast."""
    plan = plan_of(spark, "tpch_q2_min_cost_supplier")
    assert "Window" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # offers agg map-side combined


@needs_testdata
def test_q16_not_in_is_anti_join_not_nested_loop(spark):
    """NOT IN over a non-nullable key must compile to a broadcast
    left-anti hash join; a BroadcastNestedLoopJoin (the null-aware
    fallback) would be O(rows x exclusions) at scale."""
    plan = plan_of(spark, "tpch_q16_supplier_part_counts")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_q21_exists_shapes_with_inequality_residual(spark):
    """q21's EXISTS/NOT EXISTS against the same fact must compile to
    equi semi/anti joins on l_orderkey with the supplier inequality as a
    residual condition — never a nested-loop theta join."""
    plan = plan_of(spark, "tpch_q21_waiting_suppliers")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_merge_is_single_full_outer_join(spark):
    """MERGE semantics = exactly one full-outer shuffle join on the key —
    no extra exchanges, no row-multiplying inner pre-joins."""
    plan = plan_of(spark, "merge_upsert_orders")
    assert "FullOuter" in plan
    assert plan.count("Exchange (") == 2  # one per side, nothing else


@needs_testdata
def test_scd2_single_window_single_exchange(spark):
    """SCD2 interval build is ONE window pass: one shuffle on the entity
    key, one Window node, no joins."""
    plan = plan_of(spark, "scd2_user_event_history")
    assert plan.count("Window (") == 1
    assert plan.count("Exchange (") == 1
    assert "Join" not in plan


@needs_testdata
def test_q17_no_allparts_aggregate_broadcast(spark):
    """q17's per-part threshold must be a window over the brand-filtered
    rows — the ONLY broadcast allowed is the filtered part-key dim. An
    aggregate over every l_partkey being broadcast is a driver OOM at
    scale."""
    plan = plan_of(spark, "tpch_q17_small_quantity_revenue")
    assert "Window" in plan
    # tree lines render as "+- BroadcastExchange (n)"; details repeat the name
    assert plan.count("BroadcastExchange (") == 1, plan


@needs_testdata
def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The eval-set gram side must broadcast: the corpus pass stays
    map-side, and the only shuffle carries (doc_id, count) pairs."""
    plan = plan_of(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_resample_thresholds_broadcast_corpus_unshuffled(spark):
    """Per-stratum thresholds join back by broadcast — the corpus side of
    the membership filter must not shuffle."""
    plan = plan_of(spark, "corpus_resample_balanced")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_quantize_is_pure_projection(spark):
    """int8 quantization adds no exchange and no join: a projection the
    scan pipeline absorbs."""
    plan = plan_of(spark, "emb_int8_quantize")
    for op in ("Exchange", "Join", "Aggregate"):
        assert op not in plan, op


@needs_testdata
def test_time_range_window_single_exchange(spark):
    """The RANGE-frame window shuffles once on the partition key — one
    Exchange, one Sort, no join."""
    plan = plan_of(spark, "w9_time_range_hour")
    assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
    assert "Join" not in plan


@needs_testdata
def test_char_entropy_single_udf_no_agg_shuffle(spark):
    """Char entropy is a map-only Arrow projection: the UDF evaluates
    exactly ONCE (an output-side filter would push back through the
    projection and double-evaluate it), and there is no aggregation
    shuffle — the only Exchange is ensure_parallelism's round-robin
    fan-out (the SQL twin needs a row-per-char explode + two aggs)."""
    plan = plan_of(spark, "text_char_entropy")
    # formatted explain prints each node twice (tree line + detail header)
    assert plan.count("ArrowEvalPython") == 2
    assert "hashpartitioning" not in plan
    assert "HashAggregate" not in plan


@needs_testdata
def test_gopher_quality_pure_projection(spark):
    """The Gopher rule battery is a map-only projection: no exchange, no
    join, no aggregate — the scan pipeline absorbs it."""
    plan = plan_of(spark, "text_gopher_quality")
    for op in ("Exchange", "Join", "Aggregate"):
        assert op not in plan, op


@needs_testdata
def test_weighted_sample_no_global_sort(spark):
    """Efraimidis-Spirakis selection compiles to TakeOrderedAndProject
    (per-partition top-k + driver merge), never a full Sort+Exchange."""
    plan = plan_of(spark, "sample_weighted_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


@needs_testdata
def test_unigram_logprob_broadcast_total(spark):
    """The grand-total one-row aggregate joins back by broadcast; the
    (doc, word) side never sort-merge-joins against it."""
    plan = plan_of(spark, "text_unigram_logprob")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@needs_testdata
def test_multiprobe_corpus_single_bucket_join(spark):
    """Multi-probe explodes only the broadcast query side: the corpus is
    bucketed once and equi-joins by broadcast — no corpus shuffle."""
    plan = plan_of(spark, "sim_lsh_multiprobe_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_attribution_single_asof_merge(spark):
    """Last-touch attribution rides the as-of union-merge: no
    range-condition join (which would plan as BroadcastNestedLoop or
    Cartesian), just hash exchanges + one window."""
    plan = plan_of(spark, "events_last_touch_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


@needs_testdata
def test_outlier_profile_broadcast_back(spark):
    """The O(groups) median/MAD rows join back to the corpus by
    broadcast — the fact side never sort-merge-joins."""
    plan = plan_of(spark, "profile_price_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_band_lookup_is_broadcast_hash_join_not_nested_loop(spark):
    """The bin-accelerated band join must compile to a broadcast HASH join
    on the bin key (O(1) probe per fact row); the naive BETWEEN predicate
    would appear as BroadcastNestedLoopJoin (O(bands) per row)."""
    plan = plan_of(spark, "join_price_band_lookup")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_heavy_hitters_recount_is_broadcast_semi_join(spark):
    """Candidate recount must be a broadcast LEFT SEMI hash join (corpus
    never shuffled on the token) and the final top-k a
    TakeOrderedAndProject, not a global Sort."""
    plan = plan_of(spark, "text_heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_top_paths_two_lags_share_one_exchange(spark):
    """Both lag windows order identically, so the plan needs exactly ONE
    exchange on user_id for the window stage (plus the final single-
    partition top-k exchange); a second window sort would double it."""
    plan = plan_of(spark, "events_top_paths")
    n_user_exchanges = plan.count("hashpartitioning(user_id")
    assert n_user_exchanges == 1, plan
    assert "TakeOrderedAndProject" in plan


@needs_testdata
def test_transition_matrix_single_window_exchange(spark):
    plan = plan_of(spark, "events_transition_matrix")
    assert plan.count("hashpartitioning(user_id") == 1, plan
    # final (from,to) agg is map-side combined: partial then final
    assert plan.count("HashAggregate") >= 2


@needs_testdata
def test_fuzzy_pairs_sig_join_and_dedup_shuffle_integers_only(spark):
    """The r6 fully-narrow pipeline: the signature self-join and the
    candidate-pair distinct must shuffle ONLY integers — text payloads
    re-enter via the two id equi-joins (each text moved once), never
    through the L+1-fanned signature rows. Any exchange partitioned on
    _sig or the candidate ids that carries a text column is the O(L²)
    regression this plan removed."""
    plan = plan_of(spark, "er_fuzzy_name_pairs")
    sig_ex = [
        ln
        for ln in plan.splitlines()
        if "hashpartitioning(_sig" in ln or "hashpartitioning(_id_a" in ln
    ]
    assert sig_ex, plan
    assert all(
        "_text" not in ln and "c_name" not in ln for ln in sig_ex
    ), sig_ex
    assert "CartesianProduct" not in plan


@needs_testdata
def test_nearest_join_is_two_asof_merges(spark):
    """nearest_value_join must compile to exactly TWO window-sort passes
    (backward + forward as-of) — never a theta-join between facts and
    the band table."""
    plan = plan_of(spark, "join_nearest_tier")
    # count the details headers "(N) Window" — formatted explain prints
    # each node twice (tree + details), so a raw substring count cannot
    # distinguish one Window node from two
    import re

    assert len(re.findall(r"\(\d+\) Window", plan)) == 2, plan
    # the value-side pairing must not appear as a nested-loop join
    assert "BroadcastNestedLoopJoin" not in plan


@needs_testdata
def test_psi_plan_has_no_sort(spark):
    """PSI is pure binned aggregation: no Sort anywhere in the plan (the
    only join is the broadcast of the one-row totals)."""
    plan = plan_of(spark, "stat_psi_price_drift")
    assert "Sort (" not in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_winsorize_bounds_broadcast_back(spark):
    plan = plan_of(spark, "profile_winsorize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@needs_testdata
def test_basket_pairs_equi_join_on_basket(spark):
    """The pair self-join must be keyed on the order id (hash-partitioned
    equi-join) — the items-per-basket² bound depends on it."""
    plan = plan_of(spark, "mart_basket_pairs")
    assert "hashpartitioning(l_orderkey" in plan, plan
    # exactly ONE nested-loop join is expected: the cross join against the
    # broadcast ONE-ROW basket total; the pair self-join itself must not
    # be a second one. Count the tree form — formatted explain repeats
    # each node bare in the details section.
    assert plan.count("BroadcastNestedLoopJoin Cross") == 1


@needs_testdata
def test_repeated_spans_two_exchanges_no_udf(spark):
    """Repeated-substring spans: exactly the two data shuffles the design
    promises — one on the gram hash for occurrence counting, one on the
    doc id for interval merge — plus ensure_parallelism's round-robin fan
    out; the final per-span groupBy must REUSE the doc partitioning (no
    exchange between the Window and the HashAggregates), and the whole
    pipeline stays expression-only (no Python workers)."""
    plan = plan_of(spark, "dedup_repeated_spans")
    assert plan.count("Exchange (") == 3, plan  # round-robin + gram_h + doc
    assert "hashpartitioning(gram_h" in plan
    assert "hashpartitioning(doc_id" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # groupBy after the doc window adds aggregates but no new exchange:
    # 2 HashAggregates (partial+final) over the same doc_id partitioning
    assert plan.count("HashAggregate") >= 2


@needs_testdata
def test_cdc_reuse_folds_stage_once(spark):
    """r15 ADVICE: cdc_reuse's speed rests on Catalyst plan-shape
    heuristics pinned only by comments — the always-true `size(_v1h)>=0`
    second reference that stops CollapseProject from inlining the staged
    folds (measured 7 s → 85 s without it) and the post-agg `n_chunks>0`
    filter that dodges predicate pushdown. A Spark upgrade that changes
    either rule would re-run the O(len) character fold ~8× per row with
    no test failing. Pin the executed shape: the token-hash fold (_th)
    and the chunk-hash fold (_v1h) each materialize as EXACTLY ONE
    staged projection alias, and the plan reads the documents parquet
    exactly twice (v1 corpus + the id/text re-read the report joins
    back to). Inlining regressions erase the `AS _th#`/`AS _v1h#`
    aliases and multiply the fold expressions instead."""
    plan = plan_of(spark, "dedup_cdc_reuse")
    assert plan.count("Scan parquet") == 2, plan.count("Scan parquet")
    lines = plan.splitlines()
    assert sum(1 for ln in lines if "AS _th#" in ln) == 1
    assert sum(1 for ln in lines if "AS _v1h#" in ln) == 1


@needs_testdata
def test_incremental_dedup_final_plan_reads_checkpoints_only(spark):
    """incremental_dedup materializes its batch-bounded intermediates
    (fresh/survivors/bb) with eager local checkpoints — the corpus is
    scanned exactly once per check INSIDE those jobs, so the returned
    frame's own plan must contain no parquet scan at all (everything
    downstream flows from the checkpointed RDDs). A regression back to
    lazy re-derivation reintroduces 4-8 corpus scans and shows up here as
    a Scan node."""
    plan = plan_of(spark, "dedup_incremental")
    assert "Scan parquet" not in plan, plan
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan


@needs_testdata
def test_semantic_dedup_pairs_are_cluster_equi_join(spark):
    """SemDeDup's pairwise stage must be an equi-join on centroid_id —
    the cluster bound is the whole point; a regression to a cartesian /
    BroadcastNestedLoopJoin over the corpus is the O(n²) failure the
    operator exists to avoid. (The certificate query wraps this same
    plan, so one assertion covers both.)"""
    plan = plan_of(spark, "sim_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the ≥-threshold filter applies to cluster-mate pairs, joined on
    # the centroid assignment
    assert "centroid_id" in plan


@needs_testdata
def test_url_dedup_is_single_exchange_hash_agg(spark):
    """Canonical-URL dedup must cost exactly ONE shuffle (the groupBy on
    the canonical key) with a map-side partial aggregate; canonicalization
    itself is pure projection. A second Exchange or a Python worker here
    means the map-only canonicalizer regressed."""
    plan = plan_of(spark, "dedup_url_canonical")
    assert plan.count("Exchange (") == 1, plan
    assert "HashAggregate" in plan
    assert "partial_min" in plan, plan
    for udf_marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert udf_marker not in plan


@needs_testdata
def test_domain_quota_single_exchange_with_limit_pushdown(spark):
    """The per-domain quota is ONE ranking window whose limit Catalyst
    pushes below the exchange: Partial WindowGroupLimit (caps a hot
    domain's shuffle contribution at n rows per upstream partition) →
    single Exchange on domain → Final WindowGroupLimit. Losing the
    pushdown (or growing a second exchange) reintroduces the link-farm
    single-reducer funnel / doubles the shuffle."""
    plan = plan_of(spark, "text_domain_quota")
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Partial" in plan and "Final" in plan, plan
    for udf_marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert udf_marker not in plan


@needs_testdata
def test_dsir_selection_is_take_ordered(spark):
    """DSIR's top-100 selection must compile to TakeOrderedAndProject
    (distributed partial top-k), never a global Sort; the LM-totals side
    stays a broadcast of a one-row aggregate (no cartesian)."""
    plan = plan_of(spark, "text_dsir_selection")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


@needs_testdata
def test_bpe_pair_counts_single_agg_chain(spark):
    """BPE pair counts: corpus → vocab agg → pair explode/agg →
    TakeOrdered. Two aggregation exchanges (word, pair) and the top-40,
    zero joins, zero Python."""
    plan = plan_of(spark, "text_bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan, plan
    # ensure_parallelism's input repartition + the (word) and (pair) agg
    # exchanges — nothing else
    assert plan.count("Exchange (") == 3, plan
    assert plan.count("HashAggregate") >= 4  # both aggs map-side combined
    for marker in ("Join", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan, marker


@needs_testdata
def test_bm25_topk_is_take_ordered_with_broadcasts(spark):
    """BM25 top-k must compile the final cut to TakeOrderedAndProject (no
    global sort of the score stream); per-term document frequencies and
    the one-row (N, avgdl) corpus stats ride broadcast joins; no Python
    workers anywhere — the whole scorer is codegen expressions."""
    plan = plan_of(spark, "text_bm25_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


@needs_testdata
def test_paragraph_dedup_text_crosses_one_shuffle(spark):
    """Paragraph dedup's contract: dedup decisions travel as narrow
    (id, idx, hash) triples through map-side-combinable aggs; the TEXT
    column rides exactly one shuffle (the per-doc keep-index equi-join).
    No shuffle other than that join may carry a string payload wider
    than the id."""
    plan = plan_of(spark, "dedup_paragraphs")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "partial_min" in plan, plan  # first-occurrence agg combines map-side
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan
    # the decisions path must aggregate BEFORE joining back: hash aggs on
    # the paragraph-hash and doc-id keys
    assert plan.count("HashAggregate") >= 4, plan


@needs_testdata
def test_prefix_ssjoin_joins_on_integers_only(spark):
    """The prefix candidate join and the verify joins must never shuffle
    the gram STRINGS — only 64-bit hashes, ids, and sizes; the gram
    frequency agg is map-side combined; no global rank window (the total
    order is struct-sort per doc, not a corpus-wide row_number)."""
    plan = plan_of(spark, "dedup_prefix_ssjoin")
    assert "Window" not in plan, plan  # no single-partition global rank
    assert "partial_count" in plan, plan  # freq agg combines map-side
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan


@needs_testdata
def test_group_split_one_agg_one_join(spark):
    """Leakage-free split: ONE min-agg shuffle on the group key plus the
    equi-join back — the corpus must not shuffle twice; the split CASE is
    pure codegen (no Python, no extra exchange)."""
    plan = plan_of(spark, "sample_group_split")
    assert "partial_min" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan


@needs_testdata
def test_temperature_mix_thresholds_broadcast_corpus_unshuffled(spark):
    """Temperature mix: the k-row thresholds and the one-row min must
    BROADCAST onto the corpus scan; the only aggregation exchanges belong
    to the per-source count and the final report agg — the corpus itself
    is never hash-repartitioned before the filter."""
    plan = plan_of(spark, "corpus_temperature_mix")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in plan


@needs_testdata
def test_bm25_multiquery_windowgrouplimit_all_broadcast(spark):
    """Multi-query BM25 (r8): the per-query top-k must compile to
    WindowGroupLimit (per-query heaps, no global sort), every join side
    (terms semi-join, df/qterms/stats) must broadcast, and the plan stays
    Python-free."""
    plan = plan_of(spark, "text_bm25_multiquery")
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


@needs_testdata
def test_unigram_segment_single_vocab_agg_chain(spark):
    """Unigram-LM apply (r8): the corpus collapses to the word-frequency
    table (ONE exchange for the word agg, one for the final piece agg);
    the argmin UDF is the single Arrow stage and runs AFTER the word agg —
    once per distinct word, never per token instance."""
    plan = plan_of(spark, "text_unigram_lm_segment")
    # count the TREE node line ("ArrowEvalPython (7)"), not the detail
    # section header ("(7) ArrowEvalPython") that formatted output repeats
    assert plan.count("ArrowEvalPython (") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_bloom_screen_sketch_broadcasts_corpus_unshuffled(spark):
    """Bloom decontamination screen (r8): the one-row sketch must arrive
    by broadcast (a nested-loop join over exactly one row), the corpus
    side's only exchange is the final per-doc count agg, and the whole
    probe stays JVM-side (no Python eval)."""
    import contextlib
    import io

    from datalake_nba_dmc_spark.operators.dedup import contamination_hits_bloom

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    df = contamination_hits_bloom(corpus, bench)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "SortMergeJoin"):
        assert marker not in plan, marker
    # r9 regression pin: the probe must stay FLAT expressions — a
    # forall()-based membership filter re-introduces the interpreted-HOF
    # plan split that cost 7x (PERF.md r9 Bloom receipt)
    assert "forall" not in plan.lower(), "interpreted HOF back in the probe"


@needs_testdata
def test_substring_spans_semi_join_partitioned_islands(spark):
    """Cross-doc substring spans (r9): the shared-window filter compiles
    to a broadcast/shuffled SEMI join (window hashes only — text never
    re-shuffles), the gaps-and-islands merge windows are partitioned by
    document (no corpus-wide single-partition Window), and the plan stays
    JVM-side after the tokenize stage."""
    plan = plan_of(spark, "dedup_substring_spans")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan
    # every Window node partitions by doc_id
    import re

    for w in re.findall(r"windowspecdefinition\([^\n]*", plan):
        assert "doc_id" in w.split("ASC")[0], w
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan


@needs_testdata
def test_phash_certificate_single_arrow_stage_chain(spark):
    """pHash re-encode certificate (r9): synthesize→decode→re-encode→hash
    chains map-side MapInPandas stages — no join, and the ONLY Exchange
    is ensure_parallelism's fan-out of the raw (doc_id, text) rows BEFORE
    any payload exists, so PNG/BMP bytes never cross a shuffle."""
    plan = plan_of(spark, "media_phash_dup_certificate")
    assert plan.count("Exchange (") == 1, plan
    assert plan.count("MapInPandas (") == 2, plan
    # the exchange sits under the scan side, upstream of both Arrow stages
    assert plan.index("Exchange (") > plan.index("MapInPandas ("), plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_semantic_dedup_gram_matmul_no_pair_join(spark):
    """SemDeDup edges (r10 rewrite): the within-cluster pairwise stage is
    a grouped Arrow matmul (FlatMapGroupsInPandas), NOT a self-join that
    materializes pair rows — the shuffle carries cluster rows only; no
    cartesian/BNLJ anywhere; and the interpreted per-pair HOF cosine of
    the first cut (hidden ~12 s at sf0.1) cannot reappear without this
    failing. Asserted on the EDGE stage's own plan: the registered
    query's final plan hides it behind connected_components'
    localCheckpoint materialization."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.similarity import _semantic_edges

    with_sim = spark.createDataFrame(
        [(0, 1, [1.0, 0.0], 0.9), (0, 2, [1.0, 0.0], 0.9)],
        "centroid_id int, vec_id long, embedding array<double>, centroid_sim double",
    )
    edges = _semantic_edges(
        with_sim, dim=2, id_col="vec_id", vec_col="embedding",
        threshold=0.95, max_cluster_rows=10, n_split_tables=2, seed=1,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edges.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # no SELF-JOIN of the keyed cluster rows survives anywhere
    assert "SortMergeJoin Inner" not in plan, plan


def test_hll_portable_single_partial_agg(spark):
    """Portable HLL (r10-staged): ONE hash aggregation with map-side
    partial_max registers — exactly one Exchange (the group-key
    shuffle), no Window, no Python in the plan (pure codegen'd CASE
    arithmetic)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from datalake_nba_dmc_spark.operators.hll_portable import (
        hll_portable_distinct,
    )

    df = spark.createDataFrame(
        [(i % 3, i * 7) for i in range(100)], "g int, k long"
    )
    out = hll_portable_distinct(df, ["g"], "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Exchange (") == 1, plan
    assert "partial_max" in plan, plan
    assert "Window" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_hll_portable_estimate_stays_staged(spark):
    """The r10 cross-scale finding, pinned (VERDICT r10 ask #4): fusing
    the full (Σ 2^(K−reg), V) + CASE/floor estimate into the aggregate's
    generated output method blew janino's 64 KB method limit and fell
    back to interpreted execution SILENTLY. The fix stages the
    reductions as separate projections — assert the final HashAggregate
    emits only the raw register maxima (no FLOOR/estimate inside its
    Results) and at least two Project stages sit above it."""
    import contextlib
    import io
    import re

    from datalake_nba_dmc_spark.operators.hll_portable import (
        hll_portable_distinct,
    )

    df = spark.createDataFrame(
        [(i % 3, i * 7) for i in range(100)], "g int, k long"
    )
    out = hll_portable_distinct(df, ["g"], "k")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # tree section: two Projects ABOVE the final (non-partial) HashAggregate
    tree = plan.split("(1) Scan")[0]
    m = re.search(
        r"Project \(\d+\)\s*\n\s*\+- Project \(\d+\)\s*\n\s*\+- HashAggregate",
        tree,
    )
    assert m, f"staged (_s,_v) + estimate projections missing:\n{tree}"
    # the aggregate's own output must NOT carry the estimate expression
    for header in re.finditer(r"\(\d+\) HashAggregate", plan):
        section = plan[header.start() : header.start() + 4000]
        results = section.split("Results")[1].split("\n")[0] if "Results" in section else ""
        assert "FLOOR" not in results and "floor" not in results, (
            "estimate expression fused into the aggregate output method "
            "(janino 64 KB risk):\n" + section[:800]
        )


@needs_testdata
def test_theta_vocab_partial_group_limit_and_broadcast(spark):
    """sketch_theta_vocab's rank<=k filter must compile to
    WindowGroupLimit with the PARTIAL map-side pass present (the
    pre-shuffle prune that keeps the top-k sketch cheap at corpus
    scale), and the per-group exact/sketch join must broadcast."""
    plan = plan_of(spark, "sketch_theta_vocab")
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_hashed_tfidf_idf_broadcasts(spark):
    """text_hashed_tfidf's <=256-row IDF table must come back as a
    broadcast join (never a sort-merge of corpus-grained rows against
    a dashboard-sized table), and the corpus-total join is the one-row
    broadcast scalar pattern."""
    plan = plan_of(spark, "text_hashed_tfidf")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


@needs_testdata
def test_ks_substrate_no_sort_merge_no_cartesian(spark):
    """stat_ks_drift (and by substrate-sharing stat_mann_whitney): the
    two-phase prefix sum's scalar frames (value range, bucket offsets,
    cohort totals) must all ride broadcasts — no sort-merge join, no
    CartesianProduct anywhere in the plan (the crossJoins are one-row
    broadcast scalars, compiled to BroadcastNestedLoopJoin)."""
    for name in ("stat_ks_drift", "stat_mann_whitney"):
        plan = plan_of(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, name
