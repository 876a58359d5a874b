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

    specs = load_all()
    dfs = {name: specs[name].builder(spark, sf_dir) for name in HEADLINE}
    # Three full passes, per-query min ACROSS passes: back-to-back repeats
    # of one query share any transient slowdown (host noise, GC pause), so
    # each query's samples are separated by full suite passes instead.
    # Round-over-round comparisons at this scale are dominated by host
    # noise with only two samples (observed ±30% suite-total swings);
    # three tightens the min estimate at ~12 s extra runtime.
    timings: dict[str, float] = {name: float("inf") for name in HEADLINE}
    for _ in range(3):
        for name in HEADLINE:
            start = time.perf_counter()
            dfs[name].write.format("noop").mode("overwrite").save()
            timings[name] = min(timings[name], time.perf_counter() - start)
    timings = {name: round(t, 3) for name, t in timings.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
