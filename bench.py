"""Benchmark harness: runs the headline registry queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE
JSON line with per-query and total wall-clock seconds.

Each query is forced with a full collect() so the figure includes
result materialization, not just plan time.
"""

from __future__ import annotations

import json
import os
import sys
import time

from iceberg_diag_spark.plans.registry import REGISTRY
from iceberg_diag_spark.session import get_spark

HEADLINE = [
    "diag_metrics",
    "diag_partition_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_orders_per_customer",
    "orders_monthly",
    "q4_order_priority_semi",
    "q13_customer_distribution",
    "orders_rollup",
    "revenue_daily_gapfill",
    "events_funnel",
    "events_value_quantiles",
    "corpus_curation",
    "dedup_exact_groups",
    "text_stats",
    "minhash_pairs",
    "ngram_jaccard",
    "doc_fingerprint",
    "ann_cosine_topk",
    "events_hourly",
    "events_sessionize",
    "events_json_rollup",
    "asof_purchase_attribution",
    "range_clicks_before_purchase",
    "media_catalog",
    "media_frame_sample",
    "media_byte_histogram",
    "stream_tumbling_counts",
    # round 2 additions
    "diag_metrics_multi_table",
    "q7_nation_volume",
    "q10_returned_items",
    "q12_ship_delay",
    "q14_promo_revenue",
    "q17_small_quantity",
    "q22_sales_opportunity",
    "orders_window_analytics",
    "events_salted_rollup",
    "simhash_near_dup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark(app_name="iceberg-diag-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/readers and the Python-worker pool once so
    # per-query numbers measure the queries, not first-touch class
    # loading or pandas-worker spawn.
    REGISTRY["diag_partition_stats"].build(spark, sf_dir).collect()

    def _noop(batches):
        yield from batches

    spark.range(0, 64, 1, 32).mapInPandas(_noop, "id long").collect()

    # Warm the streaming engine too (micro-batch machinery, state
    # store, sink codegen) with a tiny sf0.001 drain, so the stream_*
    # entries measure the query rather than first-stream-in-session
    # initialization (~3 s of JVM warmup otherwise).
    from iceberg_diag_spark.streaming import stream_ops as _so

    _so.run_to_table(
        _so.tumbling_counts(
            _so.read_events_stream(spark, "/root/testdata/sf0.001")
        ),
        "complete",
        "bench_warmup",
    )

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        rows = REGISTRY[name].build(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
