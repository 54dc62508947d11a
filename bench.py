"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <dir>}

Each query is forced end-to-end with the noop sink (full execution,
no driver collect cost). One warm-up run of the flagship amortizes
JVM/codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from amante_s_supabase_full_cloud_etl_pipeline_spark import registry
from amante_s_supabase_full_cloud_etl_pipeline_spark.session import get_spark

#: headline set: one representative per operator family, weighted
#: toward the shapes that dominate at scale (star join, two-level agg,
#: window top-k, inverted-index self-join, ANN scan, sessionization).
HEADLINE = (
    "star_net_sales_by_region",
    "a5_avg_order_quantity",
    "a11_category_performance",
    "topk_parts_per_type",
    "explode_part_words",
    "lineitem_validation_clean",
    "dedup_exact_survivors",
    "dedup_jaccard_pairs",
    "knn_bruteforce_cosine",
    "knn_lsh_bucketed",
    "events_sessionization",
    "text_quality_scores",
)


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("amante-bench")
    registry.load_all_queries()

    def force(name: str) -> float:
        df = registry.QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    force("star_net_sales_by_region")  # warm-up (JVM, codegen, dims)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(force(name), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    run()
