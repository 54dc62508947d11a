"""8-vs-32-core scaling evidence at sf1 (VERDICT r13 next-round #6).

    python tools/scaling_sf1.py [sf1_dir] [out_json]

The bench's kernel rows are FIXTURE-BOUNDED (``doc_id < N`` keeps
their corpora identical at every scale factor), so at sf0.1 they are
dominated by job-launch floors and the 8v32 ratio says nothing about
the kernels. This probe scales the WORK instead: each kernel runs
over the full sf1 document table (or a slice big enough to be
compute-bound), plus the two bench rows whose work genuinely grows
with sf (dedup_jaccard_pairs, pagerank). The parent process spawns
one child per core count (a ``local[n]`` master is fixed at session
birth) and writes ``SCALING_sf1_r14.json``: per-probe wall at 32 and
8 cores and the ratio (4.0 = perfect scaling for a 4x core cut).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBES = (
    "email_kernel_50k",
    "flac_kernel_3k",
    "image_hash_kernel_6k",
    "dedup_jaccard_pairs",
    "pagerank_crawl_graph",
)


def _probe_frame(name: str, spark, sf_dir: str):
    from pyspark.sql import functions as F

    from amante_s_supabase_full_cloud_etl_pipeline_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents")
    if name == "email_kernel_50k":
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.email_text import (  # noqa: E501
            email_text_from_docs,
        )

        return email_text_from_docs(docs.repartition(256))
    if name == "flac_kernel_3k":
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.flac import (  # noqa: E501
            flac_meta_from_docs,
        )

        return flac_meta_from_docs(
            docs.filter(F.col("doc_id") < 3000).repartition(256)
        )
    if name == "image_hash_kernel_6k":
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.image_fp import (  # noqa: E501
            image_signatures,
            synthetic_near_dup_image_corpus,
        )

        return image_signatures(
            synthetic_near_dup_image_corpus(
                docs.filter(F.col("doc_id") < 1000)
            )
        )
    raise KeyError(name)


def child(cpus: str, sf_dir: str) -> None:
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    from amante_s_supabase_full_cloud_etl_pipeline_spark import registry
    from amante_s_supabase_full_cloud_etl_pipeline_spark.session import (
        get_spark,
    )

    import bench

    spark = get_spark(f"scaling-sf1-{cpus}")
    registry.load_all_queries()
    extra = bench._extra_queries()
    out: dict[str, float] = {}
    for name in PROBES:
        from amante_s_supabase_full_cloud_etl_pipeline_spark.operators.cache import (  # noqa: E501
            release_tracked,
        )

        if name == "pagerank_crawl_graph":
            best, _ = bench.pagerank_throughput(spark, sf_dir)
            out[name] = round(best, 3)
            continue

        def mk():
            release_tracked()
            if name in extra:
                return extra[name](spark, sf_dir)
            return _probe_frame(name, spark, sf_dir)

        mk().write.mode("overwrite").format("noop").save()  # warm-up
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            mk().write.mode("overwrite").format("noop").save()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 3)
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "SCALING_sf1_r14.json")
    )
    results: dict[str, dict] = {}
    for cpus in ("32", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus,
                   SPARK_GRAFT_SF_DIR=sf_dir)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             cpus, sf_dir],
            env=env, capture_output=True, text=True, cwd=REPO,
        )
        line = p.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    report = {
        "sf": sf_dir,
        "cpus_main": 32,
        "cpus_low": 8,
        "wall_32": results["32"],
        "wall_8": results["8"],
        "ratio_8_over_32": {
            k: round(results["8"][k] / results["32"][k], 2)
            for k in results["32"]
        },
        "note": (
            "ratio 4.0 = perfect scaling for the 4x core cut; kernel "
            "probes run over sf1-sized corpora because the bench's "
            "kernel ROWS are fixture-bounded (doc_id < N) and "
            "therefore sf-invariant by definition"
        ),
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report["ratio_8_over_32"]))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()
