#!/usr/bin/env python3
"""Scaling-exponent bench for the dedup/ANN/CC/stream family.

All headline perf claims rest on one scale point (sf0.1). This script
synthesizes a 10× corpus — documents/embeddings/events unioned with 9
deterministic id-shifted copies (texts get a per-copy suffix token and
embeddings a per-copy first-dim epsilon so the near-dup pair structure
grows ~10×, not 100×) — then times each family query at 1× and 10× and
reports the per-query scaling exponent alpha = log(t10/t1)/log(10).
alpha ≈ 1 is linear; anything materially super-linear is named in the
"superlinear" list. Output: ONE JSON line, also written to
BENCH_SCALING.json.

Run: python3 bench_scaling.py   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_RUNS as in bench.py)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import statistics
import sys
import time

FAMILY = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_clusters",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_embedding_lsh_blocked",
    "sessionize_events",
    "pack_sequences",
    "text_quality",
    "text_chunking",
    # round-4 additions
    "text_line_dedup",
    "sketch_cms_heavy_hitters",
    "sketch_histogram_quantiles",
    "graph_pagerank",
    "centroid_by_bucket",
    "bloom_pruned_join_revenue",
]

COPIES = 10


def synthesize(spark, src: str, dst: str) -> None:
    """10× tables via id-shifted unions; everything else symlinked."""
    from pyspark.sql import functions as F

    from blockchair_etl_spark.io.sources import TESTDATA_TABLES, load_table

    os.makedirs(dst, exist_ok=True)

    docs = spark.read.parquet(f"{src}/documents.parquet")
    n_docs = docs.count()
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
            # per-copy suffix token: copies are near-dups of the base,
            # not exact dups, so dup-pair volume grows ~linearly
            F.concat_ws(" ", F.col("text"), F.lit(f"copytag{i}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    n_emb = emb.count()
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(i * n_emb)).alias("vec_id"),
            # first-dim epsilon per copy: keeps copies in the same LSH/IVF
            # neighborhoods without making them exact duplicates
            F.expr(
                f"transform(embedding, (x, j) -> CASE WHEN j = 0 THEN "
                f"cast(x + {i} * 1e-4 AS float) ELSE x END)"
            ).alias("embedding"),
            "label",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")

    ev = load_table(spark, src, "events")  # ns→µs normalization if needed
    n_ev = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            "ts",
            # distinct user space per copy → session count scales ~10×
            (F.col("user_id") + F.lit(i * 1_000_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for i in range(COPIES)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(f"{dst}/events.parquet")

    for t in TESTDATA_TABLES:
        link = f"{dst}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{src}/{t}.parquet", link)


def time_queries(spark, sf_dir: str, runs: int) -> dict[str, float]:
    from blockchair_etl_spark.queryset import QUERIES

    timings = {}
    for name in FAMILY:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
    return timings


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from blockchair_etl_spark.session import get_session

    spark = get_session(app_name="bench-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    dst = os.path.join(repo, ".bench_tmp", "sf10x")
    shutil.rmtree(dst, ignore_errors=True)
    synthesize(spark, src, dst)

    t1 = time_queries(spark, src, runs)
    t10 = time_queries(spark, dst, runs)
    alphas = {
        n: round(math.log(max(t10[n], 1e-3) / max(t1[n], 1e-3)) / math.log(COPIES), 2)
        for n in FAMILY
    }
    result = {
        "metric": "family_scaling_exponent",
        "copies": COPIES,
        "base_sf_dir": src,
        "t_base": t1,
        "t_10x": t10,
        "alpha": alphas,
        # alpha is wall-clock-derived on a box with fixed parallelism;
        # sub-second base times are scheduling-noise-dominated, so only
        # flag entries that are both slow enough to measure and clearly
        # super-linear.
        "superlinear": sorted(
            n for n in FAMILY if alphas[n] > 1.25 and t1[n] >= 0.5
        ),
        "n": runs,
    }
    line = json.dumps(result)
    print(line)
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        f.write(line + "\n")
    shutil.rmtree(dst, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
