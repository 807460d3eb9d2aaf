#!/usr/bin/env python
"""A/B: JVM zip_with/aggregate vector math vs Arrow-batched BLAS
kernels, across embedding dimensionality.

The registry's similarity queries run at the testdata's dim=64, where
JVM expressions win (no Python boundary). The reference's embedding
default is dim=3072 (reference: bear/config.py:60-61); this script
measures both implementations at dim = 64 / 256 / 768 (and 3072 with
$AB_INCLUDE_3072=1) on the same synthetic corpus and records the
winner, justifying operators/similarity.PANDAS_DIM_THRESHOLD.

Two workloads:
  topk   — exact cosine top-10 against one query vector over N rows
  pairs  — blocked near-dup pairs (label blocks, threshold 0.9):
           JVM = per-pair dot on the block equi-join;
           BLAS = per-block gram matrix (applyInPandas)

Appends a section to BENCH/BASELINE.md and writes
BENCH/vector_dim_ab.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from bear_spark.operators.similarity import (
        cosine,
        cosine_neardup_pairs_pandas,
        cosine_topk,
        cosine_topk_pandas,
        _dot,
        _norm,
    )
    from bear_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    reps = int(os.environ.get("AB_REPS", "2"))
    dims = [64, 256, 768] + ([3072] if os.environ.get("AB_INCLUDE_3072") else [])
    topk_rows = int(os.environ.get("AB_TOPK_ROWS", "100000"))
    pair_rows = int(os.environ.get("AB_PAIR_ROWS", "20000"))
    n_blocks = int(os.environ.get("AB_BLOCKS", "64"))

    spark = get_spark(
        app_name="vector_dim_ab", cores=cpus, shuffle_partitions=2 * cpus,
        driver_memory=os.environ.get("BENCH_DRIVER_MEM", "12g"),
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    work = f"{base}/vec_ab_{os.getpid()}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    def gen(n: int, dim: int, path: str, with_label: bool) -> None:
        # deterministic JVM-side pseudo-vectors: cheap to generate at
        # any dim, same arithmetic cost profile as real embeddings
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            *([(F.col("id") % n_blocks).cast("int").alias("label")] if with_label else []),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.sin(F.col("id") * 0.7919 + i.cast("double") * 0.6180)
                .cast("float"),
            ).alias("embedding"),
        )
        df.repartition(cpus).write.mode("overwrite").parquet(path)

    def timeit(fn) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 3)

    results = []
    for dim in dims:
        tk_path = os.path.join(work, f"topk_{dim}")
        pr_path = os.path.join(work, f"pairs_{dim}")
        gen(topk_rows, dim, tk_path, with_label=False)
        gen(pair_rows, dim, pr_path, with_label=True)
        vecs = spark.read.parquet(tk_path)
        blocks = spark.read.parquet(pr_path)
        q = [float(x) for x in vecs.filter(F.col("vec_id") == 0).first()["embedding"]]

        r = {"dim": dim, "topk_rows": topk_rows, "pair_rows": pair_rows}
        jvm_top = timeit(lambda: cosine_topk(vecs, q, k=10, impl="jvm").collect())
        pdk_top = timeit(lambda: cosine_topk_pandas(vecs, q, k=10).collect())
        r["topk_jvm_sec"], r["topk_pandas_sec"] = jvm_top, pdk_top
        r["topk_winner"] = "jvm" if jvm_top <= pdk_top else "pandas"

        def jvm_pairs():
            e = blocks.withColumn("nrm", _norm(F.col("embedding")))
            a, b = e.alias("a"), e.alias("b")
            cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
                F.col("a.nrm") * F.col("b.nrm")
            )
            return (
                a.join(b, (F.col("a.label") == F.col("b.label"))
                       & (F.col("a.vec_id") < F.col("b.vec_id")))
                .select(cos.alias("c")).filter(F.col("c") >= 0.9).count()
            )

        jvm_pr = timeit(jvm_pairs)
        pdk_pr = timeit(
            lambda: cosine_neardup_pairs_pandas(blocks, threshold=0.9).count()
        )
        r["pairs_jvm_sec"], r["pairs_pandas_sec"] = jvm_pr, pdk_pr
        r["pairs_winner"] = "jvm" if jvm_pr <= pdk_pr else "pandas"
        results.append(r)
        print(json.dumps(r), flush=True)

    shutil.rmtree(work, ignore_errors=True)
    out = {
        "generated": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "cpus": cpus,
        "reps": reps,
        "results": results,
    }
    with open(os.path.join(REPO, "BENCH", "vector_dim_ab.json"), "w") as f:
        json.dump(out, f, indent=2)

    lines = [
        "",
        "## Vector math A/B: JVM expressions vs Arrow-batched BLAS kernels",
        "",
        f"Generated by `python BENCH/run_vector_dim_ab.py` "
        f"({out['generated']}, local[{cpus}], best of {reps}). "
        f"topk = exact cosine top-10 over {topk_rows:,} rows; pairs = "
        f"blocked near-dup (≥ 0.9) over {pair_rows:,} rows in "
        f"{n_blocks} blocks.",
        "",
        "| dim | topk JVM (s) | topk BLAS (s) | winner | pairs JVM (s) | pairs BLAS (s) | winner |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['dim']} | {r['topk_jvm_sec']} | {r['topk_pandas_sec']} "
            f"| {r['topk_winner']} | {r['pairs_jvm_sec']} "
            f"| {r['pairs_pandas_sec']} | {r['pairs_winner']} |"
        )
    lines += [
        "",
        "`operators/similarity.PANDAS_DIM_THRESHOLD` dispatches "
        "`impl='auto'` accordingly: JVM below the crossover, BLAS at "
        "embedding-model dims (reference default 3072, "
        "bear/config.py:60-61).",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines))
    print("appended A/B section to BENCH/BASELINE.md", flush=True)


if __name__ == "__main__":
    main()
