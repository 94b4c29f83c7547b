"""IVF operating-point sweep (r6 verdict directive #3): measure
recall@3 vs brute force AND wall for nprobe ∈ {3, 8, 16, 20, 24, 28}
× refine_iters ∈ {0, 2} on the sf0.1 embeddings, so the engine default
is set from a measured recall-vs-wall curve instead of a guess.

Usage: python tools/ivf_sweep.py [sf_dir]
Prints one JSON line per cell plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession, functions as F

    from kgpipe.operators.similarity import cosine_topk, ivf_topk

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("ivf-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb = emb.repartition(32).cache()
    n = emb.count()
    queries = emb.where(F.col("vec_id") < 50)

    brute = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(queries, emb, k=3).collect()
    }
    print(json.dumps({"corpus": n, "brute_pairs": len(brute)}), flush=True)

    cells = []
    for refine in (0, 2):
        for nprobe in (3, 8, 16, 20, 24, 28):
            # warm + measure best-of-2 (cached corpus, so reps are cheap)
            walls, pairs = [], None
            for _ in range(2):
                t0 = time.monotonic()
                rows = ivf_topk(
                    queries, emb, k=3, stride=50, nprobe=nprobe,
                    refine_iters=refine,
                ).collect()
                walls.append(time.monotonic() - t0)
                pairs = {(r.query_id, r.neighbor_id) for r in rows}
            rec = len(pairs & brute) / max(len(brute), 1)
            cell = {
                "nprobe": nprobe,
                "refine_iters": refine,
                "recall": round(rec, 4),
                "wall_best": round(min(walls), 3),
                "walls": [round(w, 3) for w in walls],
            }
            cells.append(cell)
            print(json.dumps(cell), flush=True)

    print(json.dumps({"sweep": cells, "sf_dir": sf_dir}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
