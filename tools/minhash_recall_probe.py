"""Minhash-LSH recall attribution probe (r6 verdict directive #2):
compute the exact 2-gram-Jaccard ≥ 0.8 ground truth at a given sf,
run the production LSH query, and attribute every missed pair to
cap_dropped vs banding_miss via minhash_miss_attribution. Optionally
sweeps max_bucket if cap drops dominate.

Usage: python tools/minhash_recall_probe.py [sf_dir] [--sweep]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sweep = "--sweep" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession, functions as F

    from kgpipe.operators.dedup import (
        minhash_dup_pairs,
        minhash_miss_attribution,
        ngram_jaccard_pairs,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .appName("minhash-recall-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(32)
        .cache()
    )
    docs.count()
    exact = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=2, threshold=0.8)
        .select("a", "b")
        .collect()
    }
    fam = dict(num_hashes=64, bands=16, shingle_k=2)
    caps = [128, 256, 512, 1024] if sweep else [128]
    for max_bucket in caps:
        lsh = {
            (r.a, r.b)
            for r in minhash_dup_pairs(
                docs, "doc_id", "text", jaccard_threshold=0.8,
                max_bucket=max_bucket, **fam,
            ).select("a", "b").collect()
        }
        missed_pairs = sorted(exact - lsh)
        out = {
            "sf_dir": sf_dir,
            "max_bucket": max_bucket,
            "exact_pairs": len(exact),
            "lsh_pairs": len(lsh),
            "recall": round(len(lsh & exact) / max(len(exact), 1), 4),
            "missed": len(missed_pairs),
        }
        if missed_pairs:
            missed_df = spark.createDataFrame(missed_pairs, "a long, b long")
            att = (
                minhash_miss_attribution(
                    docs, "doc_id", "text", missed_df,
                    max_bucket=max_bucket, **fam,
                )
                .groupBy("cause")
                .count()
                .collect()
            )
            out["by_cause"] = {r.cause: r["count"] for r in att}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
