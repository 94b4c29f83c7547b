"""Isolation benchmark for the r08 optimization round (guide §1.4):
times each declared-query path with a noop sink so the computation is
measured, not the sink, and labels jobs for attribution. bench.py is
FROZEN for the driver's measurement; this file holds the extra
per-query evidence cited in OPTIMIZATION_r08.md.

Usage:
  SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py [query ...]

Prints one JSON line: {"queries": {name: best_sec}, "queries_median": ...,
"n_reps": N}. Methodology mirrors bench.py (load-gated best-of-N) so the
numbers are comparable; the sink differs (noop vs count) by design — a
noop computes every column, a count lets Spark prune, so noop numbers
are an upper bound on what the frozen bench times.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _gate(threshold: float, max_wait: float) -> float:
    t0 = time.monotonic()
    load = os.getloadavg()[0]
    while load >= threshold and (time.monotonic() - t0) < max_wait:
        time.sleep(5.0)
        load = os.getloadavg()[0]
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    load_gate = float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE", "3.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_MAXWAIT", "120"))
    only = set(sys.argv[1:])

    from kgpipe.session import get_spark

    spark = get_spark(app_name=f"kgpipe-bench-extra-{cpus}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as em

    q = em.queries()
    names = [
        "nt_parse", "nt_parse_abbrev", "sameas_canonical", "exact_dedup_docs",
        "token_counts", "quality_scores", "lang_id", "minhash_lsh_pairs",
        "simhash_pairs", "ann_bruteforce", "ann_ivf", "lineitem_agg",
        "revenue_by_nation", "topk_orders_per_customer", "events_agg",
    ]
    if only:
        names = [n for n in names if n in only] + sorted(
            n for n in only if n in q and n not in names
        )

    reps: list[dict] = []
    loads: list[float] = []
    sc = spark.sparkContext
    for _ in range(n_reps):
        loads.append(round(_gate(load_gate, max_wait), 2))
        t: dict[str, float] = {}
        for name in names:
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            t[name] = round(time.monotonic() - t0, 3)
            sc.setJobDescription(None)
        reps.append(t)
    timings = {k: min(r[k] for r in reps) for k in reps[0]}
    medians = {k: round(sorted(r[k] for r in reps)[len(reps) // 2], 3) for k in reps[0]}
    print(json.dumps({
        "metric": "bench_extra noop-sink per-query wall",
        "queries": timings, "queries_median": medians,
        "n_reps": n_reps, "loads": loads, "cpus": cpus, "sf_dir": sf_dir,
    }, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
