"""Two-cluster-size scaling evidence (BASELINE.md sandbox protocol).

Runs bench.py as a subprocess at N=local[8] and 4N=local[32] on the
same input, repeats each level, takes the best run per level (the
host is shared — wall-clock noise is real and documented), and
writes BENCH/BASELINE.md with throughput at both levels and
efficiency = T32 / (4 * T8).

Usage: python tools/scaling_report.py [--sf-dir DIR] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_for_quiet(max_load: float = 3.0, timeout_s: int = 600) -> float:
    """The host is shared; a co-tenant burst during one level's run
    fabricates anti-scaling. Gate each run on 1-min loadavg."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        load = os.getloadavg()[0]
        if load < max_load:
            return load
        time.sleep(15)
    return os.getloadavg()[0]


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--append", action="store_true",
                    help="append this level pair as a section instead of rewriting the file")
    args = ap.parse_args()

    lo, hi = (int(x) for x in args.levels.split(","))
    results: dict[int, list[dict]] = {lo: [], hi: []}
    for rep in range(args.repeats):
        # alternate order per rep to de-bias slow drifts in host load
        order = (lo, hi) if rep % 2 == 0 else (hi, lo)
        for cpus in order:
            load = wait_for_quiet()
            r = run_bench(args.sf_dir, cpus)
            r["load_at_start"] = round(load, 2)
            results[cpus].append(r)
            print(f"[rep {rep}] local[{cpus}] (load {load:.1f}): "
                  f"pipeline {r['queries']['kg_pipeline']}s, "
                  f"{r['triples_per_sec']} triples/s, suite {r['value']}s", flush=True)

    best = {c: max(rs, key=lambda r: r["triples_per_sec"]) for c, rs in results.items()}
    tp_lo, tp_hi = best[lo]["triples_per_sec"], best[hi]["triples_per_sec"]
    eff = tp_hi / ((hi / lo) * tp_lo)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    mode = "a" if args.append else "w"
    title = (
        f"\n\n# Additional level pair — local[{lo}] vs local[{hi}]\n"
        if args.append
        else "# kgpipe scaling evidence — sandbox two-cluster-size protocol\n"
    )
    with open(path, mode) as f:
        f.write(f"""{title}
Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} by
`python tools/scaling_report.py --sf-dir {args.sf_dir} --repeats {args.repeats} --levels {args.levels}`.
Same job, same input (seed 42), two parallelism levels on one host
(BASELINE.md sandbox protocol: local[{lo}] stands in for N executors,
local[{hi}] for {hi//lo}N). Best of {args.repeats} runs per level; each run is gated on
1-min loadavg < 3 and levels alternate order per repeat — the host is
shared and co-tenant bursts otherwise fabricate anti-scaling (per-run
numbers incl. start load below).

## End-to-end KG pipeline (extract → parse → abbrev → link → canonicalize → materialize)

| level | pipeline sec | triples | triples/sec | suite sec |
|---|---|---|---|---|
| local[{lo}] (N) | {best[lo]['queries']['kg_pipeline']} | {best[lo]['pipeline_triples']} | {tp_lo} | {best[lo]['value']} |
| local[{hi}] ({hi//lo}N) | {best[hi]['queries']['kg_pipeline']} | {best[hi]['pipeline_triples']} | {tp_hi} | {best[hi]['value']} |

**Scaling efficiency (throughput({hi}) / ({hi//lo} × throughput({lo}))) = {eff:.3f}**
(target ≥ 0.8 would mean near-linear scaling; on one shared box the
upper levels also contend with the co-tenant load and the fixed
per-job scheduling latency that does not parallelize).

## Per-query wall seconds (best run per level)

| query | local[{lo}] | local[{hi}] |
|---|---|---|
""")
        for q in best[lo]["queries"]:
            f.write(f"| {q} | {best[lo]['queries'][q]} | {best[hi]['queries'].get(q, '—')} |\n")
        f.write("\n## All runs (JSON)\n\n```\n")
        for c in (lo, hi):
            for r in results[c]:
                f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"wrote {path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    main()
