"""FULL-pipeline scaling probe: extract→parse→abbrev→link→CC→
materialize over a large staged corpus, timed at two parallelism
levels AND against the small-corpus baseline.

This is the companion to tools/scaling_probe.py (narrow stage only):
the r2 evidence showed the narrow stage scaling at 0.816 (2→8) while
the END-TO-END pipeline measured ~0.3-0.4 — with the O(1)
fixed-job-latency amortization argument left unproven. This probe
proves or refutes it: drive the WHOLE pipeline on a corpus large
enough that fixed costs are minor, and report (a) efficiency across
levels at that size and (b) throughput across corpus sizes at a fixed
level. Appends a section to BENCH/BASELINE.md.

Usage:
    python tools/pipeline_scaling_probe.py --pages 600000 --levels 2,8 --repeats 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling_probe import stage_corpus, wait_for_quiet  # noqa: E402

PROBE_SNIPPET = r"""
import sys, time, tempfile, shutil
sys.path.insert(0, {repo!r})
from kgpipe.session import get_spark
from kgpipe.fixtures import RULES_16_TEXT
from kgpipe.pipeline import PipelineConfig, run_pipeline

spark = get_spark(app_name="pipeprobe{cpus}", master="local[{cpus}]", shuffle_partitions={cpus})
pages = spark.read.parquet({corpus!r})
wh = tempfile.mkdtemp(prefix="pipeprobe_wh_")
cfg = PipelineConfig(warehouse=wh, rules_text=RULES_16_TEXT, mode="compat",
                     n_parts=64, n_buckets=32)
t0 = time.monotonic()
res = run_pipeline(spark, pages, cfg)
n = res.counters["extract_parse_abbrev"]["n_out"]
dt = time.monotonic() - t0
assert n == res.triples.count()  # verify ledger OUTSIDE the timed region
print("RESULT", dt, n)
shutil.rmtree(wh, ignore_errors=True)
spark.stop()
"""


def run_probe(corpus: str, cpus: int) -> tuple[float, int]:
    code = PROBE_SNIPPET.format(repo=REPO, cpus=cpus, corpus=corpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=5400
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, dt, n = line.split()
            return float(dt), int(n)
    raise RuntimeError(f"probe failed: {out.stdout[-2000:]} {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=600_000)
    ap.add_argument("--baseline-pages", type=int, default=40_000,
                    help="small corpus for the throughput-vs-size contrast")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))

    big = stage_corpus(args.pages)
    small = stage_corpus(args.baseline_pages)

    results: dict[tuple[str, int], list[dict]] = {}
    runs = [("big", big, lo), ("big", big, hi), ("small", small, hi)]
    for rep in range(args.repeats):
        order = runs if rep % 2 == 0 else list(reversed(runs))
        for tag, corpus, cpus in order:
            load = wait_for_quiet()
            dt, n = run_probe(corpus, cpus)
            results.setdefault((tag, cpus), []).append(
                {"sec": dt, "triples": n, "tps": n / dt, "load": round(load, 2)}
            )
            print(f"[rep {rep}] {tag} local[{cpus}] (load {load:.1f}): "
                  f"{dt:.1f}s, {n/dt:,.0f} triples/s", flush=True)

    best = {k: max(v, key=lambda r: r["tps"]) for k, v in results.items()}
    eff = best[("big", hi)]["tps"] / ((hi / lo) * best[("big", lo)]["tps"])
    sustain = best[("big", hi)]["tps"] / best[("small", hi)]["tps"]
    # matched-rep pairs: a ratio metric belongs to runs sharing host
    # conditions (r7 synthesis), so the per-rep pair efficiencies are
    # first-class output alongside the best-of-cells estimator
    pairs = [
        (r4["tps"] / ((hi / lo) * r1["tps"]), r1["load"], r4["load"])
        for r1, r4 in zip(results[("big", lo)], results[("big", hi)])
    ]
    section = [
        f"\n## FULL-pipeline scaling probe — {args.pages:,} pages, local[{lo}] vs local[{hi}]\n",
        "\nWhole pipeline (extract→parse→abbrev→link→CC→materialize, fresh",
        f" warehouse per run), load-gated best-of-{args.repeats} per cell:\n\n",
        "| corpus | level | sec | triples/s |\n|---|---|---|---|\n",
        f"| {args.pages:,} pages | local[{lo}] (N) | {best[('big', lo)]['sec']:.1f} | {best[('big', lo)]['tps']:,.0f} |\n",
        f"| {args.pages:,} pages | local[{hi}] ({hi//lo}N) | {best[('big', hi)]['sec']:.1f} | {best[('big', hi)]['tps']:,.0f} |\n",
        f"| {args.baseline_pages:,} pages | local[{hi}] | {best[('small', hi)]['sec']:.1f} | {best[('small', hi)]['tps']:,.0f} |\n",
        f"\n**End-to-end scaling efficiency at {args.pages:,} pages "
        f"({lo}→{hi}) = {eff:.3f}**; throughput at local[{hi}] changes "
        f"×{sustain:.2f} as the corpus grows {args.pages // args.baseline_pages}× "
        "(≈flat or rising ⇒ fixed costs amortize; the pipeline's cost is "
        "linear in data).\n",
        "\nMatched-rep pair efficiencies (ratios within one rep share "
        "host conditions): "
        + ", ".join(
            f"**{e:.3f}** (loads {l1:.2f}/{l4:.2f})" for e, l1, l4 in pairs
        )
        + f"; load gate {os.environ.get('SPARK_GRAFT_PROBE_LOADGATE', '3.0')}.\n",
        "\nAll runs: `" + json.dumps({f"{t}[{c}]": v for (t, c), v in results.items()}) + "`\n",
        f"\nGenerated {time.strftime('%Y-%m-%dT%H:%M:%S%z')} by tools/pipeline_scaling_probe.py\n",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "a") as f:
        f.write("".join(section))
    print(f"appended to {path}; end-to-end efficiency={eff:.3f}, "
          f"size-sustain={sustain:.2f}")


if __name__ == "__main__":
    main()
