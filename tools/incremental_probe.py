"""Operator-level evidence for incremental materialize + link: on a
large corpus, time the SECOND pipeline run (base + a small delta of
new urls) in incremental mode — url-delta link, canon-diff partition
patching — against the full mode, which relinks and rewrites the edge
table from scratch. Per-stage wall times come from wrapping the stage
functions in-process, so the comparison is the stages the feature
actually accelerates, not the (identical) extract recompute both
modes pay when new urls scatter across hash partitions.

Repeats restore the post-base-run warehouse from a snapshot so every
timed run applies the same delta to the same state; runs are
load-gated (shared host — see BENCH/BASELINE.md protocol).

Usage:
    python tools/incremental_probe.py --pages 200000 --delta-pct 1 --repeats 2
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def wait_for_quiet(gate: float = 3.0, max_wait: float = 600.0) -> float:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        load = os.getloadavg()[0]
        if load < gate:
            return load
    return os.getloadavg()[0]


def stage_timer(times: dict):
    import kgpipe.pipeline as pl

    originals = {}

    def wrap(name, attr):
        f = getattr(pl, attr)
        originals[attr] = f

        def w(*a, **k):
            t0 = time.time()
            r = f(*a, **k)
            times[name] = times.get(name, 0.0) + (time.time() - t0)
            return r

        setattr(pl, attr, w)

    wrap("extract", "_stage_extract_parse_abbrev")
    wrap("link", "_stage_link_canonicalize")
    wrap("link", "_stage_link_incremental")
    wrap("materialize", "_stage_materialize")
    wrap("materialize", "_stage_materialize_incremental")
    return originals


def restore(originals):
    import kgpipe.pipeline as pl

    for attr, f in originals.items():
        setattr(pl, attr, f)


def gen_open_world_pages(spark, n: int):
    """Open-entity-universe corpus: every page mints its OWN entities
    (plus scheme/www variants that exact-normalization merges within
    the page), so a delta of new pages introduces only new canon
    labels — the regime a daily web-crawl delta actually lives in.
    The stock fixture (gen_pages) draws subjects from a CLOSED 30k
    pool, so at probe scale every delta merges into existing
    components — the worst case for incremental materialize, measured
    separately."""
    import datetime as dt

    def _batch(batches):
        import html as _html

        import pandas as pd

        epoch = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
        for pdf in batches:
            idx = pdf["id"].astype(int)
            urls, tss, htmls, texts, langs = [], [], [], [], []
            for i in idx:
                i = int(i)
                e = f"http://site{i % 97}.example.org/entity/{i}"
                var = f"https://www.site{i % 97}.example.org/entity/{i}"
                t = f"http://site{i % 97}.example.org/topic/{i}"
                lines = [
                    f"<{e}> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.org/Class/{i % 50}> .",
                    f"<{e}> <http://www.w3.org/2002/07/owl#sameAs> <{var}> .",
                    f'<{e}> <http://xmlns.com/foaf/0.1/name> "entity {i}" .',
                    f"<{e}> <http://schema.org/about> <{t}> .",
                    f'<{t}> <http://purl.org/dc/terms/subject> "topic {i}" .',
                ]
                html = (
                    f"<html><head><title>Page {i}</title></head><body>"
                    f'<pre class="nt">{_html.escape(chr(10).join(lines))}</pre>'
                    "</body></html>"
                ).encode()
                urls.append(f"https://site{i % 97}.example.org/page/{i}")
                tss.append(epoch + dt.timedelta(seconds=i))
                htmls.append(html)
                texts.append("")
                langs.append("en")
            yield pd.DataFrame(
                {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
            )

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    par = spark.sparkContext.defaultParallelism
    return spark.range(0, n, 1, max(par * 2, 8)).mapInPandas(_batch, schema=schema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--open-world", action="store_true",
                    help="unique-entity corpus (append regime) instead of the "
                         "closed-pool fixture (merge regime)")
    ap.add_argument("--append", action="store_true", default=True)
    args = ap.parse_args()

    from kgpipe.fixtures import RULES_16_TEXT, gen_pages_spark
    from kgpipe.pipeline import PipelineConfig, run_pipeline
    from kgpipe.session import get_spark

    spark = get_spark(
        app_name="incprobe", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    workdir = os.path.join("/tmp", f"incprobe_{args.pages}")
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir)
    n_delta = max(1, int(args.pages * args.delta_pct / 100.0))
    base_dir = os.path.join(workdir, "base")
    all_dir = os.path.join(workdir, "all")
    print(f"staging corpus: {args.pages} base + {n_delta} delta pages", flush=True)
    # rows are pure functions of the index, so the base staging is a
    # strict prefix of the full one — the delta is exactly the new urls
    gen = gen_open_world_pages if args.open_world else gen_pages_spark
    gen(spark, args.pages).write.parquet(base_dir)
    gen(spark, args.pages + n_delta).write.parquet(all_dir)

    results = {}
    for mode in ("incremental", "full"):
        wh0 = os.path.join(workdir, f"wh_{mode}_seed")
        cfg0 = PipelineConfig(
            warehouse=wh0, rules_text=RULES_16_TEXT, mode="compat",
            n_parts=64, n_buckets=64, incremental_link=(mode == "incremental"),
        )
        print(f"[{mode}] base run ...", flush=True)
        run_pipeline(spark, spark.read.parquet(base_dir), cfg0)
        reps = []
        for rep in range(args.repeats):
            wh = os.path.join(workdir, f"wh_{mode}_r{rep}")
            shutil.rmtree(wh, ignore_errors=True)
            shutil.copytree(wh0, wh)
            cfg = PipelineConfig(
                warehouse=wh, rules_text=RULES_16_TEXT, mode="compat",
                n_parts=64, n_buckets=64, incremental_link=(mode == "incremental"),
            )
            load = wait_for_quiet()
            times: dict = {}
            originals = stage_timer(times)
            t0 = time.time()
            try:
                run_pipeline(spark, spark.read.parquet(all_dir), cfg)
            finally:
                restore(originals)
            times["total"] = time.time() - t0
            times["load"] = load
            reps.append({k: round(v, 2) for k, v in times.items()})
            print(f"[{mode}] rep{rep} {reps[-1]}", flush=True)
            shutil.rmtree(wh, ignore_errors=True)
        best = {
            k: min(r.get(k, float("inf")) for r in reps)
            for k in ("extract", "link", "materialize", "total")
        }
        results[mode] = {"reps": reps, "best": best}

    inc, full = results["incremental"]["best"], results["full"]["best"]
    summary = {
        "pages": args.pages,
        "delta_pct": args.delta_pct,
        "cpus": args.cpus,
        "materialize_full_s": full["materialize"],
        "materialize_inc_s": inc["materialize"],
        "materialize_speedup": round(full["materialize"] / max(inc["materialize"], 1e-9), 2),
        "link_full_s": full["link"],
        "link_inc_s": inc["link"],
        "link_mat_speedup": round(
            (full["link"] + full["materialize"]) / max(inc["link"] + inc["materialize"], 1e-9), 2
        ),
        "results": results,
    }
    print(json.dumps(summary))

    if args.append:
        lines = [
            "",
            f"### Incremental materialize probe — {args.pages:,} pages "
            f"({'open-world/append regime' if args.open_world else 'closed-pool fixture/merge regime'}), "
            f"{args.delta_pct}% delta, local[{args.cpus}] (best-of-{args.repeats}, load-gated)",
            "",
            "| stage (2nd run, delta applied) | full mode | incremental | speedup |",
            "|---|---|---|---|",
            f"| link + CC | {full['link']:.2f}s | {inc['link']:.2f}s | "
            f"{full['link'] / max(inc['link'], 1e-9):.2f}x |",
            f"| materialize (edge table) | {full['materialize']:.2f}s | "
            f"{inc['materialize']:.2f}s | {summary['materialize_speedup']:.2f}x |",
            f"| link+CC+materialize | {full['link'] + full['materialize']:.2f}s | "
            f"{inc['link'] + inc['materialize']:.2f}s | {summary['link_mat_speedup']:.2f}x |",
            "",
            f"(extract recompute, paid identically by both modes because new urls "
            f"scatter across hash partitions: full {full['extract']:.2f}s / "
            f"inc {inc['extract']:.2f}s. Per-rep: "
            f"{json.dumps({m: results[m]['reps'] for m in results})})",
        ]
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write("\n".join(lines) + "\n")
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
