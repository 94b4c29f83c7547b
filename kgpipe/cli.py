"""spark-submit entry point.

    spark-submit --py-files kgpipe.zip -m ... main: python -m kgpipe.cli \\
        run --pages /data/pages --warehouse /data/wh [--rules RULES] \\
        [--mode lpm|compat] [--parts 4096] [--buckets 1024] [--explain]

Subcommands mirror the reference CLI surface
(/root/reference/cmd/ntto/ntto.go:66-76) where it makes sense:
  run        — full pipeline (ntto's -a -j composition, generalized)
  dump-rules — print the active rule table, sorted (ntto -d)
  explain    — print the physical plan of the extract stage without
               running it (ntto -c printed its shell command)
  incremental— process only new pages files (streaming AvailableNow)
`-w`-style parallelism is owned by spark-submit (--master local[N] /
executor count), not by this CLI.
"""

from __future__ import annotations

import argparse
import sys


def _load_rules(path: str | None) -> str:
    if path:
        with open(path) as f:
            return f.read()
    from kgpipe.fixtures import RULES_16_TEXT

    return RULES_16_TEXT


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kgpipe")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run the full KG pipeline")
    run.add_argument("--pages", required=True, help="parquet dir of pages")
    run.add_argument("--warehouse", required=True)
    run.add_argument("--rules", default=None, help="rules file (default: embedded 16)")
    run.add_argument("--mode", choices=["lpm", "compat"], default="lpm")
    run.add_argument("--parts", type=int, default=256)
    run.add_argument("--buckets", type=int, default=64)
    run.add_argument("--no-neardup", action="store_true")
    run.add_argument("--explain", action="store_true", help="print plans, do not execute")

    dr = sub.add_parser("dump-rules", help="print active rules, sorted")
    dr.add_argument("--rules", default=None)

    inc = sub.add_parser("incremental", help="ingest only new pages files")
    inc.add_argument("--pages", required=True)
    inc.add_argument("--out", required=True)
    inc.add_argument("--checkpoint", required=True)
    inc.add_argument("--rules", default=None)
    inc.add_argument("--mode", choices=["lpm", "compat"], default="lpm")

    args = ap.parse_args(argv)

    if args.cmd == "dump-rules":
        from kgpipe.nt.rules import dump_rules, parse_rules

        print(dump_rules(parse_rules(_load_rules(args.rules))))
        return 0

    from kgpipe.session import get_spark

    spark = get_spark(app_name=f"kgpipe-{args.cmd}")
    try:
        if args.cmd == "run":
            from kgpipe.pipeline import PipelineConfig, run_pipeline

            pages = spark.read.parquet(args.pages)
            cfg = PipelineConfig(
                warehouse=args.warehouse,
                rules_text=_load_rules(args.rules),
                mode=args.mode,
                n_parts=args.parts,
                n_buckets=args.buckets,
                neardup_link=not args.no_neardup,
            )
            if args.explain:
                from kgpipe.nt.rules import parse_rules
                from kgpipe.operators.abbrev import abbreviate_columns
                from kgpipe.operators.extract import with_extracted_text
                from kgpipe.operators.parse import parse_pages_to_triples

                chain = abbreviate_columns(
                    parse_pages_to_triples(with_extracted_text(pages.select("url", "html"))),
                    ["s", "p", "o"],
                    parse_rules(cfg.rules_text),
                    mode=cfg.mode,
                )
                chain.explain("formatted")
                return 0
            res = run_pipeline(spark, pages, cfg)
            print({"counters": res.counters})
            return 0

        if args.cmd == "incremental":
            from kgpipe.streaming import incremental_triples

            n = incremental_triples(
                spark, args.pages, args.out, args.checkpoint,
                _load_rules(args.rules), mode=args.mode,
            )
            print({"batches": n})
            return 0
    finally:
        spark.stop()
    return 1


if __name__ == "__main__":
    sys.exit(main())
