"""Order-insensitive value hash of every declared query's output —
the equivalence harness for the optimization round: snapshot before a
change, re-run after, diff. Mirrors the driver's check (sorted column
names, row-set hash).

Usage: python tools/result_hashes.py out.json [sf_dir ...] [--only q1,q2]
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgpipe.session import get_spark  # noqa: E402


def df_hash(df) -> tuple[str, int, str]:
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    def norm(v):
        if isinstance(v, float):
            return f"{v!r}"
        return repr(v)
    lines = sorted("|".join(norm(v) for v in row) for row in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, len(rows), ",".join(cols)


def main() -> None:
    out_path = sys.argv[1]
    args = sys.argv[2:]
    only = set()
    sf_dirs = []
    for a in args:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))
        else:
            sf_dirs.append(a)
    if not sf_dirs:
        sf_dirs = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="kgpipe-result-hashes", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as em

    q = em.queries()
    out: dict = {}
    for sf_dir in sf_dirs:
        key = os.path.basename(sf_dir.rstrip("/"))
        out[key] = {}
        for name, fn in q.items():
            if only and name not in only:
                continue
            try:
                h, n, cols = df_hash(fn(spark, sf_dir))
                out[key][name] = {"hash": h, "rows": n, "cols": cols}
            except Exception as e:
                out[key][name] = {"error": str(e)[:300]}
            print(f"{key}/{name}: {out[key][name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
