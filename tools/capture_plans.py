"""Capture .explain("formatted") for every declared query into
plans/r08/<query>_<tag>.txt (guide §1: record the plan shape before
and after each optimization).

Usage: python tools/capture_plans.py <tag> [query ...]
  tag    = before | after
  query  = optional subset; default captures every declared query.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgpipe.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="kgpipe-plans", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as em

    q = em.queries()
    names = [n for n in q if not only or n in only]
    for name in names:
        try:
            df = q[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # capture failures visibly, don't abort the sweep
            plan = f"ERROR building plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"captured {name}_{tag}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
