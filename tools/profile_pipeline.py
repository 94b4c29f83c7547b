"""Stage-level wall-time profile of the KG pipeline at bench size.

Usage: python tools/profile_pipeline.py [n_pages]
   or: SPARK_GRAFT_CORPUS=/path/to/pages.parquet python tools/profile_pipeline.py
(the env form reuses a pre-staged corpus — required for low-core
attribution runs where regenerating 600k pages on local[2] would
dwarf the measurement)
Separates every component of run_pipeline so a bench regression can
be attributed: the r5 additions to the NON-incremental path (source
manifest, run-marker read/write) are timed individually alongside
the three checkpointed stages, the shared triples fingerprint, the
result-materializing counts the bench pays (triples.count(),
edges.count()) and the counter collection.
"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kgpipe.session import get_spark
from kgpipe.fixtures import RULES_16_TEXT, gen_pages_spark
from kgpipe.pipeline import (
    PipelineConfig, run_pipeline, _stage_extract_parse_abbrev,
    _stage_link_canonicalize, _stage_materialize, _source_manifest,
    _triples_fingerprint, _collect_counters, _read_edges, RAW_DDL, CMAP_DDL,
)
from kgpipe.io import TableIO
from kgpipe.checkpoints import CheckpointLog
from kgpipe.nt.rules import parse_rules
from pyspark.sql import functions as F

_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{_cpus}]", shuffle_partitions=max(_cpus, 8))
wh = tempfile.mkdtemp(prefix="pp_wh_")
gen = os.environ.get("SPARK_GRAFT_CORPUS")
owns_gen = gen is None
if owns_gen:
    gen = tempfile.mkdtemp(prefix="pp_pages_")
    gen_pages_spark(spark, int(sys.argv[1]) if len(sys.argv) > 1 else 40000).write.mode("overwrite").parquet(gen)
pages = spark.read.parquet(gen)

io = TableIO(spark, wh); log = CheckpointLog(io); rules = parse_rules(RULES_16_TEXT)
cfg = PipelineConfig(warehouse=wh, rules_text=RULES_16_TEXT, mode="compat", n_parts=64, n_buckets=32)

# WARM UP untimed: the session's first pipeline pays JIT/codegen/
# first-touch costs that belong to no stage (measured: a cold
# per-stage pass reads 5x slower than the warm end-to-end run that
# follows it) — the bench protocol itself is warm best-of-N
whw = tempfile.mkdtemp(prefix="pp_warm_")
run_pipeline(spark, pages, PipelineConfig(warehouse=whw, rules_text=RULES_16_TEXT, mode="compat", n_parts=64, n_buckets=32))
shutil.rmtree(whw, ignore_errors=True)
while os.getloadavg()[0] >= float(os.environ.get("SPARK_GRAFT_BENCH_LOADGATE", "3.0")):
    time.sleep(5)
print(f"load at profile start: {os.getloadavg()[0]:.2f}", flush=True)

marks = [("start", time.monotonic())]
def mark(name):
    marks.append((name, time.monotonic()))
    print(f"{name}: {marks[-1][1]-marks[-2][1]:.2f}s", flush=True)

_source_manifest(pages); io.read_json("run_manifest.json")
mark("source_manifest+marker_read")
_stage_extract_parse_abbrev(spark, pages, cfg, io, log, rules)
mark("stage1 extract_parse_abbrev")
triples = io.read("triples_raw", RAW_DDL).where(F.col("error").isNull())
fp = _triples_fingerprint(triples)
mark("triples_fingerprint")
_stage_link_canonicalize(spark, triples, cfg, io, log, fp=fp)
mark("stage2 link_canonicalize")
cmap = io.read("canonical_map", CMAP_DDL)
_stage_materialize(spark, triples, cmap, cfg, io, log, fp=fp)
mark("stage3 materialize")
edges = _read_edges(io)
_collect_counters(io, log)
mark("collect_counters")
nt = triples.count(); ne = edges.count()
mark("bench counts (triples+edges)")
print(f"TOTAL={marks[-1][1]-marks[0][1]:.2f}s triples={nt} edges={ne}", flush=True)

# end-to-end comparison: the real entry point on a FRESH warehouse
wh2 = tempfile.mkdtemp(prefix="pp_wh2_")
cfg2 = PipelineConfig(warehouse=wh2, rules_text=RULES_16_TEXT, mode="compat", n_parts=64, n_buckets=32)
t0 = time.monotonic()
res = run_pipeline(spark, pages, cfg2)
res.triples.count(); res.edges.count()
print(f"run_pipeline end-to-end (fresh wh): {time.monotonic()-t0:.2f}s", flush=True)
for d in ([gen] if owns_gen else []) + [wh, wh2]:
    shutil.rmtree(d, ignore_errors=True)
spark.stop()
