"""Stage-level wall-time profile of the KG pipeline at bench size.

Usage: python tools/profile_pipeline.py [n_pages]
Separates the three checkpointed stages so a regression can be
attributed (extract/parse/abbrev vs link/CC vs materialize).
"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from kgpipe.session import get_spark
from kgpipe.fixtures import RULES_16_TEXT, gen_pages_spark
from kgpipe.pipeline import PipelineConfig, run_pipeline, _stage_extract_parse_abbrev, _stage_link_canonicalize, _stage_materialize, RAW_DDL, CMAP_DDL
from kgpipe.io import TableIO
from kgpipe.checkpoints import CheckpointLog
from kgpipe.nt.rules import parse_rules
from pyspark.sql import functions as F

_cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{_cpus}]", shuffle_partitions=max(_cpus, 8))
gen = tempfile.mkdtemp(prefix="pp_pages_")
wh = tempfile.mkdtemp(prefix="pp_wh_")
gen_pages_spark(spark, int(sys.argv[1]) if len(sys.argv) > 1 else 40000).write.mode("overwrite").parquet(gen)
pages = spark.read.parquet(gen)

io = TableIO(spark, wh); log = CheckpointLog(io); rules = parse_rules(RULES_16_TEXT)
cfg = PipelineConfig(warehouse=wh, rules_text=RULES_16_TEXT, mode="compat", n_parts=64, n_buckets=32)

t0=time.monotonic()
_stage_extract_parse_abbrev(spark, pages, cfg, io, log, rules)
t1=time.monotonic(); print(f"stage1 extract_parse_abbrev: {t1-t0:.2f}s")
triples = io.read("triples_raw", RAW_DDL).where(F.col("error").isNull())
_stage_link_canonicalize(spark, triples, cfg, io, log)
t2=time.monotonic(); print(f"stage2 link_canonicalize: {t2-t1:.2f}s")
cmap = io.read("canonical_map", CMAP_DDL)
_stage_materialize(spark, triples, cmap, cfg, io, log)
t3=time.monotonic(); print(f"stage3 materialize: {t3-t2:.2f}s")
n = io.read("edges").count()
t4=time.monotonic(); print(f"final count: {t4-t3:.2f}s edges={n} TOTAL={t4-t0:.2f}")
shutil.rmtree(gen, ignore_errors=True); shutil.rmtree(wh, ignore_errors=True)
spark.stop()
