"""Streaming: incremental exactly-once ingest and watermarked
windowed aggregation, driven as real streams (AvailableNow)."""

import collections
import os

from pyspark.sql import functions as F

from kgpipe.fixtures import RULES_16_TEXT, gen_pages
from kgpipe.streaming import (
    incremental_triples,
    run_windowed_stream,
    windowed_event_counts,
)


def test_incremental_ingest_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    batch1 = gen_pages(40)
    spark.createDataFrame(batch1).write.mode("append").parquet(pages_dir)
    n1 = incremental_triples(spark, pages_dir, out_dir, ckpt, RULES_16_TEXT, mode="compat")
    assert n1 >= 1
    count1 = spark.read.parquet(out_dir).where(F.col("s").isNotNull()).count()
    assert count1 > 0

    # rerun with NO new files → no new batches, output unchanged
    n2 = incremental_triples(spark, pages_dir, out_dir, ckpt, RULES_16_TEXT, mode="compat")
    assert spark.read.parquet(out_dir).where(F.col("s").isNotNull()).count() == count1

    # append 20 more pages → only those are processed
    batch2 = gen_pages(60).iloc[40:]
    spark.createDataFrame(batch2).write.mode("append").parquet(pages_dir)
    incremental_triples(spark, pages_dir, out_dir, ckpt, RULES_16_TEXT, mode="compat")
    count3 = spark.read.parquet(out_dir).where(F.col("s").isNotNull()).count()
    assert count3 > count1

    # multiset equality with a single batch run over all 60 pages
    clean_out = str(tmp_path / "clean")
    spark.createDataFrame(gen_pages(60)).write.parquet(clean_out + "_pages")
    incremental_triples(
        spark, clean_out + "_pages", clean_out, str(tmp_path / "ckpt2"), RULES_16_TEXT, mode="compat"
    )
    got = collections.Counter(
        (r.s, r.p, r.o) for r in spark.read.parquet(out_dir).where(F.col("s").isNotNull()).collect()
    )
    exp = collections.Counter(
        (r.s, r.p, r.o) for r in spark.read.parquet(clean_out).where(F.col("s").isNotNull()).collect()
    )
    assert got == exp


def test_windowed_stream_matches_batch(spark, tmp_path, sf_dir):
    # streaming file sources need a directory; stage the table file
    import shutil

    events_dir = str(tmp_path / "events")
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", events_dir)
    streamed = run_windowed_stream(spark, events_dir, str(tmp_path / "wck"))
    batch = windowed_event_counts(spark.read.parquet(events_dir))
    got = {tuple(r) for r in streamed.collect()}
    exp = {tuple(r) for r in batch.collect()}
    assert got == exp and len(got) > 0
