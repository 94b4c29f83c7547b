"""Streaming: incremental exactly-once ingest and watermarked
windowed aggregation, driven as real streams (AvailableNow)."""

import collections
import os

from pyspark.sql import functions as F

from kgpipe.fixtures import RULES_16_TEXT, gen_pages
from kgpipe.streaming import (
    incremental_triples,
    run_sessionize_stream,
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


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path, sf_dir):
    """Custom stateful operator (applyInPandasWithState): one
    AvailableNow batch delivers events in order per group, so the
    stream must equal the batch sessionizer exactly."""
    import shutil

    from kgpipe.operators.temporal import sessionize

    events_dir = str(tmp_path / "sev")
    os.makedirs(events_dir)
    shutil.copy(f"{sf_dir}/events.parquet", events_dir)
    streamed = run_sessionize_stream(
        spark, events_dir, str(tmp_path / "sout"), str(tmp_path / "sck")
    )
    batch = sessionize(
        spark.read.parquet(events_dir).select("user_id", "ts", "event_id"),
        gap_minutes=30, tiebreak_col="event_id",
    )
    got = {(r.user_id, r.event_id, r.session_seq) for r in streamed.collect()}
    exp = {(r.user_id, r.event_id, int(r.session_seq)) for r in batch.collect()}
    assert got == exp and len(got) > 0


def test_stateful_sessionize_state_survives_restart(spark, tmp_path):
    """New files in a later trigger continue each user's numbering
    from the persisted state store — the stateful analogue of
    exactly-once resume."""
    from pyspark.sql import Row

    events_dir = str(tmp_path / "sev2")
    out_dir = str(tmp_path / "sout2")
    ckpt = str(tmp_path / "sck2")

    def ev(eid, user, ts):
        return Row(event_id=eid, ts=ts, user_id=user, event_type="x", value=1.0, props="{}")

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    spark.createDataFrame([
        ev(1, 7, t0), ev(2, 7, t0 + 5 * m),           # session 1
        ev(3, 7, t0 + 120 * m),                        # session 2 (gap > 30m)
    ]).write.mode("append").parquet(events_dir)
    first = run_sessionize_stream(spark, events_dir, out_dir, ckpt)
    got1 = {(r.event_id, r.session_seq) for r in first.collect()}
    assert got1 == {(1, 1), (2, 1), (3, 2)}

    # later file: one event inside session 2's gap, one far beyond
    spark.createDataFrame([
        ev(4, 7, t0 + 125 * m),                        # still session 2
        ev(5, 7, t0 + 600 * m),                        # session 3
    ]).write.mode("append").parquet(events_dir)
    second = run_sessionize_stream(spark, events_dir, out_dir, ckpt)
    got2 = {(r.event_id, r.session_seq) for r in second.collect()}
    assert got2 == got1 | {(4, 2), (5, 3)}, "state must carry session counter and last_ts"


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


def test_epoch_write_idempotent_under_retry(spark, tmp_path):
    """foreachBatch is at-least-once: a batch that crashed after a
    (partial or complete) write is re-delivered with the same
    epoch_id. The epoch-partitioned dynamic overwrite must make the
    retry replace its own output, never duplicate it — and leave
    other epochs untouched."""
    from kgpipe.streaming import write_epoch_idempotent

    out = str(tmp_path / "epochs")
    rows0 = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2"), ("s3", "p", "o3")], "s string, p string, o string"
    )
    write_epoch_idempotent(rows0, out, epoch_id=0)
    # simulate a partial first attempt of epoch 1 (half the rows), then
    # the retry delivering the full batch again
    rows1 = spark.createDataFrame([("s4", "p", "o4"), ("s5", "p", "o5")], "s string, p string, o string")
    write_epoch_idempotent(rows1.limit(1), out, epoch_id=1)
    write_epoch_idempotent(rows1, out, epoch_id=1)  # retry: full batch
    # and a retry of an epoch that had fully committed
    write_epoch_idempotent(rows0, out, epoch_id=0)

    got = spark.read.parquet(out)
    assert got.count() == 5  # 3 + 2, no duplicates from either retry
    assert sorted(r.s for r in got.collect()) == ["s1", "s2", "s3", "s4", "s5"]
    per_epoch = {r.epoch_id: r.n for r in got.groupBy("epoch_id").agg(F.count("*").alias("n")).collect()}
    assert per_epoch == {0: 3, 1: 2}


def test_dedup_stream_first_arrival_across_triggers(spark, tmp_path):
    """Stateful streaming dedup: each fingerprint is emitted exactly
    once — the first trigger that contains it wins, later files with
    the same fingerprint add nothing, and new fingerprints in later
    files still come through."""
    from kgpipe.streaming import run_dedup_stream

    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    spark.createDataFrame(
        [(1, "fpA", "first A"), (2, "fpB", "first B"), (3, "fpA", "dup A same batch")],
        "doc_id long, fingerprint string, text string",
    ).write.mode("append").parquet(docs_dir)
    first = run_dedup_stream(spark, docs_dir, out_dir, ckpt)
    got1 = {(r.fingerprint) for r in first.collect()}
    assert got1 == {"fpA", "fpB"}
    assert first.count() == 2

    # second batch: a cross-trigger duplicate and a new key
    spark.createDataFrame(
        [(4, "fpB", "dup B later trigger"), (5, "fpC", "first C")],
        "doc_id long, fingerprint string, text string",
    ).write.mode("append").parquet(docs_dir)
    second = run_dedup_stream(spark, docs_dir, out_dir, ckpt)
    rows = {r.fingerprint: r.doc_id for r in second.collect()}
    assert set(rows) == {"fpA", "fpB", "fpC"}
    assert rows["fpC"] == 5
    assert rows["fpB"] == 2  # the first-trigger row, not the later duplicate
    assert second.count() == 3


def test_migrate_epoch_layout_enables_idempotence(spark, tmp_path):
    """One-shot migration: flat pre-epoch files move into an
    epoch_id=-1 partition, the legacy guard stops firing, and a
    retried epoch written afterwards replaces itself instead of
    appending — the flat layout's at-least-once caveat is retired."""
    from kgpipe.streaming import (
        _has_flat_parquet,
        migrate_epoch_layout,
        write_epoch_idempotent,
    )

    out_dir = str(tmp_path / "legacy_out")
    legacy = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2")], "s string, p string, o string"
    )
    legacy.write.mode("append").parquet(out_dir)      # pre-epoch flat layout
    legacy.write.mode("append").parquet(out_dir)      # at-least-once era: 4 rows
    assert _has_flat_parquet(spark, out_dir)

    moved = migrate_epoch_layout(spark, out_dir)
    assert moved >= 1
    assert not _has_flat_parquet(spark, out_dir)
    after = spark.read.parquet(out_dir)
    assert after.count() == 4, "migration must move rows, not rewrite them"
    assert {r.epoch_id for r in after.select("epoch_id").distinct().collect()} == {-1}
    # idempotent: nothing left to move
    assert migrate_epoch_layout(spark, out_dir) == 0

    # a retried epoch in the migrated dir replaces its own partition
    rows = spark.createDataFrame([("s3", "p", "o3")], "s string, p string, o string")
    write_epoch_idempotent(rows, out_dir, epoch_id=7)
    write_epoch_idempotent(rows, out_dir, epoch_id=7)  # re-delivery
    got = spark.read.parquet(out_dir)
    assert got.count() == 5
    assert got.where(F.col("epoch_id") == 7).count() == 1


def test_dedup_stream_epoch_layout_retry_safe(spark, tmp_path):
    """run_dedup_stream's sink contract: output lands in epoch_id=N
    partitions, so a foreachBatch re-delivery of an epoch (simulated
    by re-writing its rows under the same id) leaves the table
    unchanged instead of duplicating."""
    from kgpipe.streaming import run_dedup_stream, write_epoch_idempotent

    docs_dir = str(tmp_path / "rdocs")
    out_dir = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rck")
    spark.createDataFrame(
        [(1, "fpA", "a"), (2, "fpB", "b")],
        "doc_id long, fingerprint string, text string",
    ).write.mode("append").parquet(docs_dir)
    first = run_dedup_stream(spark, docs_dir, out_dir, ckpt)
    assert first.count() == 2
    assert "epoch_id" not in first.columns

    full = spark.read.parquet(out_dir)
    epochs = [r.epoch_id for r in full.select("epoch_id").distinct().collect()]
    assert epochs, "dedup stream must write the epoch-partitioned layout"
    eid = epochs[0]
    replay = full.where(F.col("epoch_id") == eid).drop("epoch_id")
    write_epoch_idempotent(replay, out_dir, eid)       # simulated re-delivery
    assert spark.read.parquet(out_dir).count() == 2, "retry must not duplicate"


def test_dedup_stream_continues_legacy_file_sink_output(spark, tmp_path):
    """An out_dir written by the old FILE-SINK path carries a
    _spark_metadata log; readers resolve through it, so epoch_id=N/
    dirs written next to it would be invisible. run_dedup_stream must
    detect the log and keep appending through the file sink — new
    rows stay visible in the cumulative output."""
    from kgpipe.streaming import _has_file_sink_log, run_dedup_stream

    docs_dir = str(tmp_path / "ldocs")
    out_dir = str(tmp_path / "lout")
    ckpt = str(tmp_path / "lck")
    spark.createDataFrame(
        [(1, "fpA", "a")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs_dir)

    # fabricate the legacy era: first run through the FILE sink
    schema = spark.read.parquet(docs_dir).schema
    from kgpipe.streaming import dedup_stream

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    q = (
        dedup_stream(spark.readStream.schema(schema).parquet(docs_dir), "fingerprint", ddl)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _has_file_sink_log(spark, out_dir)
    assert spark.read.parquet(out_dir).count() == 1

    # new files + the NEW runner: rows must not vanish behind the log
    spark.createDataFrame(
        [(2, "fpB", "b")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs_dir)
    out = run_dedup_stream(spark, docs_dir, out_dir, ckpt)
    assert {r.fingerprint for r in out.collect()} == {"fpA", "fpB"}
    assert out.count() == 2


def test_migrate_epoch_layout_file_sink_dir(spark, tmp_path):
    """Migrating a FILE-SINK output: committed files move into
    epoch_id=-1, files the log never committed (crashed-batch
    leftovers) are deleted rather than resurrected, and the log is
    removed so plain partition discovery takes over."""
    import glob
    import shutil

    from kgpipe.streaming import _has_file_sink_log, migrate_epoch_layout

    src_dir = str(tmp_path / "msrc")
    out_dir = str(tmp_path / "mout")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, v string"
    ).write.parquet(src_dir)
    q = (
        spark.readStream.schema("id long, v string").parquet(src_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "mck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert _has_file_sink_log(spark, out_dir)
    n_committed = spark.read.parquet(out_dir).count()

    # plant an uncommitted leftover: a parquet file the log never saw
    committed_file = glob.glob(f"{out_dir}/part-*.parquet")[0]
    shutil.copy(committed_file, f"{out_dir}/part-99999-uncommitted.parquet")

    moved = migrate_epoch_layout(spark, out_dir)
    assert moved >= 1
    assert not _has_file_sink_log(spark, out_dir)
    after = spark.read.parquet(out_dir)
    assert after.count() == n_committed, "uncommitted leftovers must not resurrect"
    assert {r.epoch_id for r in after.select("epoch_id").distinct().collect()} == {-1}


def test_dedup_stream_state_ttl_readmits(spark, tmp_path):
    """TTL-horizon dedup: an arrival more than the TTL after its
    key's first-seen time is re-admitted as a fresh first arrival
    (lazy expiry on arrival — processing-time timer eviction cannot
    terminate under AvailableNow; see the dedup_stream docstring),
    while duplicates WITHIN the horizon stay suppressed."""
    import time

    from kgpipe.streaming import run_dedup_stream

    docs_dir = str(tmp_path / "tdocs")
    out_dir = str(tmp_path / "tout")
    ckpt = str(tmp_path / "tck")
    ttl = 2.0 / 60.0  # 2 seconds

    # stream X — tiny horizon: a post-horizon arrival re-admits
    spark.createDataFrame(
        [(1, "fpA", "first A")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs_dir)
    first = run_dedup_stream(spark, docs_dir, out_dir, ckpt, state_ttl_minutes=ttl)
    assert first.count() == 1

    time.sleep(3.0)  # let fpA's horizon pass
    spark.createDataFrame(
        [(2, "fpA", "A again")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs_dir)
    second = run_dedup_stream(spark, docs_dir, out_dir, ckpt, state_ttl_minutes=ttl)
    rows = sorted((r.doc_id, r.fingerprint) for r in second.collect())
    assert rows == [(1, "fpA"), (2, "fpA")], (
        "post-horizon arrival must re-emit as a fresh first arrival"
    )

    # stream Y — long horizon (≫ stream-restart latency): duplicates
    # across triggers stay suppressed
    docs2 = str(tmp_path / "tdocs2")
    out2 = str(tmp_path / "tout2")
    ckpt2 = str(tmp_path / "tck2")
    spark.createDataFrame(
        [(1, "fpB", "first B")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs2)
    run_dedup_stream(spark, docs2, out2, ckpt2, state_ttl_minutes=10.0)
    spark.createDataFrame(
        [(2, "fpB", "dup B")], "doc_id long, fingerprint string, text string"
    ).write.mode("append").parquet(docs2)
    y = run_dedup_stream(spark, docs2, out2, ckpt2, state_ttl_minutes=10.0)
    assert [(r.doc_id, r.fingerprint) for r in y.collect()] == [(1, "fpB")]


def test_dedup_stream_ttl_uses_data_arrival_clock(spark, tmp_path):
    """ADVICE: wall-clock TTL evaluation makes epoch replays
    non-deterministic. With arrival_ts_col, horizon decisions derive
    from BATCH-STABLE data: a post-horizon DATA timestamp re-admits
    even though almost no wall time passed, and an in-horizon data
    timestamp stays suppressed — replay of either epoch reproduces
    the same row set."""
    from kgpipe.streaming import run_dedup_stream

    docs_dir = str(tmp_path / "ddocs")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dck")
    ddl = "doc_id long, fingerprint string, fetch_ts double"

    spark.createDataFrame(
        [(1, "fpA", 1000.0), (2, "fpB", 1000.0)], ddl
    ).write.mode("append").parquet(docs_dir)
    first = run_dedup_stream(
        spark, docs_dir, out_dir, ckpt,
        state_ttl_minutes=10.0, arrival_ts_col="fetch_ts",
    )
    assert first.count() == 2

    # no wall-clock wait: fpA arrives 601 data-seconds later (past the
    # 10-minute horizon) → re-admitted; fpB 10 data-seconds later →
    # suppressed
    spark.createDataFrame(
        [(3, "fpA", 1601.0), (4, "fpB", 1010.0)], ddl
    ).write.mode("append").parquet(docs_dir)
    second = run_dedup_stream(
        spark, docs_dir, out_dir, ckpt,
        state_ttl_minutes=10.0, arrival_ts_col="fetch_ts",
    )
    rows = sorted((r.doc_id, r.fingerprint) for r in second.collect())
    assert rows == [(1, "fpA"), (2, "fpB"), (3, "fpA")]


def test_dedup_stream_timer_eviction_removes_expired_state(spark, tmp_path):
    """Timer-based TTL eviction under a processingTime trigger (the
    continuous deployment the lazy-TTL docstring promised): keys that
    never return leave the state store once their TTL timer fires —
    state size is bounded by the horizon, not by all keys ever seen —
    and a later arrival of an evicted key is re-admitted exactly like
    the lazy path would."""
    from kgpipe.streaming import run_dedup_stream_continuous

    docs_dir = str(tmp_path / "edocs")
    out_dir = str(tmp_path / "eout")
    ckpt = str(tmp_path / "eck")
    ddl = "doc_id long, fingerprint string, text string"
    ttl = 2.0 / 60.0  # 2 seconds

    spark.createDataFrame(
        [(1, "fpA", "a"), (2, "fpB", "b")], ddl
    ).write.mode("append").parquet(docs_dir)
    # ONE query stays alive; stop as soon as the state store drains
    # (generous deadline — a wall-clock window is too fragile on this
    # loaded shared host, which is exactly what stop_when is for)
    def state_empty():
        # output first: an empty checkpoint also reads as 0 state rows,
        # which must not stop the query before the data batch commits
        if spark.read.parquet(out_dir).count() < 2:
            return False
        return spark.read.format("statestore").load(ckpt).count() == 0

    first = run_dedup_stream_continuous(
        spark, docs_dir, out_dir, ckpt,
        state_ttl_minutes=ttl, run_for_s=90.0, stop_when=state_empty,
    )
    assert first.count() == 2
    assert state_empty(), "expired keys must leave the state store"

    # semantics unchanged: an evicted key re-admits as fresh
    spark.createDataFrame([(3, "fpA", "a2")], ddl).write.mode("append").parquet(docs_dir)

    def readmitted():
        out = spark.read.parquet(out_dir)
        return out.where(out.doc_id == 3).count() == 1

    second = run_dedup_stream_continuous(
        spark, docs_dir, out_dir, ckpt,
        state_ttl_minutes=ttl, run_for_s=60.0, stop_when=readmitted,
    )
    rows = sorted((r.doc_id, r.fingerprint) for r in second.collect())
    assert rows == [(1, "fpA"), (2, "fpB"), (3, "fpA")]


def test_dedup_stream_rejects_data_clock_with_timer_eviction(spark):
    """ADVICE r5: TTL suppression on data time + eviction timers on
    processing wall time can evict keys still inside their data-time
    horizon (slow replay) and re-emit duplicates — the combination is
    rejected outright."""
    import pytest as _pytest

    from kgpipe.streaming import dedup_stream

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "doc_id long, fingerprint string, fetch_ts double"
    )
    with _pytest.raises(ValueError, match="incompatible"):
        dedup_stream(
            df, "fingerprint", "doc_id long, fingerprint string, fetch_ts double",
            state_ttl_minutes=1.0, arrival_ts_col="fetch_ts", timer_eviction=True,
        )
