"""Structured-Streaming surfaces for the pipeline.

The batch pipeline's source is an append-only pages table, and every
narrow stage is a pure function of the row — which makes incremental
processing exactly Spark's AvailableNow model: each invocation
processes only files that arrived since the last streaming
checkpoint, then stops. This complements the batch checkpoint table
(kgpipe.checkpoints): that one fingerprints logical partitions for
idempotent re-RUNS; the streaming checkpoint tracks INPUT FILES for
incremental ingest. (The reference is strictly one-shot batch —
SURVEY.md §2b Streaming: none.)

Also provides a watermarked windowed aggregation over an event
stream (late-data tolerant) — the standard streaming-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _has_flat_parquet(spark: SparkSession, out_dir: str) -> bool:
    """True iff out_dir exists and holds parquet files directly at its
    root (the pre-epoch flat layout). Hadoop-FS so it works on any
    cluster filesystem."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return False
    for st in fs.listStatus(p):
        if st.isFile() and st.getPath().getName().endswith(".parquet"):
            return True
    return False


def _has_file_sink_log(spark: SparkSession, out_dir: str) -> bool:
    """True iff out_dir carries a Spark FILE-SINK transaction log
    (_spark_metadata). Such a directory is read THROUGH the log
    (FileStreamSink.hasMetadata → MetadataLogFileIndex): files the
    log doesn't list — including epoch_id=N/ partitions a foreachBatch
    sink would add — are invisible to every reader, so epoch-layout
    writes must never be mixed into it."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(out_dir, "_spark_metadata")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def write_epoch_idempotent(rows: DataFrame, out_dir: str, epoch_id: int) -> None:
    """Sink-side idempotence for foreachBatch (which is AT-LEAST-once:
    a batch that fails after a partial — or complete — write is
    re-delivered with the SAME epoch_id). Each epoch lands in its own
    `epoch_id=<id>` partition via dynamic partition overwrite, so a
    retry REPLACES exactly its own partition's files instead of
    appending duplicates; other epochs' partitions are untouched."""
    from pyspark.sql import functions as F

    (
        rows.withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(out_dir)
    )


def migrate_epoch_layout(spark: SparkSession, out_dir: str) -> int:
    """One-shot migration of a pre-epoch FLAT output directory into
    the epoch-partitioned layout: every parquet file at the root
    MOVES (a rename — no rewrite; the epoch value lives in the
    directory name, not in the files) into an `epoch_id=-1/`
    partition. After migration the legacy-flat guard in
    incremental_triples no longer fires, so subsequent runs write
    retry-idempotent `epoch_id=N` partitions — the at-least-once
    caveat the flat layout carried is retired. -1 can never collide
    with a real foreachBatch epoch id.

    Directories written by a Spark FILE SINK (a _spark_metadata
    transaction log at the root — e.g. pre-round-4 run_dedup_stream
    outputs) are handled log-aware: only files the log COMMITTED are
    moved, files the log does not list are uncommitted leftovers of
    crashed batches and are deleted (moving them would resurrect
    exactly the duplicates the log existed to hide), and the log
    itself is removed afterwards so readers fall back to normal
    partition discovery over the epoch layout.

    Idempotent and crash-resumable: a migration that dies mid-way
    leaves some files moved and some flat; re-running moves the rest.
    Run it OFFLINE (between jobs): while files are mid-move the
    directory holds a mixed layout that breaks partition discovery
    for concurrent readers, and any epoch of a crashed PRIOR run that
    has not committed to the streaming checkpoint yet would replay
    after migration and duplicate its flat-era rows — migrate only
    when the last run completed. Returns the number of files moved."""
    import os as _os

    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(out_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return 0
    meta = jvm.org.apache.hadoop.fs.Path(root, "_spark_metadata")
    committed: set[str] | None = None
    if fs.exists(meta):
        # the log is the source of truth while it exists — resolve the
        # committed file set THROUGH it before touching anything
        committed = {
            _os.path.basename(f) for f in spark.read.parquet(out_dir).inputFiles()
        }
    dest = jvm.org.apache.hadoop.fs.Path(root, "epoch_id=-1")
    moved = 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet"):
            if committed is not None and name not in committed:
                fs.delete(st.getPath(), False)  # uncommitted garbage
                continue
            if moved == 0:
                fs.mkdirs(dest)
            if not fs.rename(st.getPath(), jvm.org.apache.hadoop.fs.Path(dest, name)):
                raise IOError(f"migrate_epoch_layout: rename of {name} failed")
            moved += 1
    if committed is not None:
        fs.delete(meta, True)
    return moved


def incremental_triples(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    rules_text: str,
    mode: str = "lpm",
) -> int:
    """Process pages files not yet seen by the streaming checkpoint:
    extract → parse → abbreviate → write to out_dir. Returns the
    number of batches processed (0 ⇒ nothing new). Exactly-once per
    input file via the checkpoint, and exactly-once per OUTPUT row
    via epoch-partitioned dynamic overwrite (write_epoch_idempotent) —
    a foreachBatch retry after a crash rewrites its own epoch
    partition instead of duplicating it."""
    from kgpipe.nt.rules import parse_rules
    from kgpipe.operators.abbrev import abbreviate_columns
    from kgpipe.operators.extract import with_extracted_text
    from kgpipe.operators.parse import parse_pages_to_triples

    rules = parse_rules(rules_text)
    stream = spark.readStream.schema(PAGES_DDL).parquet(pages_dir)

    # migration guard: an out_dir written by the pre-epoch layout has
    # flat part-*.parquet files at the root; mixing epoch_id=N/
    # directories into it breaks partition discovery for every reader
    # ("conflicting directory structures"). Keep appending flat there
    # (the documented at-least-once legacy behavior); fresh outputs
    # get the idempotent epoch layout. Retire the caveat with a
    # one-shot offline `migrate_epoch_layout(spark, out_dir)`.
    legacy_flat = _has_flat_parquet(spark, out_dir)

    n_batches = {"n": 0}

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        rows = abbreviate_columns(
            parse_pages_to_triples(with_extracted_text(batch_df)),
            ["s", "p", "o"],
            rules,
            mode=mode,
        )
        if legacy_flat:
            rows.write.mode("append").parquet(out_dir)
        else:
            write_epoch_idempotent(rows, out_dir, epoch_id)
        n_batches["n"] += 1

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming-ready windowed aggregation: watermark bounds state
    and admits late rows up to the horizon. Works identically on a
    batch DataFrame (watermark is a no-op there), which is how the
    oracle checks it."""
    # parquet timestamps read as TIMESTAMP_NTZ; watermarks require an
    # event-time TIMESTAMP (session TZ is pinned UTC so this is exact)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


# state schemas per mode: the legacy 1-field shape is KEPT for
# non-TTL streams so checkpoints created before the TTL feature
# restart cleanly (a widened state schema fails Spark's state
# compatibility check and would force discarding all dedup state);
# TTL mode — new surface, no legacy checkpoints — carries first_seen
DEDUP_STATE_DDL = "n_seen long"
DEDUP_TTL_STATE_DDL = "n_seen long, first_seen_ms long"


def dedup_stream(
    df: DataFrame,
    key_col: str,
    output_ddl: str,
    state_ttl_minutes: float | None = None,
    arrival_ts_col: str | None = None,
    timer_eviction: bool = False,
) -> DataFrame:
    """Custom STATEFUL streaming operator: exact first-arrival
    deduplication across micro-batches via applyInPandasWithState,
    keyed by a fingerprint column. The FIRST row of each key ever
    seen is emitted; every later row (same batch or any later
    trigger) is dropped, with a per-key duplicate counter carried in
    the state store.

    The streaming-native counterpart of
    kgpipe.operators.dedup.exact_dedup (which keeps min doc_id —
    a retrospective batch contract); a stream cannot know a future
    smaller id, so its contract is first-ARRIVAL-wins, the standard
    incremental-ingest dedup semantics. State is one long per
    distinct key: at 10^10 distinct documents that is tens of GB
    spread across the state store's partitions — the same order as
    Spark's own dropDuplicates state, but with an inspectable count
    and no watermark requirement.

    output_ddl must name the input columns (the emitted row is the
    first-arriving input row, unchanged).

    state_ttl_minutes bounds the DEDUP HORIZON for unbounded key
    spaces: an arrival more than the TTL after its key's first-seen
    time is re-admitted as a fresh first arrival (emitted again, the
    horizon restarts). Expiry is evaluated LAZILY on arrival; with
    timer_eviction=True (requires a processingTime/continuous
    trigger — ProcessingTimeTimeout cannot terminate under
    AvailableNow, where it busy-loops empty timeout-sweep batches)
    keys additionally get a processing-time TIMER of one TTL per
    arrival, and a firing timer REMOVES the key's state row — so
    never-returning keys leave the state store instead of persisting
    forever. Suppression/re-admission decisions stay data-driven
    (identical either way); the timer only bounds state size, and it
    fires at last-arrival+TTL ≥ first-seen+TTL, so it never evicts a
    key still inside its horizon. None (default) = exact
    forever-dedup, whose state is one row per distinct key by
    definition (and keeps the pre-TTL 1-field state schema, so
    existing checkpoints restart unchanged); 0 = every arrival
    re-admits.

    arrival_ts_col names a numeric epoch-SECONDS column used as the
    arrival clock for TTL decisions. Expiry then derives from BATCH-
    STABLE data: a foreachBatch epoch replayed after checkpoint
    recovery evaluates the horizon identically and re-emits the exact
    row set into its replaced epoch_id partition, preserving the
    exactly-once-per-output-row contract. Without it the arrival
    clock is executor wall time, and a replay that crosses a TTL
    boundary can legitimately differ — pass the column for replay-
    stable TTL semantics.

    arrival_ts_col and timer_eviction are mutually EXCLUSIVE: TTL
    suppression would then run on data time while the eviction timer
    fires on processing wall time, so a backlog replayed slower than
    one TTL would evict state for keys still inside their data-time
    horizon and re-emit a later in-horizon arrival as a duplicate —
    breaking both the 'never evicts a key still inside its horizon'
    guarantee and the replay stability arrival_ts_col exists for.
    Timers are therefore only armed when the arrival clock IS wall
    time (the default); passing both raises."""
    import time as _time

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cols = df.columns
    ttl_ms = (
        int(state_ttl_minutes * 60_000) if state_ttl_minutes is not None else None
    )
    if timer_eviction and ttl_ms is None:
        raise ValueError("timer_eviction requires state_ttl_minutes")
    if timer_eviction and arrival_ts_col is not None:
        raise ValueError(
            "timer_eviction is incompatible with arrival_ts_col: the eviction "
            "timer fires on processing wall time while TTL suppression would "
            "run on data time, so a replay slower than one TTL could evict "
            "keys still inside their data-time horizon and re-emit duplicates"
        )
    if arrival_ts_col is not None and arrival_ts_col not in cols:
        raise ValueError(f"arrival_ts_col {arrival_ts_col!r} not in input columns")

    def fn(key, pdfs, state: GroupState):
        if timer_eviction and state.hasTimedOut:
            # one TTL passed since the key's LAST arrival → the
            # horizon since first-seen has certainly passed: drop the
            # state row (a future arrival is a fresh first arrival,
            # exactly what the lazy path would have concluded)
            state.remove()
            return
        # stream the chunks: a degenerate hot key (boilerplate
        # fingerprint with millions of duplicates in one trigger) must
        # never be concatenated into a single pandas frame — count and
        # keep one candidate row per chunk instead
        n_new = 0
        best = None
        max_ts_ms = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_new += len(pdf)
            # deterministic winner within the first-containing batch
            # (chunk order is not stable): running lexicographic min
            cand = pdf.sort_values(cols).iloc[:1]
            best = (
                cand
                if best is None
                else pd.concat([best, cand]).sort_values(cols).iloc[:1]
            )
            if arrival_ts_col is not None:
                m = int(float(pdf[arrival_ts_col].max()) * 1000)
                max_ts_ms = m if max_ts_ms is None else max(max_ts_ms, m)
        if n_new == 0:
            return
        if ttl_ms is None:
            if state.exists:
                (n_seen,) = state.get
                state.update((n_seen + n_new,))
                return  # key already emitted in an earlier trigger
            state.update((n_new,))
            yield best[cols]
            return
        now_ms = max_ts_ms if max_ts_ms is not None else int(_time.time() * 1000)

        def _arm():
            # re-armed AFTER each state.update (timers require defined
            # state): fires one TTL after the LAST arrival, which is
            # never before first_seen + TTL
            if timer_eviction:
                state.setTimeoutDuration(ttl_ms)

        if state.exists:
            n_seen, first_seen_ms = state.get
            if (now_ms - first_seen_ms) > ttl_ms:
                # horizon passed: re-admit as a fresh first arrival
                state.update((n_new, now_ms))
                _arm()
                yield best[cols]
                return
            state.update((n_seen + n_new, first_seen_ms))
            _arm()
            return  # key already emitted within the horizon
        state.update((n_new, now_ms))
        _arm()
        yield best[cols]

    state_ddl = DEDUP_STATE_DDL if ttl_ms is None else DEDUP_TTL_STATE_DDL
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timer_eviction
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, output_ddl, state_ddl, "append", timeout
    )


def run_dedup_stream(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "fingerprint",
    state_ttl_minutes: float | None = None,
    arrival_ts_col: str | None = None,
) -> DataFrame:
    """Drive first-arrival dedup over parquet document files
    (AvailableNow). Re-invoking after new files land processes only
    them; keys already in the state store stay deduplicated across
    invocations. Returns the cumulative output (minus the internal
    epoch_id partition column).

    Delivery contract: EXACTLY-once per output row. The sink is
    foreachBatch → write_epoch_idempotent — each epoch lands in its
    own `epoch_id=N` partition under dynamic overwrite, so a
    re-delivered epoch (foreachBatch is at-least-once) replaces its
    own files instead of appending duplicates. Chosen over the file
    sink's own commit log so foreachBatch consumers that copy this
    pattern inherit an idempotent shape rather than a bare append."""
    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    out = dedup_stream(
        stream, key_col, ddl, state_ttl_minutes=state_ttl_minutes,
        arrival_ts_col=arrival_ts_col,
    )
    # legacy guard (mirror of incremental_triples' flat-layout guard):
    # an out_dir written by the old FILE-SINK path carries a
    # _spark_metadata log, and readers resolve THROUGH that log —
    # epoch_id=N/ directories written next to it would be invisible
    # (and new rows silently lost, with their keys already consumed by
    # the state store). Keep such outputs on the file sink; retire the
    # log with migrate_epoch_layout when the stream is idle.
    legacy_sink = _has_file_sink_log(spark, out_dir)
    w = out.writeStream.outputMode("append")
    if legacy_sink:
        w = w.format("parquet").option("path", out_dir)
    else:
        w = w.foreachBatch(
            lambda rows, epoch_id: write_epoch_idempotent(rows, out_dir, epoch_id)
        )
    q = (
        w.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    result = spark.read.parquet(out_dir)
    return result.drop("epoch_id") if "epoch_id" in result.columns else result


def run_dedup_stream_continuous(
    spark: SparkSession,
    docs_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "fingerprint",
    state_ttl_minutes: float = 60.0,
    run_for_s: float = 10.0,
    trigger_interval: str = "500 milliseconds",
    stop_when=None,
) -> DataFrame:
    """Continuous-trigger deployment of dedup_stream WITH timer-based
    state eviction — the harness the lazy-TTL docstring promised: a
    processingTime trigger keeps the query alive between data
    arrivals, so each key's ProcessingTimeTimeout (armed for one TTL
    at every arrival) actually fires and REMOVES the state row of a
    key that never returns. Under AvailableNow this is impossible
    (timeout sweeps busy-loop); in a long-running deployment this IS
    the dedup stream — here the query runs for run_for_s then stops,
    which is the test/maintenance-window shape. State-store size is
    then bounded by the keys seen within one TTL, not by all keys
    ever seen. Output semantics are identical to the lazy path (the
    suppression/re-admission decision is the same data check; the
    timer only drops state a horizon-expired key would have replaced
    anyway). Same idempotent epoch sink as run_dedup_stream, so
    re-invocation (restart) resumes from the checkpoint.

    stop_when: optional nullary predicate polled every 200ms; the
    query stops as soon as it returns True (or run_for_s elapses,
    whichever first) — lets callers wait for an observable condition
    (e.g. the state store draining) instead of guessing a wall-clock
    window on a loaded host. Exceptions from the predicate are
    treated as 'not yet' (the state reader can race an in-flight
    commit)."""
    import time as _time

    schema = spark.read.parquet(docs_dir).schema
    stream = spark.readStream.schema(schema).parquet(docs_dir)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    # no arrival_ts_col here: timer eviction requires the wall-time
    # arrival clock (dedup_stream rejects the data-clock combination —
    # a slow replay could otherwise evict in-horizon keys)
    out = dedup_stream(
        stream, key_col, ddl, state_ttl_minutes=state_ttl_minutes,
        timer_eviction=True,
    )
    q = (
        out.writeStream.outputMode("append")
        .foreachBatch(
            lambda rows, epoch_id: write_epoch_idempotent(rows, out_dir, epoch_id)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=trigger_interval)
        .start()
    )
    try:
        deadline = _time.time() + run_for_s
        while _time.time() < deadline:
            if stop_when is not None:
                try:
                    if stop_when():
                        break
                except Exception:
                    pass
            _time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    result = spark.read.parquet(out_dir)
    return result.drop("epoch_id") if "epoch_id" in result.columns else result


SESSION_OUT_DDL = "user_id long, event_id long, session_seq long"
SESSION_STATE_DDL = "n_sessions long, last_ts double"


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom STATEFUL streaming operator via applyInPandasWithState:
    per-user session assignment with a gap timeout, state = (session
    counter, last event time) carried across micro-batches — so a
    user's numbering continues seamlessly when later files arrive in
    a later trigger.

    Matches the batch `kgpipe.operators.temporal.sessionize` exactly
    when events arrive in event-time order (a single AvailableNow
    batch delivers exactly that, which is how the stream==batch test
    pins it). The reference has no streaming at all; this is the
    engine-category operator (SURVEY.md §2b Streaming) in its
    custom-state form."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = float(gap_minutes) * 60.0

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n_sessions, last_ts = state.get
        else:
            n_sessions, last_ts = 0, None
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return  # no new rows: leave state untouched
        rows = pd.concat(frames).sort_values(["ts", "event_id"])
        # unit-safe epoch seconds (pandas 2 may carry us-resolution)
        ts_s = rows["ts"].astype("datetime64[ns]").astype("int64") / 1e9
        seqs = []
        for t in ts_s:
            if last_ts is None or (t - last_ts) > gap_s:
                n_sessions += 1
            last_ts = t
            seqs.append(n_sessions)
        state.update((n_sessions, float(last_ts)))
        yield pd.DataFrame(
            {"user_id": user_id, "event_id": rows["event_id"].values, "session_seq": seqs}
        )

    src = events.withColumn("ts", F.col("ts").cast("timestamp")).select(
        "user_id", "ts", "event_id"
    )
    return src.groupBy("user_id").applyInPandasWithState(
        fn, SESSION_OUT_DDL, SESSION_STATE_DDL, "append", GroupStateTimeout.NoTimeout
    )


def run_sessionize_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Drive stateful sessionization over parquet event files
    (AvailableNow → parquet file sink; the memory sink cannot recover
    from a checkpoint). Re-invoking after new files land processes
    only them and continues each user's session numbering from the
    persisted state store. Returns the cumulative output table.

    Delivery contract: EXACTLY-once per output row, provided by the
    parquet FILE SINK's own transaction log (_spark_metadata): a
    replayed epoch's files are recorded once and readers go through
    the log. This holds only for Spark's file sink — a foreachBatch
    consumer writing parquet itself gets at-least-once and must use
    write_epoch_idempotent (see run_dedup_stream) instead."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = sessionize_stream(stream, gap_minutes)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def run_windowed_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    query_name: str = "kgpipe_windowed",
) -> DataFrame:
    """Drive the windowed aggregation as a real stream over parquet
    files (AvailableNow → memory sink), return the result table.

    Delivery contract: complete-mode memory sink — the table is the
    full recomputed result each trigger, driver-memory-resident and
    NOT restart-recoverable (debug/inspection surface; production
    windowed aggs should go to a file sink in append mode past the
    watermark)."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
