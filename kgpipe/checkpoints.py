"""Per-partition lineage + counters + idempotent resume (north rule;
SURVEY.md §7 M6).

Every pipeline stage processes the input in deterministic partitions
`part_id = pmod(xxhash64(url), n_parts)` and records one checkpoint
row per completed partition:

    checkpoints(stage, part_id, fingerprint, n_in, n_out, n_err,
                status, ts)

`fingerprint` is an order-insensitive hash of the partition's input
keys, so a resume run can verify it is skipping work over the SAME
bytes, not merely the same partition number. Stage execution
anti-joins its input against completed checkpoint rows — a rerun
after a crash recomputes only missing partitions and appends only
their outputs (idempotence test: SURVEY.md §5.2-5).

The reference has no persistence at all (a crashed ntto run restarts
from byte 0); this subsystem is what makes the same dataflow safe at
10^12 pages.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from kgpipe.io import TableIO

CHECKPOINT_TABLE = "checkpoints"
CHECKPOINT_SCHEMA = (
    "stage string, part_id int, fingerprint long, n_in long, n_out long, "
    "n_err long, status string, ts double"
)


def with_part_id(df: DataFrame, key_col: str, n_parts: int) -> DataFrame:
    """Deterministic partition assignment — a pure function of the
    row key, NOT of Spark's physical partitioning, so it is stable
    across cluster sizes and reruns."""
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_parts)).cast("int")
    )


def partition_fingerprints(df: DataFrame, key_col: str) -> DataFrame:
    """(part_id, fingerprint, n_in): order-insensitive xor-hash of the
    keys in each part."""
    return df.groupBy("part_id").agg(
        F.bit_xor(F.xxhash64(F.col(key_col))).alias("fingerprint"),
        F.count(F.lit(1)).alias("n_in"),
    )


class CheckpointLog:
    def __init__(self, io: TableIO):
        self.io = io

    def read(self) -> DataFrame:
        if not self.io.exists(CHECKPOINT_TABLE):
            return self.io.spark.createDataFrame([], CHECKPOINT_SCHEMA)
        return self.io.read(CHECKPOINT_TABLE)

    def completed(self, stage: str) -> DataFrame:
        """(part_id, fingerprint, n_in) of partitions already done for
        a stage. n_in is part of the identity: the xor fingerprint of
        a multiset cancels rows with even multiplicity, so two inputs
        differing by an even number of copies of existing rows would
        collide — the row count breaks the tie."""
        return (
            self.read()
            .where((F.col("stage") == stage) & (F.col("status") == "done"))
            .select("part_id", "fingerprint", "n_in")
            .distinct()
        )

    def mark_done(self, stage: str, stats: DataFrame) -> None:
        """stats: (part_id, fingerprint, n_in, n_out, n_err)."""
        rows = stats.withColumn("stage", F.lit(stage)).withColumn(
            "status", F.lit("done")
        ).withColumn("ts", F.lit(time.time()))
        self.io.write(
            rows.select(
                "stage", "part_id", "fingerprint", "n_in", "n_out", "n_err", "status", "ts"
            ),
            CHECKPOINT_TABLE,
            mode="append",
        )

    def pending_partitions(self, stage: str, inputs: DataFrame, key_col: str) -> DataFrame:
        """Filter `inputs` (must carry part_id) down to rows in
        partitions not yet checkpointed with a matching fingerprint.
        Anti-join on (part_id, fingerprint, n_in): a partition whose
        input bytes OR row count changed since the checkpoint is
        recomputed, not skipped."""
        fps = partition_fingerprints(inputs, key_col)
        todo = fps.join(
            self.completed(stage), on=["part_id", "fingerprint", "n_in"], how="left_anti"
        ).select("part_id")
        # part universe is small (n_parts rows) → broadcast semi-join,
        # no shuffle of the big side
        return inputs.join(F.broadcast(todo), "part_id", "left_semi")
