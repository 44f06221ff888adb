"""§2.9 ``stream_offset_ledger`` — offset management, the reference's
core purpose [K] (SURVEY.md; mirror empty §0).

The reference's deliverable is a KafkaManager that (1) restores consumer
offsets from ZooKeeper at startup, (2) runs the batch, (3) writes each
partition's until-offset back *after* the output action — at-least-once,
upgraded to exactly-once only if the sink is atomic/idempotent [K].

Spark-first restatement, with the engine doing the hard half:

* **Resume point**: the checkpoint WAL (``offsets/<batchId>`` written
  before a batch runs, ``commits/<batchId>`` after) IS the offset store.
  Restart with the same checkpointLocation and the stream replays the
  exact uncommitted batch — the reference's ZK restore, minus the
  hand-rolled clamping.
* **Exactly-once sink**: ``foreachBatch`` + batchId-keyed idempotent
  writes.  A replayed batch overwrites its own partition directory
  instead of appending duplicates.
* **Audit**: a parquet ledger row per (group, source, batch) mirroring
  the reference's ZK node content — queryable lineage of what was
  committed when, which ZooKeeper never gave you.

The kill/restart exactly-once property is asserted by
tests/test_streaming.py::test_offset_ledger_exactly_once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .core import read_event_stream, stage_stream_dir

from ..common import scratch_path

LEDGER_SCHEMA = (
    "group string, source string, batch_id long, n_rows long, "
    "min_event_id long, until_event_id long"
)


class OffsetLedger:
    """batchId-keyed idempotent sink + offset-audit ledger.

    ``process(df, batch_id)`` writes the batch's rows to
    ``sink_dir/batch_id=N`` and one audit row to ``ledger_dir/batch_id=N``
    with mode=overwrite — re-running a batch (crash between sink write
    and WAL commit) replaces rather than duplicates, which is the
    idempotence that turns at-least-once replay into exactly-once output.
    """

    def __init__(self, root: str, group: str = "sskos", source: str = "events-file"):
        self.sink_dir = os.path.join(root, "sink")
        self.ledger_dir = os.path.join(root, "ledger")
        self.group = group
        self.source = source

    def process(self, df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        df.persist()
        try:
            df.write.mode("overwrite").parquet(
                os.path.join(self.sink_dir, f"batch_id={batch_id}")
            )
            stats = df.agg(
                F.count("*").alias("n_rows"),
                F.min("event_id").alias("min_event_id"),
                F.max("event_id").alias("until_event_id"),
            ).collect()[0]
            audit = spark.createDataFrame(
                [
                    (
                        self.group,
                        self.source,
                        batch_id,
                        stats["n_rows"],
                        stats["min_event_id"],
                        stats["until_event_id"],
                    )
                ],
                LEDGER_SCHEMA,
            )
            audit.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(self.ledger_dir, f"batch_id={batch_id}")
            )
        finally:
            df.unpersist()

    def read_ledger(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(LEDGER_SCHEMA).parquet(
            self.ledger_dir + "/batch_id=*"
        )

    def read_sink(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.sink_dir + "/batch_id=*")


def run_ledgered_stream(
    spark: SparkSession,
    stream_dir: str,
    root: str,
    checkpoint: str,
    max_files_per_trigger: int | None = 1,
) -> OffsetLedger:
    """One AvailableNow pass of the events file-stream through the
    ledgered sink; resumable via ``checkpoint``."""
    ledger = OffsetLedger(root)
    src = read_event_stream(spark, stream_dir, max_files_per_trigger)
    q = (
        src.writeStream.foreachBatch(ledger.process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ledger


@register("stream_offset_ledger")
def stream_offset_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the 4-chunk events stream one file per batch through the
    idempotent ledgered sink; return the audit ledger (4 rows, gap-free,
    n_rows summing to the table row count)."""
    stream_dir = stage_stream_dir(spark, sf_dir)
    root = scratch_path("sskos_ledger_")
    ledger = run_ledgered_stream(
        spark, stream_dir, root, checkpoint=scratch_path("ckpt_")
    )
    return ledger.read_ledger(spark).orderBy("batch_id")
