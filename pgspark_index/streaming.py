"""Continuous incremental indexing via Structured Streaming.

The direct analog of `pgstream run` (SURVEY.md §3.1): pgstream tails a
replication slot, batches events, indexes them, and acks the max LSN only
after the sink succeeds (checkpoint-after-send,
/root/reference/pkg/wal/processor/search/search_batch_indexer.go:218-223).
Here the slot is a Structured Streaming file source over the webtext
table's directory, the batcher is the micro-batch trigger, the sink is
``incremental.build_delta`` inside ``foreachBatch``, and the ack is the
streaming checkpoint — Spark commits the source offsets only after
foreachBatch returns, so a crash replays the un-acked batch and the
manifest/tombstone protocol makes the replay idempotent (segment files and
manifest rows are keyed by snapshot-scoped unit ids).

`trigger(availableNow=True)` gives the batch-incremental mode from the
north rule (drain what's new, then stop — resumable via the checkpoint);
a processing-time trigger gives true continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import incremental, merge
from .fixtures import WEBTEXT_DDL


def start_continuous_indexing(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    partitions: int | None = None,
    merge_each_batch: bool = True,
    trigger_available_now: bool = True,
    **build_kwargs,
):
    """Tail ``input_dir`` (parquet files of webtext rows) and index every
    new file as a delta snapshot. Returns the StreamingQuery."""

    stream = spark.readStream.schema(WEBTEXT_DDL).parquet(input_dir)

    def handle(batch_df, epoch_id: int):
        if batch_df.isEmpty():
            return
        incremental.build_delta(
            batch_df.sparkSession,
            batch_df,
            index_dir,
            input_snapshot_id=int(epoch_id) + 1,
            partitions=partitions,
            **build_kwargs,
        )
        if merge_each_batch:
            merge.merge_index(batch_df.sparkSession, index_dir)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()
