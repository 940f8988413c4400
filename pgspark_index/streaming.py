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

from pyspark.sql import DataFrame, SparkSession

from . import incremental, merge
from .fixtures import WEBTEXT_DDL


def stateful_lww_stream(stream_df: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Event-time last-writer-wins per url as a CUSTOM STATEFUL streaming
    operator (applyInPandasWithState) — the streaming form of the batch
    LWW coalesce (extract.py; reference analog: replication events for the
    same row superseded by LSN order, wal_batch_sender drains per-key in
    commit order).

    State per url = the winning warc_ts seen so far; a batch emits a row
    ONLY when the winner changes, so downstream (build_delta) receives a
    monotone upsert stream. The watermark bounds late data AND state:
    rows older than the horizon are dropped by Spark before the operator,
    and each url's state carries an event-time timeout at its winning
    warc_ts — once the watermark passes it, the state is REMOVED
    (EventTimeTimeout), so at 100-TB scale state holds one tiny tuple per
    url active within the horizon, not the whole corpus. Eviction is
    exact, not lossy: after the watermark passes best_ts, any surviving
    new row for that url has warc_ts >= watermark > best_ts and would win
    regardless of the dropped state, so re-emitting it as a fresh winner
    is the same output the unbounded-state operator would produce.
    Output: (url, warc_ts, text) winners."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "url string, warc_ts timestamp, text string"
    state_schema = "best_ts timestamp"

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            # watermark passed this url's winning warc_ts — no in-horizon
            # row can lose to it anymore; drop the state (see docstring)
            state.remove()
            return
        url = key[0]
        newest = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            row = pdf.loc[pdf["warc_ts"].idxmax()]
            if newest is None or row["warc_ts"] > newest["warc_ts"]:
                newest = row
        best = state.get[0] if state.exists else None
        if newest is not None and (best is None or newest["warc_ts"] > best):
            state.update((newest["warc_ts"].to_pydatetime(),))
            yield pd.DataFrame(
                {"url": [url], "warc_ts": [newest["warc_ts"]], "text": [newest["text"]]}
            )
        if state.exists:
            # evict when the watermark passes the winner (must be strictly
            # ahead of the current watermark or Spark rejects the call)
            import datetime as dt

            ts = state.get[0] if newest is None else newest["warc_ts"]
            if hasattr(ts, "to_pydatetime"):
                ts = ts.to_pydatetime()
            if ts.tzinfo is None:
                # state/event timestamps are naive in the session TZ (UTC,
                # pinned by session.py); naive .timestamp() would assume
                # the process-local zone instead
                ts = ts.replace(tzinfo=dt.timezone.utc)
            best_ms = int(ts.timestamp() * 1000)
            state.setTimeoutTimestamp(
                max(best_ms + 1, state.getCurrentWatermarkMs() + 1)
            )

    return (
        stream_df.withWatermark("warc_ts", watermark)
        .groupBy("url")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
