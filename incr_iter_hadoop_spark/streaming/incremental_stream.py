"""Structured Streaming expression of the incremental mode (SURVEY §2.9).

The reference's incremental refresh is *batch* view maintenance; Spark lets
the same refresh logic run continuously: delta micro-batches drive
``operators.incremental.refresh`` via ``foreachBatch``, and the declared
watermark/window battery covers event-time semantics the reference never had
(contrib/streaming is stdin piping, not stream processing —
StreamJob.java:1-1000).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.incremental import PreservedState, refresh


def streaming_refresh(
    delta_stream: DataFrame,
    initial_state: PreservedState,
    sink: Callable[[PreservedState, int], None],
    checkpoint_dir: str,
    op_col: str = "op",
    available_now: bool = False,
) -> StreamingQuery:
    """Drive incremental view maintenance from a stream of (+/-) delta rows.

    Each micro-batch is one I7-I9 refresh: retract '-' sources, insert '+',
    re-aggregate only affected groups, hand the new state to ``sink`` (which
    typically writes versioned parquet). State lives in the sink's tables,
    not executor memory, so recovery = re-read last version (same design as
    the reference's HDFS-copied preserve files, ReduceTask.java:3359-3372)."""
    holder = {"state": initial_state}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_state = refresh(holder["state"], batch_df, op_col=op_col)
        # materialize: the next batch's state must not re-read this stream
        new_state.contribs.persist().count()
        new_state.results.persist().count()
        old = holder["state"]
        holder["state"] = new_state
        sink(new_state, batch_id)
        old.contribs.unpersist()
        old.results.unpersist()

    writer = (
        delta_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        # drain-and-stop: process every available delta file, then
        # terminate — the registered oracle-checked query uses this to run
        # the stream to completion deterministically
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Tumbling-window aggregate with late-data watermark — identical logic
    to the batch ``events_tumbling`` query; pass a readStream DataFrame."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), *keys, "n", "total")
    )


def stateful_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState`` —
    the Spark-native replacement for the reference's task-resident
    per-iteration state (substate files, ReduceTask.java:3009-3013): per-key
    running (count, sum) carried in executor-managed state across
    micro-batches, fault-tolerant through the checkpoint log.

    Pass a streaming DataFrame; each micro-batch emits one row per updated
    key with the cumulative totals."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total": [s]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key long, n_events long, total double",
        stateStructType="n long, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows over a stream (batch twin: ``events_session``)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col, F.col("w.start").alias("session_start"), "n_events"
        )
    )


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, key: str
) -> DataFrame:
    """Stream-static join: enrich a streaming fact with a broadcast batch
    dimension — the streaming twin of the J2/ONE2ALL broadcast join
    (MapTask.java:794-800). The static side is re-read per micro-batch by
    Structured Streaming's contract (slowly-changing dims pick up updates);
    broadcast keeps the stream side shuffle-free at any rate."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), key)


def streaming_scd2_eras(
    changes_stream: DataFrame,
    store,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain an on-disk ``Scd2Store`` from a stream of dimension-change
    batches: each micro-batch commits as ONE era (round 7 — the streaming
    twin of ``Scd2Store.apply_era``, pairing SURVEY §2.9's micro-batch mode
    with the I6 store the way ``streaming_refresh`` pairs it with the
    preserve store).

    Exactly-once despite foreachBatch's at-least-once contract: the
    micro-batch id is passed as ``apply_era``'s idempotence token, which is
    recorded IN THE SAME atomic meta write as the era bump — a replayed
    batch (crash between the era commit and the checkpoint commit) finds
    its token and returns the already-committed era instead of
    double-applying the same changes as a phantom era.
    ``tests/test_streaming_restart.py`` pins the restart behavior.

    Pair the source with ``maxFilesPerTrigger=1`` so each arriving change
    file becomes its own era; batches must respect ``apply_era``'s
    one-row-per-key contract (enforced there, not here)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty trigger is not an era
        store.apply_era(batch_df, token=f"stream-batch-{batch_id}")

    return (
        changes_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


def streaming_scd2_cdc(
    cdc_stream: DataFrame,
    store,
    checkpoint_dir: str,
    op_col: str = "cdc_op",
) -> StreamingQuery:
    """Maintain an ``Scd2Store`` from a CDC stream (round 7): each row
    carries an op marker — ``'u'`` upsert / ``'d'`` delete, the
    Debezium/DMS change-feed shape — and each micro-batch commits as ONE
    era holding BOTH sides atomically (``apply_era(changes,
    deletes=...)``): the era bump that opens the batch's new versions is
    the same meta write that terminates its deleted keys, so a reader can
    never observe a half-applied batch.

    Exactly-once under foreachBatch's at-least-once contract by the same
    token mechanism as ``streaming_scd2_eras`` (micro-batch id recorded in
    the atomic commit). Unknown op values fail the batch loudly — a CDC
    feed emitting ops this sink doesn't understand (e.g. a truncate) must
    not be silently narrowed to the ones it does."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # an empty trigger is not an era
        bad = (
            batch_df.where(~F.col(op_col).isin("u", "d")).limit(1).count()
        )
        if bad:
            raise ValueError(
                f"streaming_scd2_cdc: batch {batch_id} carries op values "
                f"outside {{'u', 'd'}} in column {op_col!r}"
            )
        ups = batch_df.where(F.col(op_col) == "u").drop(op_col)
        dels = batch_df.where(F.col(op_col) == "d").select(*store.key_cols)
        store.apply_era(
            ups, deletes=dels, token=f"stream-batch-{batch_id}"
        )

    return (
        cdc_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
