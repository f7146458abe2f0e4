"""Arbitrary stateful streaming: applyInPandasWithState + foreachBatch.

SURVEY §2-B streaming rows 'Arbitrary state' and 'foreachBatch sink'.
The example operator is a per-key running aggregate whose state (count,
sum) survives across micro-batches — the minimal shape of real stateful
jobs (feature backfills, rate limiting, CDC folding).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total double"
STATE_SCHEMA = "n long, total double"


def running_totals_stateful(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum(value)) maintained in executor-side
    state across micro-batches. Emits the updated totals for every key
    touched in a batch ('update'-style output).

    State is bounded by the watermark column upstream; keys are
    hash-partitioned so state shards scale with executors.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total": [round(total, 2)]}
        )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_tws(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum(value)) on the Spark-4
    transformWithStateInPandas API — same operator contract as
    running_totals_stateful, newer engine: typed ValueState handles,
    RocksDB-backed state (the production state store for large,
    spillable streaming state), timer support for TTL-style eviction.

    Output parity with running_totals_stateful is asserted in tests —
    both converge to the batch groupBy aggregate. Runtime requirement:
    the stateful worker channel needs the python ``protobuf`` package
    (absent in this image — the parity test skips itself there).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            got = self._totals.get() if self._totals.exists() else None
            n, total = got if got is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total": [round(total, 2)]}
            )

        def close(self) -> None:
            pass

    spark = events.sparkSession
    # transformWithState requires the RocksDB state store provider
    # (cluster-correct anyway: RocksDB state spills to local disk and
    # supports changelog checkpointing, unlike the in-memory HDFS one).
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_with_foreach_batch(stream_df: DataFrame, sink_path: str) -> int:
    """Drive a stream through a foreachBatch parquet sink (the
    exactly-once custom-sink pattern: batch_id gives idempotence keys).
    Returns the number of micro-batches processed."""
    batches: list[int] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batches.append(batch_id)
        batch_df.withColumn("__batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_path)

    q = stream_df.writeStream.outputMode("append").foreachBatch(write_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(batches)
