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


def streaming_minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 24,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket_state: int = 1000,
) -> DataFrame:
    """Near-dup detection ON INGEST: the streaming twin of
    incremental_minhash_dedup, built from the same two primitives.

    Stage 1 is map-only and therefore streaming-safe: row-wise MinHash
    signatures (the corpus is never exploded or shuffled). Stage 2
    explodes the LSH band keys and keeps per-(band, bucket) state in
    applyInPandasWithState: each bucket remembers the (doc, signature)
    pairs it has seen — across micro-batches — and every arriving doc
    is compared against them with the MinHash estimator (fraction of
    agreeing signature components ≈ jaccard; state carries signatures
    only, never shingle sets, so per-bucket state is
    num_hashes·8 bytes/doc). Matches stream out as
    (doc, partner, agree) votes; a doc may match in several buckets —
    aggregate min(partner) downstream if one verdict per doc is
    wanted.

    ``max_bucket_state`` FIFO-caps each bucket (memory bound at the
    cost of recall against evicted history — the same cap-vs-recall
    dial as the batch operator's max_bucket_size). State shards by
    bucket key across executors, the natural scale-out for a
    dedup-on-ingest service.
    """
    from xetl_spark.operators.dedup import (
        _band_keys,
        minhash_signatures_rowwise,
    )

    sig = minhash_signatures_rowwise(docs, text_col, id_col, num_hashes, n).drop(
        "hset", "sz"
    )
    banded = _band_keys(
        sig.withColumnRenamed("doc", "doc"), num_hashes, bands
    ).join(sig, "doc")  # (doc, band, bkey, mh_0..mh_{k-1})

    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    out_schema = "doc long, partner long, agree double"
    state_schema = "docs array<long>, sigs array<long>"

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            seen_docs, flat = state.get
            seen_docs = list(seen_docs)
            sigs = [
                list(flat[i * num_hashes : (i + 1) * num_hashes])
                for i in range(len(seen_docs))
            ]
        else:
            seen_docs, sigs = [], []
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc")
            for r in pdf.itertuples(index=False):
                rd = getattr(r, "doc")
                rsig = [int(getattr(r, c)) for c in mh_cols]
                if rd in seen_docs:
                    continue  # replays/rebanded duplicates of same doc
                if sigs:
                    agree = (np.asarray(sigs) == np.asarray(rsig)).mean(axis=1)
                    for j in np.nonzero(agree >= threshold)[0]:
                        rows.append((rd, seen_docs[int(j)], float(agree[int(j)])))
                seen_docs.append(rd)
                sigs.append(rsig)
        if len(seen_docs) > max_bucket_state:  # FIFO cap
            seen_docs = seen_docs[-max_bucket_state:]
            sigs = sigs[-max_bucket_state:]
        state.update(
            (seen_docs, [v for s in sigs for v in s])
        )
        yield pd.DataFrame(rows, columns=["doc", "partner", "agree"])

    return banded.groupBy("band", "bkey").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _try_read_store(spark, store_path: str) -> DataFrame | None:
    """Read a persisted digest store, or None if it doesn't exist yet.

    Probes by attempting the read and catching the analysis error —
    NOT ``os.path.isdir``, which only works for local paths: with an
    HDFS/S3 store URI an isdir probe is always False, the historical
    store is silently ignored, and every batch re-admits previously
    seen content (silent mis-dedup). The catch is narrowed to
    path-not-found; a store that exists but is unreadable still raises.
    """
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(store_path)
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return None
        raise


def streaming_dedup_to_store(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    out_path: str,
    mode: str = "exact",
    **dedup_kwargs: Any,
) -> int:
    """Continuous corpus ingestion with a PERSISTED dedup store — the
    streaming twin of the `incremental_dedup` builtin task: every
    micro-batch is screened against the on-disk store (exact sha2
    digests, or MinHash signatures for near-dup), surviving rows land
    in ``out_path``, and the batch's new digests/signatures are
    appended to ``store_path`` so later batches — and later RUNS —
    never re-admit the same content. Returns the number of
    micro-batches processed.

    Exactly-once discipline (the foreachBatch recipe):

    - the output write is partitioned by ``__batch_id`` with DYNAMIC
      partition overwrite, so a replayed batch rewrites its own
      partition instead of duplicating rows;
    - the store append happens AFTER the output write. A crash
      between the two replays the batch against the pre-append store
      and overwrites the same output partition — idempotent. (The
      reverse order would lose output rows: an appended-then-replayed
      batch screens itself out.) Duplicate digests from an
      append-after-crash are harmless — the screen is an anti-join.
    - each batch's fresh rows are eagerly local-checkpointed before
      either write, cutting the plan's lineage over the store files
      being appended to (same discipline as the batch task's swap).

    Scale shape per batch: |batch| signature work (map-only) + an
    anti-join / band-join against the store — new×store, never
    store×store; a small continuous increment against a huge store
    costs |increment| × collision-rate. The store directory is
    append-only parquet (no compaction needed at screening time: the
    anti-join reads it as one table).
    """
    from pyspark.sql import functions as SF

    if mode not in ("exact", "minhash"):
        raise ValueError(
            f"streaming_dedup_to_store: unknown mode {mode!r}; valid: exact, minhash"
        )
    spark = stream_df.sparkSession
    batches: list[int] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from xetl_spark.operators.dedup import (
            incremental_exact_dedup,
            incremental_minhash_dedup,
        )

        batches.append(batch_id)
        store = _try_read_store(spark, store_path)
        if mode == "exact":
            fresh, new_store = incremental_exact_dedup(
                batch_df, store, text_col, id_col
            )
        else:
            fresh, new_store = incremental_minhash_dedup(
                batch_df, store, text_col, id_col, **dedup_kwargs
            )
            if store is not None:
                # incremental_minhash returns the FULL combined store;
                # append only this batch's delta (store is append-only)
                new_store = new_store.join(
                    store.select("doc"), "doc", "left_anti"
                )
        fresh = fresh.localCheckpoint(eager=True)
        new_store = new_store.localCheckpoint(eager=True)
        (
            fresh.withColumn("__batch_id", SF.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(out_path)
        )
        new_store.write.mode("append").parquet(store_path)

    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(process)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(batches)
