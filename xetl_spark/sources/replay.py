"""``xetl_replay``: a Spark-4 Python *streaming* DataSource that
replays a parquet file as a deterministic micro-batch stream.

The standard backfill-as-a-stream primitive: historical data flows
through the SAME streaming query (watermarks, stateful ops, sinks)
that will later run live, in reproducible offset-delimited batches —
so a pipeline can be regression-tested and backfilled with the exact
code path that serves production, not a batch rewrite of it.

Offsets are row positions ``{"row": N}``; ``latestOffset`` is the file
row count, so ``Trigger.AvailableNow`` drains the file and stops.
Batches split into one InputPartition per ``rows_per_batch`` slice and
each partition reads its slice executor-side via pyarrow — the driver
never touches row data. Exactly-once follows from offset determinism:
re-reading ``[start, end)`` always yields the same rows — PLUS offset
monotonicity: ``latestOffset`` must never return a position below the
checkpoint-committed one (Spark's new-data check is offset
*inequality*, so a lower offset would plan a "backwards" batch and
roll the commit log back, re-emitting committed rows). The pacing
cursor therefore re-learns its position from EVERY engine signal —
``partitions(start, end)`` and ``commit(end)`` both raise it. That is
sufficient because the streaming engine replans the last batch in the
offset log via ``planInputPartitions`` on every restart, committed or
not, BEFORE polling ``latestOffset`` — the same engine contract
pyspark's own ``_SimpleStreamReaderWrapper`` relies on ("when query
restart from checkpoint, use the last committed offset as the start
offset. This depends on the streaming engine calling
planInputPartitions() of the last batch in offset log", pyspark
``sql/datasource_internal.py``). Note ``latestOffset`` may be polled
BEFORE ``initialOffset`` on a fresh start, so fresh-vs-restart cannot
be inferred from call order.

The slice read prunes row groups by the slice bounds (per-group row
counts come from the footer metadata, no data read), so a slice of a
multi-GB file costs only its overlapping groups — multi-row-group
determinism is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _Slice(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        import pyarrow.parquet as pq

        self.path = options.get("path")
        if not self.path:
            raise ValueError("xetl_replay requires option 'path'")
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        # admission control (maxFilesPerTrigger analog): cap how far
        # latestOffset advances per poll so one micro-batch can't
        # swallow the whole backlog. 0 = unbounded (drain in one).
        self.rows_per_trigger = int(options.get("rows_per_trigger", 0))
        self._n_rows = pq.ParquetFile(self.path).metadata.num_rows
        self._cursor = 0

    def initialOffset(self):
        return {"row": 0}

    def latestOffset(self):
        # bounded replay: advance toward the file end, at most
        # rows_per_trigger per poll. rows_per_batch is separately
        # enforced by slicing partitions, bounding per-task memory at
        # any pacing. Monotonicity across restarts: the engine replans
        # the last offset-log batch (partitions(), below) before the
        # first poll here, so by the time this runs on a restarted
        # query the cursor already sits at/above the committed offset
        # — a paced offset can never fall below it and plan a
        # "backwards" batch that would roll the commit log back.
        if not self.rows_per_trigger:
            self._cursor = self._n_rows
        else:
            self._cursor = min(self._n_rows, self._cursor + self.rows_per_trigger)
        return {"row": self._cursor}

    def partitions(self, start, end):
        lo, hi = int(start["row"]), int(end["row"])
        # re-learn pacing position from whatever Spark replans (covers
        # the pending-uncommitted-batch restart path, where partitions
        # runs before any latestOffset poll)
        self._cursor = max(self._cursor, lo, hi)
        step = self.rows_per_batch
        return [
            _Slice(self.path, s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition):
        # executor-side slice read; deterministic for fixed offsets.
        # Row-group pruning: only groups overlapping [start, end)
        # are read, so a slice of a multi-GB file costs its own
        # groups, not a whole-file materialization. Positions are
        # derived from the footer's per-group row counts (no data
        # read), preserving exact offset determinism.
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        need_lo, need_hi = partition.start, partition.end
        first = 0
        groups = []
        base = None  # row position where the pruned read begins
        for g in range(pf.metadata.num_row_groups):
            n = pf.metadata.row_group(g).num_rows
            if first + n > need_lo and first < need_hi:
                if base is None:
                    base = first
                groups.append(g)
            first += n
        if not groups:
            return
        table = pf.read_row_groups(groups)
        for row in table.slice(
            need_lo - base, need_hi - need_lo
        ).to_pylist():
            yield tuple(row.values())

    def commit(self, end):
        # offsets are positional — nothing to clean up; raising the
        # pacing cursor is monotonicity defense-in-depth
        self._cursor = max(self._cursor, int(end["row"]))


class ReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xetl_replay"

    def schema(self):
        # runs inside the data-source worker (no SparkSession there):
        # map the parquet/arrow schema to Spark types directly
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        arrow_schema = pq.ParquetFile(self.options["path"]).schema_arrow
        return from_arrow_schema(arrow_schema)

    def streamReader(self, schema):  # noqa: ANN001
        return ReplayStreamReader(self.options)


def register_replay_datasource(spark: SparkSession) -> None:
    """Register ``xetl_replay`` for ``spark.readStream.format(...)``.

    Options: ``path`` (parquet file), ``rows_per_batch`` (default
    1000, max rows ingested per micro-batch), ``rows_per_trigger``
    (admission control; 0 = drain).
    """
    spark.dataSource.register(ReplayDataSource)
