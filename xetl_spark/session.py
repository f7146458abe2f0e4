"""SparkSession factory with scale-appropriate defaults.

Local test runs use ``local[N]``; the same config block is what we would
ship to a 1000-executor cluster minus the master/memory knobs (AQE, Arrow,
UTC session TZ, shuffle-partition sizing are cluster-correct defaults).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_shuffle_partitions(cpus: int, target_partition_bytes: int = 128 << 20) -> int:
    """Size shuffle partitions from INPUT BYTES, not just core count.

    Rule: one shuffle partition per ~128 MB of input (×2 expansion for
    decompressed/joined intermediates), floored at the core count so
    small inputs still use every core, capped at 10× cores so the
    scheduler isn't flooded locally. Input size comes from
    $SPARK_GRAFT_SF_DIR when set (the bench/test data root); without it
    we fall back to core count — on a real cluster the equivalent knob
    is sized from table statistics, and AQE coalescing trims any
    overshoot at runtime.
    """
    floor = max(cpus, 8)
    root = os.environ.get("SPARK_GRAFT_SF_DIR")
    if not root or not os.path.isdir(root):
        return floor
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    derived = (total * 2 + target_partition_bytes - 1) // target_partition_bytes
    return int(min(max(floor, derived), cpus * 10))


def get_session(
    app_name: str = "xetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism so the bench driver
    can pin core counts. AQE is always on: at 100 TB it handles skew joins
    and post-shuffle coalescing that no static config can.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    nshuffle = shuffle_partitions or int(
        os.environ.get("XETL_SHUFFLE_PARTITIONS", 0)
    ) or _default_shuffle_partitions(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("XETL_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
        # TIMESTAMP(NANOS) parquet (e.g. the events fixture) is
        # unreadable by default; read as raw int64 nanos — same
        # truncation DuckDB applies — instead of crashing the scan
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
