"""SparkSession construction + per-session config hardening.

Every config here is chosen for the 100 TB target, not just local
tests: AQE re-plans shuffles at runtime (skew joins, partition
coalescing), Arrow keeps the Python<->JVM boundary vectorized, and
UTC session time keeps results comparable across engines/clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Dynamic SQL confs that queries rely on.  Applied defensively at query
# entry too (ensure_session_conf) because the driver may hand us a
# session it built itself.
_SQL_CONF = {
    # testdata events.parquet has shipped as TIMESTAMP(NANOS) (rejected
    # by Spark's parquet reader by default; read as long and convert)
    # and as timestamp[us] without timezone (inferred TIMESTAMP_NTZ,
    # which watermarks/unix_micros reject — read as TIMESTAMP instead;
    # session timezone is UTC so the instant is identical).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # DuckDB (the correctness oracle) is UTC-naive; pin Spark to UTC.
    "spark.sql.session.timeZone": "UTC",
    # Pin ANSI mode (the Spark 4 default) explicitly: size(NULL) is -1
    # under non-ANSI legacy sessions, which silently flips NULL-input
    # semantics away from the DuckDB oracles on driver-owned sessions.
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def scratch_dir() -> str:
    """Fastest writable local scratch for ephemeral engine files
    (streaming state/checkpoints, staged micro-batch inputs, shuffle
    dirs): a tmpfs mount when one exists, else the process tempdir.

    Why this matters (measured, round 14): streaming state-store
    commits are one fsync'd delta file per state partition per
    micro-batch, and on this sandbox's virtio disk those small-file
    fsyncs intermittently stall seconds each — stream_bitmap_overlap's
    recentProgress showed cumulative commitTimeMs of 41-84 SECONDS for
    ~800 state rows while the box sat "idle" (D-state load spikes with
    0% CPU).  The cluster translation is standard ops guidance, not a
    sandbox hack: put spark.local.dir and state checkpoints on the
    fastest local volume (NVMe/instance storage), never a shared or
    latency-spiky device; durable checkpoints for RESTARTABLE
    production streams belong on HDFS/S3 (those queries pass explicit
    checkpointLocation — see stream_restart_resume)."""
    override = os.environ.get("SPARK_GRAFT_SCRATCH")
    if override:
        return override
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        # tmpfs is RAM-backed and often tiny (Docker defaults /dev/shm
        # to 64 MB; many hosts cap it at 50% RAM) — a sizable shuffle
        # through an undersized tmpfs fails with ENOSPC or converts
        # spill into memory pressure.  Only prefer it when it has real
        # headroom (round-14 advice); scaled runs pin SPARK_GRAFT_SCRATCH
        # to disk regardless (tests/scale_audit.py).
        try:
            st = os.statvfs(shm)
            shm_free_gb = st.f_bavail * st.f_frsize / 2**30
        except OSError:
            shm_free_gb = 0.0
        if shm_free_gb >= 16.0:
            d = os.path.join(shm, "bd3_scratch")
            os.makedirs(d, exist_ok=True)
            return d
    import tempfile

    return tempfile.gettempdir()


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply dynamic confs to an existing session (driver-owned or ours)."""
    for k, v in _SQL_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — best effort
    try:
        # A driver-owned session keeps the 200 default; AQE coalesces
        # that for batch but NOT for stateful streaming (AQE is
        # disabled there), so size it to the actual parallelism.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:
        pass
    return spark


def lineage_checkpoint(df, big: bool = False):
    """Truncate lineage for iterative loops (EM, label propagation).

    ``localCheckpoint`` stores blocks on executors — fast, but lost
    with a dead executor, which on a 1000-executor cluster means a
    multi-hour EM run dies with one machine.  When
    ``SPARK_GRAFT_CHECKPOINT_DIR`` is set, use a reliable
    ``checkpoint`` to that (HDFS/S3) path instead; default stays local
    for single-box runs.

    ``big=True`` marks a CORPUS-SIZED frame: its local checkpoint goes
    to DISK_ONLY so the pinned (non-evictable) checkpoint blocks never
    compete with execution memory — at the 100x derived-scale audit a
    MEMORY_AND_DISK checkpoint of a 150M-row count table starved the
    downstream hash aggregation into UNABLE_TO_ACQUIRE_MEMORY.
    Bounded frames (scalars, dim^2 tables, vocab-pruned postings)
    keep the default memory level.
    """
    ckpt_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint()
    if big:
        from pyspark.storagelevel import StorageLevel

        return df.localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    return df.localCheckpoint()


def get_spark(app_name: str = "bigdata_assigment3_spark") -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        # shuffle partitions ~ cores for local; a real cluster would
        # size this to 2-3x total cores (AQE coalesces the excess).
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # shuffle/spill blocks and implicit streaming temp checkpoints
        # on the fastest local volume (see scratch_dir): spark.local.dir
        # covers the block manager; java.io.tmpdir covers the temp
        # checkpoint dirs StreamingQueryManager creates for memory-sink
        # streams, whose per-partition fsync'd state commits are the
        # latency-sensitive path
        .config("spark.local.dir", scratch_dir())
        .config(
            "spark.driver.extraJavaOptions",
            f"-Djava.io.tmpdir={scratch_dir()}",
        )
    )
    for k, v in _SQL_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_session_conf(spark)
