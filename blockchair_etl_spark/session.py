"""SparkSession construction and runtime tuning.

The reference delegates all execution to a Snowflake warehouse
(warehouse sizing in `scripts/snowflake/create_snowflake_objects.sh:326`,
4-thread dbt concurrency in `config/profiles.yml:13`). Here the session
IS the engine, so scale knobs live in one place.

Two entry points:

- :func:`get_session` — build a session for standalone runs (tests,
  bench, pipelines).
- :func:`prepare_session` — apply the runtime-settable subset of the
  same tuning to an externally-provided session (e.g. the verification
  driver's). Idempotent and cheap; every public query function calls it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs (safe to apply to a live session).
RUNTIME_CONFS: dict[str, str] = {
    # AQE: runtime re-plan (coalesce post-shuffle partitions, skew-join
    # splitting, dynamic broadcast). Core of the 100 TB story: plans
    # adapt to real partition sizes instead of static guesses.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic wall-clock time semantics for oracle parity.
    "spark.sql.session.timeZone": "UTC",
    # The driver testdata's events.parquet carries TIMESTAMP(NANOS),
    # which Spark's parquet reader rejects; read the physical INT64 as
    # a long and convert to timestamp explicitly (io/sources.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow transfer for toPandas / pandas UDFs (vectorized boundary).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: reference SQL (Snowflake) tolerates overflow-free math;
    # keep Spark's permissive defaults so /0 → null matches oracle SQL.
    "spark.sql.ansi.enabled": "false",
}


def default_shuffle_partitions() -> int:
    """Match shuffle parallelism to available cores for local runs.

    On a real cluster this would be sized to ~2-3× total executor cores
    (or left to AQE coalesce from a high initial value); locally a
    low count avoids task-scheduling overhead dominating sub-second
    stages.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and cpus.isdigit():
        return max(int(cpus), 4)
    return max(os.cpu_count() or 8, 4)


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime tuning to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable in this deployment — keep going; every
            # conf here is an optimization or compat shim, not a
            # correctness requirement (except nanosAsLong, which will
            # surface loudly at read time if missing).
            pass
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(default_shuffle_partitions())
        )
    except Exception:
        pass
    return spark


def get_session(
    app_name: str = "blockchair-etl-spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession."""
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_confs:
        for k, v in extra_confs.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return prepare_session(spark)
