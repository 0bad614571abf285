"""SparkSession factory with scale-oriented defaults.

The engine targets large clusters reading ~100 TB; the defaults here are the
ones that matter at that scale and are harmless locally:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting,
  dynamic join-strategy demotion to broadcast);
- Arrow on (every mapInPandas/pandas_udf path is Arrow-batched);
- sane shuffle partitioning for local runs, overridable per deployment;
- parquet as the only table format (columnar, predicate/projection pushdown).

Reference analog: the reference has no execution engine of its own — it runs
pandas in a single Celery worker (SURVEY.md §4.2); this module is where those
single-process assumptions become cluster configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[
# N] test/bench harness; a real deployment overrides via spark-submit --conf.
_LOCAL_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, demote sort-merge joins to broadcast when runtime stats allow.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas interchange (mapInPandas, applyInPandas, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 32 is right for local[32] at sf<=0.1; clusters set this (or rely on AQE
    # initialPartitionNum) per job.
    "spark.sql.shuffle.partitions": "32",
    # Broadcast joins for dimension tables (region/nation/customer-sized).
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # take()/limit-collect actions (the dispatch probes, guard takes)
    # start by scanning ONE partition and re-schedule 4x more each round
    # (scaleUpFactor) until satisfied; a selective guard like
    # `filter(key = literal).take(2)` that matches one row therefore
    # pays ceil(log4(parts)) scheduled jobs + planning gaps to prove no
    # second row exists (measured: x_mmr_rerank's arity guard ran 3 jobs
    # over an 8-file scan). Start at the session's core count instead —
    # one job saturates the machine, and a probe that must scan
    # everything anyway finishes in fewer round trips. Scale-dependent:
    # a cluster deployment sets this to its executor-core total (or
    # leaves 1 when takes are expected to satisfy from the first split);
    # bounded either way by the limit row count, never a full-table read.
    "spark.sql.limit.initialNumPartitions": os.environ.get(
        "SPARK_GRAFT_CPUS", "4"
    ),
    # Read-side split sizing; at 100 TB this keeps ~128MB tasks.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Deterministic session timezone so timestamp rendering matches the
    # DuckDB oracle regardless of host TZ.
    "spark.sql.session.timeZone": "UTC",
    # Spark's default parquet timestamp layout is legacy INT96, which other
    # readers (and our own footer sniffer) can't distinguish from
    # TIMESTAMP(NANOS). Write standard INT64 micros — what the testdata's
    # own micros generation uses and what DuckDB/Arrow read natively.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "bi_gcp_stitch_repl_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 4) so
    tests stay fast while the driver/bench can raise it to local[32].
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_LOCAL_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate silently IGNORES every builder conf when a session
    # already exists (created by a notebook, a driver harness, another
    # library) — including the two correctness-bearing settings the
    # DuckDB oracle and the parquet footer sniffer depend on (UTC
    # session TZ, INT64-micros timestamps). Re-apply the runtime-settable
    # subset so a reused session still honors the engine contract.
    return tune_existing(spark)


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine defaults to a session we did not
    create (the driver hands us one in ``__spark_entry__.entry``)."""
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.session.timeZone",
        "spark.sql.parquet.outputTimestampType",
        "spark.sql.limit.initialNumPartitions",
    ):
        try:
            spark.conf.set(k, _LOCAL_DEFAULTS[k])
        except Exception:
            pass  # some confs are fixed at session start; keep going
    return spark
