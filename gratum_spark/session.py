"""SparkSession factory tuned for the test/bench environment.

Local runs use ``local[N]`` with a modest shuffle-partition count; on a
real cluster the same settings (AQE on, adaptive coalescing, skew-join
handling) are what we'd ship — AQE re-plans partition counts at runtime
so the static number only matters as a ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "gratum-spark", cpus: int | None = None) -> SparkSession:
    """Return (create if needed) a SparkSession configured for this engine.

    Scale notes: every setting here is chosen to survive a 1000-executor
    cluster, not just local[32]:
      - AQE enabled: runtime shuffle-partition coalescing + skew-join
        splitting replace hand-tuned partition counts.
      - broadcast threshold raised so dimension tables (region/nation/
        customer at TPC-H ratios) broadcast instead of shuffling.
      - Arrow enabled for the few pandas-UDF operators (vectorized
        Python boundary instead of row-at-a-time pickling).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # 16 MB: parquet on-disk size understates the in-memory hash
        # relation ~5-10×; at 64 MB a filtered mid-size fact table (1.5M
        # rows in the 10× scale test) got broadcast and the driver-side
        # hash build dominated the join. Dimension tables stay well under.
        .config("spark.sql.autoBroadcastJoinThreshold", str(16 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Constraint propagation is pure optimizer-time work: it infers
        # IsNotNull / transitive predicates from existing constraints,
        # at a cost Spark's own docs flag as expensive for plans with
        # many aliases. On this catalog's composite plans (checkpoint
        # subtrees full of aliases, pandas-UDF boundaries the inference
        # cannot see through) it finds nothing a scan can use — every
        # join key in the schema is non-null by construction — while
        # costing 0.2–0.7 s of driver CPU per plan build (r15, measured:
        # text_perplexity 2.20→1.66 s, pipeline_pretraining 3.86→3.19 s
        # full-query; results and join strategies unchanged, full oracle
        # sweep green both ways). Not a local-only tune: the cost is
        # per-plan driver time paid identically on a cluster. Env-
        # overridable for workloads whose scans DO benefit from
        # inferred null filters.
        .config(
            "spark.sql.constraintPropagation.enabled",
            os.environ.get("SPARK_GRAFT_CONSTRAINT_PROPAGATION", "false"),
        )
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # read TIMESTAMP(NANOS) parquet (which Spark has no native type
        # for) as long nanos; sources.table converts to micros timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # read TIMESTAMP(MICROS, isAdjustedToUTC=false) as TimestampType
        # at the scan (not TimestampNTZ + cast) so timestamp predicates
        # stay pushable into the parquet reader
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Whole-stage codegen emits one class per query stage; a session
        # running many distinct queries overflows the JVM's default 240 MB
        # code cache, after which the JIT disables itself and everything
        # runs interpreted (measured 10-40× slowdowns landing on random
        # later queries). 1 GiB + flushing keeps the JIT alive.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        # Python workers get reaped after ~1 min idle; a later pandas-UDF
        # stage then pays a full worker-pool respawn (fork + pandas/numpy
        # import × cores, measured 25-45 s). Keep the pool warm.
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.killOnIdleTimeout", "false")
    )
    master = os.environ.get("SPARK_GRAFT_MASTER")
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
