"""SparkSession helpers with the engine's pinned configuration."""

import os

from pyspark.sql import SparkSession


def get_spark(app="searchengine-spark", master=None, shuffle_partitions=None):
    """Build a SparkSession with AQE + Arrow enabled.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract);
    on a real cluster this is supplied by spark-submit and the builder's
    master is simply not set.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = os.environ.get("SPARK_GRAFT_SHUFFLE", "32")
    b = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd shuffle/spill compression: ~2x fewer shuffle bytes than
        # lz4 for the CPU the extra compression costs — measured 19-29%
        # faster whole-build at both 4 and 16 cores here (BASELINE.md
        # round 3); at cluster scale the saved bytes are network, the
        # scarcest resource
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        b = b.master(master)
    return b.getOrCreate()
