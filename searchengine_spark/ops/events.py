"""Value-column analytics over the events table ([NORTH-EXT]).

The metrics side of the events family (streaming/windows.py holds the
event-time side): fixed-width histograms and exact percentiles per
event_type — the aggregations a metrics store (or ES histogram /
percentiles aggs) serves over a numeric field.

Cross-engine float contracts (the repo's usual rules):
 * histogram bin edges derive from the GLOBAL min/max (order-free
   aggregates, exact) and one division — both engines compute
   bin = least(floor((value - lo) / width), bins - 1) over identical
   doubles, so binning is bit-deterministic; sums round to 6dp.
 * percentiles are EXACT (nearest-rank): target = ceil(p * n) over the
   per-type total order (value asc, event_id asc) — no interpolation,
   so the selected value is a stored double, identical on both engines
   (Spark percentile_approx / DuckDB quantile interpolation semantics
   differ, which is why neither is used).

Scale: the histogram is one shuffle agg keyed (type, bin) after a
broadcast of the 1-row global range; percentiles are one per-type
window (rank) + a broadcast of per-type counts — at 10^12 events the
rank window is the skew point and would move to the two-phase
range-partition scan (ops/prep._prefix_sum); the plain window is kept
for oracle parity at driver scale.
"""

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# pinned parameters, interpolated into the DuckDB oracles
# (__spark_entry__.oracle_sql) — change Spark and SQL together
HIST_BINS = 10
PCTS = ((50, 0.5), (90, 0.9), (99, 0.99))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def value_histogram(spark: SparkSession, sf_dir: str,
                    bins: int = HIST_BINS) -> DataFrame:
    """(event_type, bin, n_events, sum_value) — fixed-width histogram
    of the value column per event_type, bins spanning the GLOBAL
    [min, max] (shared edges make the per-type rows comparable).  The
    max value lands in the last bin (the least() clamp)."""
    ev = _events(spark, sf_dir)
    rng = ev.agg(
        F.min("value").alias("_lo"), F.max("value").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    binc = F.least(
        F.floor((F.col("value") - F.col("_lo")) / width),
        F.lit(bins - 1),
    ).cast("long")
    return (
        ev.join(F.broadcast(rng))
        .withColumn("bin", binc)
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def value_percentiles(spark: SparkSession, sf_dir: str,
                      pcts=PCTS) -> DataFrame:
    """(event_type, pct, value) — exact nearest-rank percentiles per
    event_type: the value at rank ceil(p * n) in (value asc, event_id
    asc) order.  pct is the integer label (50/90/99)."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    targets = counts.select(
        "event_type",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(label).cast("long").alias("pct"),
                    F.ceil(F.lit(p) * F.col("n")).alias("rn"),
                )
                for label, p in pcts
            ])
        ).alias("t"),
    ).select("event_type", "t.pct", "t.rn")
    return (
        ranked.join(F.broadcast(targets), ["event_type", "rn"])
        .select("event_type", "pct", "value")
    )
