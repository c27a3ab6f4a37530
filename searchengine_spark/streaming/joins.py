"""Watermarked stream-stream interval join (clicks ⋈ purchases).

The keyed-state twins (attribution.py, funnel.py) carry custom state
in ``applyInPandasWithState``; this module exercises the OTHER
Structured Streaming join surface — the built-in stream-stream inner
join with an event-time range condition, where SPARK owns the state:
each side buffers rows in the state store and the range constraint
plus both watermarks let it evict a buffered click once the watermark
passes ``cts + gap`` (no future purchase can reach it) — bounded
state on an unbounded stream, the property that makes the join viable
at scale.

Semantics — ALL-touch attribution, the set complement of
attribution.py's last-touch: every (click, purchase) pair of the same
user with 0 <= purchase.ts - click.ts <= gap emits one row
(event_id, click_id, user_id, lag_us).  Both bounds INCLUSIVE (a
same-microsecond click attributes, the as-of rule; a click exactly
``gap`` old still attributes — note burst_pairs' strict LOWER bound
is a different op: self-pairs there, cross-type here).

Equality contract (tests/test_streaming_joins.py): on event-time-
ordered waves the drained join equals the batch inequality join
row-exactly for ANY watermark — a purchase in a later wave is in
event-time ahead of every click the watermark could have evicted
(eviction needs watermark > cts + gap, and ordered waves put every
later purchase above that bound), so eviction never races a pending
match.  Out-of-order delivery degrades monotonically: a click or
purchase arriving later than the watermark horizon is dropped from
the join state (fewer matches, never wrong ones).

ts handling: the source is TIMESTAMP_NTZ (the batch contract);
watermarks require TIMESTAMP, so the stream path casts — run with an
hour-aligned session timezone (tests pin UTC), the windows.py rule.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.events import ASOF_SRC, ASOF_TGT
from .windows import EVENTS_SCHEMA

SSJ_GAP_SEC = 600          # match window (purchase - click), inclusive
SSJ_WATERMARK = "30 minutes"


def clickstream_join_stream(
    spark: SparkSession,
    src_dir: str,
    gap_sec: int = SSJ_GAP_SEC,
    watermark: str = SSJ_WATERMARK,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """events stream → stream of all-touch attribution rows
    (event_id, click_id, user_id, lag_us), one per (click, purchase)
    pair within the gap window."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.parquet(src_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clicks = (
        src.filter(F.col("event_type") == ASOF_SRC)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("cu"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == ASOF_TGT)
        .select("event_id", "user_id", F.col("ts").alias("pts"))
        .withWatermark("pts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("cu") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (
            F.col("pts")
            <= F.col("cts") + F.expr(f"INTERVAL {gap_sec} SECONDS")
        ),
    )
    return joined.select(
        "event_id", "click_id", "user_id",
        F.expr("timestampdiff(MICROSECOND, cts, pts)").alias("lag_us"),
    )


def run_clickstream_join(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_sec: int = SSJ_GAP_SEC,
    watermark: str = SSJ_WATERMARK,
    max_files_per_trigger: int | None = None,
):
    """Drain ``input_dir`` through the interval join into ``out_dir``
    (availableNow; call again as new files land — the checkpoint
    restores the join state, and a replayed micro-batch re-emits into
    the same ``batch=<id>`` dir, so the output stays exactly-once —
    the run_dedup_stream sink contract)."""
    q = (
        clickstream_join_stream(
            spark, input_dir, gap_sec, watermark, max_files_per_trigger
        )
        .writeStream.foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(
                f"{out_dir}/batch={bid}"
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
