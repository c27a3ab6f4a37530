"""Event-time windowed aggregation with watermarked late-data handling.

The engine's other streaming surfaces (ingest.py, queries.py, dedup.py)
are arrival-time pipelines; this module adds the EVENT-time family over
the ``events`` table: tumbling-window counts/sums keyed by event_type,
with a watermark bounding how late an event may arrive before it is
dropped — the standard Structured Streaming pattern for out-of-order
data at scale (state is bounded by the watermark horizon; without it a
10^12-event stream would accumulate unbounded window state).

Two entry points share one aggregation builder so the batch twin IS the
streaming semantics minus the watermark:

 * ``events_windowed`` — the batch twin (driver entry, DuckDB-oracled:
   Spark's epoch-aligned 1-hour tumbling window == date_trunc('hour')).
 * ``windowed_events_stream`` — the watermarked streaming variant;
   tests drive it with availableNow + maxFilesPerTrigger=1 so watermark
   progression between micro-batches is deterministic, and assert both
   the closed-window equality vs the batch twin and the drop of a
   too-late event (tests/test_streaming_windows.py).

Timestamps are TIMESTAMP_NTZ end to end (the parquet ts carries
isAdjustedToUTC=false), so bucketing is timezone-independent in Spark,
DuckDB, and the formatted string output.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WINDOW = "1 hour"
WATERMARK = "30 minutes"

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _windowed_agg(events: DataFrame) -> DataFrame:
    """The shared tumbling-window aggregation: (window_start,
    event_type, n_events, sum_value).  Epoch-aligned 1-hour windows;
    sum rounded to 6dp (the repo's float-compare contract)."""
    return (
        events.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin over the events table — one shuffle on the
    (window, event_type) grouping key; scales as a plain hash
    aggregation (partial map-side combine, no global sort)."""
    return _windowed_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))


BURST_TOPN = 20   # interpolated into the DuckDB oracle — change both


def event_bursts(spark: SparkSession, sf_dir: str,
                 topn: int = BURST_TOPN) -> DataFrame:
    """Rate-anomaly (burst) detection over the event stream: per
    event_type, the z-score of each 1-hour bucket's event count
    against the type's OBSERVED (nonempty) hourly buckets — the top-n
    bursts.  Sparse convention: empty hours carry no row (at stream
    scale the hour grid is never materialized), so the baseline is the
    nonempty-bucket distribution; pinned in the oracle too.

    Cross-engine float determinism: the moments are EXACT integer sums
    (s1 = Σn, s2 = Σn², c = #buckets — BIGINT on both engines, DuckDB
    HUGEINT cast back); mean / sample-variance / z are then the same
    scalar double expression over identical integers, so both engines
    produce bit-identical doubles before the 6dp round.  c < 2 or
    var <= 0 drops the type (no z).  Ranks follow the rounded-rank
    contract (z rounded 6 BEFORE row_number; ties event_type asc,
    window_start asc).

    Scale: one shuffle on (type, hour) for the counts; the per-type
    moments are |types| rows (broadcast back); the final top-n window
    runs over |type-hours| burst rows — at 100 TB swap it for the
    two-phase salted top-k; the plain window is kept for oracle parity
    at driver scale.
    """
    from pyspark.sql.window import Window

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        events.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type",
            "n",
        )
    )
    mom = hourly.groupBy("event_type").agg(
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
        F.count("*").alias("c"),
    )
    cd = F.col("c").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    j = (
        hourly.join(F.broadcast(mom), "event_type")
        .filter(F.col("c") >= 2)
        .withColumn("mean", s1d / cd)
        .withColumn("var", (s2d - (s1d * s1d) / cd) / (cd - F.lit(1.0)))
        .filter(F.col("var") > 0)
    )
    scored = j.select(
        "event_type",
        "window_start",
        "n",
        F.round(
            (F.col("n").cast("double") - F.col("mean"))
            / F.sqrt(F.col("var")),
            6,
        ).alias("z"),
    )
    wr = Window.orderBy(
        F.desc("z"), F.asc("event_type"), F.asc("window_start")
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(wr).cast("long")
        )
        .filter(F.col("rank") <= topn)
        .select("rank", "event_type", "window_start", "n", "z")
    )


SESSION_GAP = "10 minutes"


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: merge each user's events into sessions separated
    by >= SESSION_GAP of silence — ``F.session_window``, the native
    merging-window operator (a self-merging state machine in streaming;
    in batch a partition-local sort within the user_id hash shuffle —
    no global sort, no UDF).

    (user_id, session_start, n_events, sum_value); session_start
    carries microseconds since gaps are data-driven.  The DuckDB oracle
    is the classic gaps-and-islands rewrite (lag → new-session flag →
    running sum → group), which pins the exact merge semantics: a gap
    EQUAL to the timeout still MERGES (Spark's session end is
    inclusive for the merge test — measured, pinned in
    tests/test_streaming_windows.py); only a strictly larger gap
    splits."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(
                F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
            ).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def windowed_events_stream(spark: SparkSession, src_dir: str,
                           watermark: str = WATERMARK,
                           max_files_per_trigger: int | None = None
                           ) -> DataFrame:
    """Watermarked streaming variant over a directory of event parquet
    files.  Run in APPEND mode: a window is emitted exactly once, when
    the watermark passes its end — and an event arriving after its
    window closed is dropped, bounding state at scale.

    The grouped state lives in the state store, sharded across
    executors by the grouping key, and is reclaimed as the watermark
    advances — the property that makes this viable on an unbounded
    stream.  ``max_files_per_trigger`` is a determinism knob for tests
    (1 file per micro-batch pins watermark progression); leave it off
    in production — forcing N files into N micro-batches makes
    per-batch planning/state-commit overhead dominate."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    src = reader.parquet(src_dir)
    # watermarks require TIMESTAMP (event-time tracking), not NTZ; the
    # cast interprets the wall clock in the session timezone, so run
    # with an hour-aligned zone (tests pin UTC) — then the formatted
    # window_start round-trips to the batch twin's NTZ strings exactly
    src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return _windowed_agg(src.withWatermark("ts", watermark))
