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
broadcast of the 1-row global range; the percentile rank rides the
two-phase range-partition prefix scan (ops/prep._prefix_sum) minus
broadcast per-type offsets — partition-count invariant, never a
per-type window (one task per event_type at 10^12 events).
"""

import math

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
    asc) order.  pct is the integer label (50/90/99).

    Scale: the per-type rank is NOT a per-type window (one task per
    event_type at 10^12 events = skew): it rides the two-phase
    range-partition prefix count (ops/prep._prefix_sum over
    (event_type, value, event_id)) minus broadcast per-type exclusive
    offsets — partition-count invariant, the perplexity_buckets
    pattern.  The per-type counts come off the same P-row collect, so
    the ceil(p*n) targets (the SAME IEEE double product on both
    engines) are driver-computed and broadcast-joined back."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    from .prep import _prefix_sum

    rows = ev.withColumn("_one", F.lit(1))
    ranked, _ = _prefix_sum(
        rows, "_one", ["event_type", "value", "event_id"]
    )
    per_type = {
        r["event_type"]: r["n"]
        for r in ranked.groupBy("event_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    offs, acc = [], 0
    targets = []
    for et in sorted(per_type):
        offs.append((et, acc))
        for label, p in pcts:
            targets.append((et, int(label), int(math.ceil(p * per_type[et]))))
        acc += per_type[et]
    off_df = spark.createDataFrame(offs, "event_type string, _off long")
    tgt_df = spark.createDataFrame(
        targets, "event_type string, pct long, rn long"
    )
    return (
        ranked.join(F.broadcast(off_df), "event_type")
        .withColumn("rn", F.col("cum_tokens") - F.col("_off"))
        .join(F.broadcast(tgt_df), ["event_type", "rn"])
        .select("event_type", "pct", "value")
        .orderBy("event_type", "pct")
    )


# ordered funnel + retention cohorts — pinned params (interpolated
# into the DuckDB oracles; change Spark and SQL together)
FUNNEL_STEPS = ("view", "click", "purchase")
RET_MAX_DAYS = 7


def _funnel_reached(spark: SparkSession, sf_dir: str, steps):
    """Per-step (user_id, t) DataFrames under the first-match
    sequential rule: step i's t is the min ts of step-i events
    STRICTLY after the user's step-(i-1) match — shared by
    funnel_conversion (counts) and funnel_latency (durations)."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    reached = []
    prev = None
    for s in steps:
        cur = ev.filter(F.col("event_type") == s)
        if prev is not None:
            cur = cur.join(
                prev.select("user_id", F.col("t").alias("_pt")), "user_id"
            ).filter(F.col("ts") > F.col("_pt"))
        prev = cur.groupBy("user_id").agg(F.min("ts").alias("t"))
        reached.append(prev)
    return reached


def funnel_conversion(spark: SparkSession, sf_dir: str,
                      steps=FUNNEL_STEPS) -> DataFrame:
    """(step, event_type, n_users, conv) — the ordered conversion
    funnel: a user reaches step i iff they have a step-i event STRICTLY
    after their first step-(i-1) match (first-match sequential
    semantics, the standard product-analytics funnel).  conv is the
    fraction of step-1 users surviving to step i (exact BIGINT counts
    divided as doubles, round-6 — the cross-engine float contract;
    microsecond timestamps compare identically on both engines).

    Scale: one per-step shuffle agg on user_id plus one equi-join on
    user_id per step — |steps| co-partitioned key-hash stages, no
    windows, no event-order state; the per-user first-match tree is
    the min(ts) aggregate, never a sort."""
    reached = _funnel_reached(spark, sf_dir, steps)
    spark_counts = [
        r.agg(F.count("*").cast("long").alias("n")) for r in reached
    ]
    rows = None
    for i, (s, c) in enumerate(zip(steps, spark_counts)):
        one = c.select(
            F.lit(i + 1).cast("long").alias("step"),
            F.lit(s).alias("event_type"),
            F.col("n").alias("n_users"),
        )
        rows = one if rows is None else rows.unionByName(one)
    base = spark_counts[0].select(F.col("n").alias("_n1"))
    return (
        rows.join(F.broadcast(base))
        .select(
            "step", "event_type", "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_n1"), 6
            ).alias("conv"),
        )
        .orderBy("step")
    )


def retention_cohorts(spark: SparkSession, sf_dir: str,
                      max_days: int = RET_MAX_DAYS) -> DataFrame:
    """(cohort, k, n_active, retention) — classic retention triangle:
    cohort = a user's first-activity DAY, n_active = distinct cohort
    users active k days later (0 <= k <= max_days), retention =
    n_active / cohort size (the k=0 row — every user is active on
    their cohort day by construction).  Day bucketing is tz-free
    (TIMESTAMP_NTZ end to end, the events_windowed contract); cohort
    is formatted yyyy-MM-dd so no date types cross the driver compare.

    Scale: distinct (user, day) projection, one min-agg per user, one
    equi-join on user_id, one (cohort, k) count — all key-hash
    shuffles on user/cohort keys; no windows."""
    ev = _events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    act = (
        ev.join(first, "user_id")
        .withColumn("k", F.datediff("day", "cohort").cast("long"))
        .filter(F.col("k") <= max_days)
    )
    counts = act.groupBy("cohort", "k").agg(
        F.count("*").cast("long").alias("n_active")
    )
    base = counts.filter(F.col("k") == 0).select(
        "cohort", F.col("n_active").alias("_nc")
    )
    return (
        counts.join(base, "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
            "k", "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("_nc"), 6
            ).alias("retention"),
        )
        .orderBy("cohort", "k")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n, p) — the first-order event path matrix: counts of
    adjacent (prev_type -> type) transitions within each user's
    event stream under the (ts, event_id) total order, and the row-
    conditional probability p = n / n_src (exact BIGINT counts divided
    as doubles, round-6).  The product-analytics path-analysis staple
    next to funnel_conversion (which pins one ordered path; this
    surveys all of them).

    Scale: one lag window PER USER (bounded by a user's event count —
    the user_sessions precedent, never a global window) and two
    key-hash count aggs; ties on ts are broken by event_id so the
    order is total and both engines see identical pairs."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts",
                                       "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("src", F.lag("event_type").over(w))
        .filter(F.col("src").isNotNull())
        .select("src", F.col("event_type").alias("dst"))
    )
    c2 = pairs.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n")
    )
    c1 = c2.groupBy("src").agg(F.sum("n").alias("_ns"))
    return (
        c2.join(c1, "src")
        .select(
            "src", "dst", "n",
            F.round(F.col("n").cast("double") / F.col("_ns"), 6)
            .alias("p"),
        )
        .orderBy("src", "dst")
    )


def props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, n_with_k, sum_k, avg_k, min_k, max_k) —
    semi-structured analytics over the JSON ``props`` column: the
    ``$.k`` field extracted per event (Spark get_json_object / DuckDB
    json_extract_string — both return the raw string, cast BIGINT) and
    aggregated per event_type.  avg divides the exact BIGINT sum by
    the non-null count as doubles, round-6 (the bpe_fertility
    exact-sums contract); rows missing the field count in n_events but
    not the stats.

    Scale: one columnar JSON path extraction (no UDF — both engines'
    native JSON readers) and one key-hash agg."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("kv"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count("kv").cast("long").alias("n_with_k"),
            F.sum("kv").cast("long").alias("sum_k"),
            F.min("kv").cast("long").alias("min_k"),
            F.max("kv").cast("long").alias("max_k"),
        )
        .select(
            "event_type", "n_events", "n_with_k", "sum_k",
            F.round(
                F.col("sum_k").cast("double")
                / F.col("n_with_k").cast("double"), 6
            ).alias("avg_k"),
            "min_k", "max_k",
        )
        .orderBy("event_type")
    )


FUNNEL_PCTS = ((50, 0.5), (90, 0.9))


def funnel_latency(spark: SparkSession, sf_dir: str,
                   steps=FUNNEL_STEPS, pcts=FUNNEL_PCTS) -> DataFrame:
    """(n_converters, p50_us, p90_us) — time-to-convert: for users who
    complete the whole funnel, the exact nearest-rank percentiles of
    the first-step→last-step duration in MICROSECONDS
    (timestampdiff(MICROSECOND) / date_diff('microsecond') — exact
    integers on NTZ timestamps, timezone-free, so no doubles are
    compared at all).  Rank = ceil(p·n) over (delta, user_id), the
    value_percentiles double-product rule.

    Scale: the funnel chain's key-hash joins plus one rank over the
    CONVERTERS only (bounded by the final-step survivor count)."""
    reached = _funnel_reached(spark, sf_dir, steps)
    first = reached[0].select("user_id", F.col("t").alias("t1"))
    last = reached[-1].select("user_id", F.col("t").alias("tn"))
    conv = first.join(last, "user_id").select(
        "user_id",
        F.expr("timestampdiff(MICROSECOND, t1, tn)").alias("delta_us"),
    )
    w = Window.orderBy("delta_us", "user_id")
    ranked = conv.withColumn("rn", F.row_number().over(w))
    n = conv.agg(F.count("*").cast("long").alias("n"))
    targets = n.select(
        "n",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(label).cast("long").alias("pct"),
                    F.ceil(F.lit(p) * F.col("n")).alias("rn"),
                )
                for label, p in pcts
            ])
        ).alias("t"),
    ).select("n", "t.pct", "t.rn")
    picked = ranked.join(F.broadcast(targets), "rn")
    return picked.groupBy("n").agg(
        F.max(
            F.when(F.col("pct") == 50, F.col("delta_us"))
        ).alias("p50_us"),
        F.max(
            F.when(F.col("pct") == 90, F.col("delta_us"))
        ).alias("p90_us"),
    ).select(
        F.col("n").alias("n_converters"), "p50_us", "p90_us"
    )


# as-of attribution join — pinned params, interpolated into the DuckDB
# oracle (__spark_entry__.oracle_sql) — change Spark and SQL together
ASOF_SRC = "click"
ASOF_TGT = "purchase"


def asof_attribution(spark: SparkSession, sf_dir: str,
                     src: str = ASOF_SRC, tgt: str = ASOF_TGT) -> DataFrame:
    """(event_id, user_id, click_id, lag_us) — point-in-time as-of
    join: each ``tgt`` event (purchase) is attributed to the LATEST
    same-user ``src`` event (click) at or before its timestamp —
    last-touch attribution, the classic ASOF JOIN the reference's
    relational peers (kdb aj, DuckDB ASOF) ship as a primitive.

    Pinned semantics (deterministic on both engines):
     * match = argmax over (ts, event_id) among src events with
       src.ts <= tgt.ts (INCLUSIVE — a click in the same microsecond
       as the purchase attributes it; event_id breaks exact-ts ties);
     * unmatched purchases survive with click_id 0 / lag_us -1 (no
       NULLs cross the driver compare);
     * lag_us = timestampdiff(MICROSECOND, click.ts, purchase.ts) —
       exact integers on NTZ timestamps, no doubles compared.

    Scale: the merge-scan shape, NOT the oracle's per-target
    inequality join — both event types shuffle ONCE on user_id and a
    single per-user window pass carries the running last-src struct
    (last(..., ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT
    with src rows ordered before tgt rows at equal ts), so the work is
    O(events per user) with no pair blowup however many src events
    precede a target.  At 10^12 events user_id is high-cardinality
    (the window parallelizes); a pathological power-user key would
    ride the two-phase range-partition scan (ops/prep._prefix_sum)
    like perplexity_buckets.  The DuckDB oracle states the spec as the
    brute-force inequality join + row_number, so the kernel's
    equivalence to the quadratic definition is what the driver checks.
    """
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("event_type").isin(src, tgt))
        .select(
            "event_id", "user_id", "ts",
            # src rows order BEFORE tgt rows at equal ts (inclusive <=)
            F.when(F.col("event_type") == src, F.lit(0))
            .otherwise(F.lit(1)).alias("kind"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_src = F.last(
        F.when(
            F.col("kind") == 0, F.struct("ts", "event_id")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("_ls", last_src)
        .filter(F.col("kind") == 1)
        .select(
            "event_id", "user_id",
            F.coalesce(F.col("_ls.event_id"), F.lit(0))
            .cast("long").alias("click_id"),
            F.coalesce(
                F.expr("timestampdiff(MICROSECOND, _ls.ts, ts)"),
                F.lit(-1),
            ).cast("long").alias("lag_us"),
        )
        .orderBy("event_id")
    )


# bucketed range self-join — pinned param, interpolated into the
# DuckDB oracle — change Spark and SQL together
BP_GAP_SEC = 600


def burst_pairs(spark: SparkSession, sf_dir: str,
                gap_sec: int = BP_GAP_SEC) -> DataFrame:
    """(event_type, n_pairs, sum_delta_us) — the event-time RANGE JOIN:
    ordered pairs of same-type events with 0 < b.ts - a.ts <= gap
    (strictly-later partner within the gap window), counted per type
    with the exact BIGINT sum of pair deltas (the sum pins the matched
    pair SET, not just its size).

    Scale — the bucketed range-join strategy, not an inequality join:
    both sides key on (event_type, floor(us / gap)); the left side is
    exploded to its OWN bucket and the NEXT one (any partner within
    gap lives in one of the two), the join is a plain equi-join on
    (type, bucket), and the time predicate filters the 2-bucket
    candidates.  Each true pair matches exactly once (the left tags
    are distinct buckets).  Partition-key cardinality is #types x
    #buckets and per-key population is one gap-window of one type's
    events — bounded by event RATE, not corpus size, so the shuffle
    stays balanced at 10^12 events where a naive (type)-keyed or
    theta-join plan would put one type in one task (or cross-join).
    The DuckDB oracle states the spec as the brute-force inequality
    join, so the driver compare proves bucket completeness (a pair
    straddling a bucket boundary that the explode missed would change
    both columns)."""
    gap_us = gap_sec * 1_000_000
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    # exact integer division on the long microsecond column: a double
    # quotient can round UP across a bucket boundary once us is large
    # enough that the half-ULP exceeds 1/gap_us, silently breaking the
    # 2-bucket completeness argument (us is nonnegative epoch-us, so
    # truncating `div` == floor)
    bucket = F.expr(f"us div {gap_us}")
    left = ev.select(
        F.col("event_type").alias("t"),
        F.col("us").alias("us_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("tag"),
    )
    right = ev.select(
        F.col("event_type").alias("t"),
        F.col("us").alias("us_b"),
        bucket.alias("tag"),
    )
    return (
        left.join(right, ["t", "tag"])
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") <= F.col("us_a") + gap_us)
        )
        .groupBy(F.col("t").alias("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("us_b") - F.col("us_a")).cast("long")
            .alias("sum_delta_us"),
        )
        .orderBy("event_type")
    )
