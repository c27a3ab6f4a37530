"""spark-submit job: the events-analytics report.

One pass over an sf-dir's events table producing every batch surface
of the events family as parquet under --out/<name> — the nightly
product-analytics rollup a deployment schedules next to the index and
curation jobs:

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/events_report_job.py --input /data/sf --out /data/report

Surfaces: funnel_conversion, retention_cohorts, event_transitions,
user_sessions, event_bursts, value_histogram, value_percentiles,
props_stats, asof_attribution, burst_pairs — each the already-oracled
operator, written as-is (the
job is pure composition; tests/test_events_job.py re-runs the
operators in-process and compares counts through the real deploy
surface).

Prints ONE JSON line with per-surface row counts and wall time.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir containing events.parquet")
    ap.add_argument("--out", required=True, help="report output dir")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("searchengine-events-report")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.ops.events import (
        asof_attribution,
        burst_pairs,
        funnel_conversion,
        event_transitions,
        props_stats,
        retention_cohorts,
        value_histogram,
        value_percentiles,
    )
    from searchengine_spark.streaming.windows import (
        event_bursts,
        user_sessions,
    )

    surfaces = {
        "funnel_conversion": funnel_conversion,
        "retention_cohorts": retention_cohorts,
        "event_transitions": event_transitions,
        "user_sessions": user_sessions,
        "event_bursts": event_bursts,
        "value_histogram": value_histogram,
        "value_percentiles": value_percentiles,
        "props_stats": props_stats,
        "asof_attribution": asof_attribution,
        "burst_pairs": burst_pairs,
    }
    t0 = time.time()
    counts = {}
    for name, fn in surfaces.items():
        df = fn(spark, args.input)
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        counts[name] = spark.read.parquet(
            f"{args.out}/{name}"
        ).count()
    wall = time.time() - t0
    print(json.dumps({
        "metric": "events analytics report",
        "unit": "surfaces",
        "input": args.input,
        "rows": counts,
        "wall_sec": round(wall, 3),
        "value": len(counts),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
