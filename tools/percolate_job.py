"""spark-submit job: standing-query alerting over a documents stream.

The deploy wrapper for the percolator (ops/search.percolate +
streaming/percolate.py) — the alerting companion to the index/curation
jobs:

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/percolate_job.py --src /data/incoming_docs \
        --out /data/alerts --checkpoint /data/alerts_ckpt

Drains every pending parquet file under --src (availableNow), appends
(qid, doc_id) alert rows under --out, exactly-once per input file via
the checkpoint — run it from cron or keep a long-lived trigger by
looping.  With --batch SF_DIR it instead runs the batch operator over
an sf-dir documents table (backfill mode).  The standing queries are
the pinned PERC_QUERIES table; a deployment swaps that tuple for its
registered-query store.

Prints ONE JSON line with alert counts and wall time.
"""

import argparse
import json
import os
import sys
import time

# Spark-free invocation without --py-files/PYTHONPATH: resolve the
# package from the repo checkout this script lives in
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", help="streaming source dir of doc parquet")
    ap.add_argument("--out", help="alert output dir (streaming mode)")
    ap.add_argument("--checkpoint", help="stream checkpoint dir")
    ap.add_argument("--batch", metavar="SF_DIR",
                    help="backfill: run the batch percolator over "
                         "SF_DIR/documents.parquet and print counts")
    ap.add_argument("--rich", action="store_true",
                    help="use the rich standing queries (bare/phrase/"
                         "-not via the shared query-language parser; "
                         "ops PERC_RICH_QUERIES + the rich gate)")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if not args.batch and not (args.src and args.out and args.checkpoint):
        ap.error("need --batch SF_DIR or all of --src/--out/--checkpoint")

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("searchengine-percolate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    if args.batch:
        from searchengine_spark.ops.search import (
            percolate,
            percolate_rich,
        )

        op = percolate_rich if args.rich else percolate
        alerts = op(spark, args.batch)
        n = alerts.count()
        wall = time.time() - t0
        print(json.dumps({
            "metric": "percolate backfill alerts",
            "unit": "alerts",
            "mode": "batch" + ("-rich" if args.rich else ""),
            "input": args.batch,
            "n_alerts": n,
            "wall_sec": round(wall, 3),
            "value": n,
        }))
    else:
        from searchengine_spark.streaming.percolate import (
            percolate_rich_stream,
            percolate_stream,
        )

        gate = percolate_rich_stream if args.rich else percolate_stream
        gate(spark, args.src, args.out, args.checkpoint)
        n = spark.read.parquet(args.out).count()
        wall = time.time() - t0
        print(json.dumps({
            "metric": "percolate stream drain",
            "unit": "alerts",
            "mode": "stream" + ("-rich" if args.rich else ""),
            "src": args.src,
            "n_alerts_total": n,
            "wall_sec": round(wall, 3),
            "value": n,
        }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
