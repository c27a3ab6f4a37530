"""spark-submit job: build the persisted trigram shard (grep index).

The deploy wrapper for index/trigram.py — the grep-side companion of
tools/build_index_job.py:

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/build_trigram_job.py \
        --input /root/testdata/sf0.1 --index /data/trigram_shard \
        [--probe "table hash"]

Builds the bucket-partitioned (trigram, doc_id) cells and commits the
manifest last (completeness marker).  ``--probe`` optionally serves
one substring query from the fresh shard through the Spark path and
reports its wall time — the smoke check a deploy pipeline gates on.

Prints ONE JSON line with build throughput.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir with documents.parquet")
    ap.add_argument("--index", required=True, help="shard output dir")
    ap.add_argument("--append", action="store_true",
                    help="append the input as a new cells generation "
                         "instead of rebuilding (index/trigram."
                         "append_trigram: already-indexed doc_ids "
                         "skipped, atomic manifest commit)")
    ap.add_argument("--batch-tag", default=None,
                    help="idempotence tag for --append (a committed "
                         "tag no-ops — the streaming replay contract)")
    ap.add_argument("--delete-ids", default=None,
                    help="comma-separated doc_ids to tombstone "
                         "(index/trigram.delete_trigram; masked "
                         "immediately, reclaimed by --compact)")
    ap.add_argument("--compact", action="store_true",
                    help="physically reclaim tombstoned docs into one "
                         "fresh generation (index/trigram."
                         "compact_trigram; tags survive)")
    ap.add_argument("--probe", default=None,
                    help="substring to serve as a post-build smoke")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("searchengine-build-trigram")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.index.trigram import (
        append_trigram,
        build_trigram_index,
        compact_trigram,
        delete_trigram,
        substring_topk_ondisk,
    )

    docs = spark.read.parquet(
        f"{args.input}/documents.parquet"
    ).select("doc_id", "text")
    n_docs = docs.count()
    t0 = time.time()
    maint = {}
    if args.delete_ids or args.compact:
        # maintenance mode: no rebuild — delete and/or reclaim only
        if args.delete_ids:
            ids = [int(x) for x in args.delete_ids.split(",")
                   if x.strip()]
            maint["deleted"] = delete_trigram(
                spark, args.index, doc_ids=ids
            )
        if args.compact:
            maint["reclaimed"] = compact_trigram(spark, args.index)
        n_docs = 0
    elif args.append:
        n_docs = append_trigram(spark, docs, args.index,
                                batch_tag=args.batch_tag)
    else:
        build_trigram_index(spark, docs, args.index)
    build_sec = time.time() - t0

    out = {
        "metric": "trigram shard build throughput",
        "unit": "docs/sec",
        "input": args.input,
        "index": args.index,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "value": round(n_docs / build_sec, 2) if build_sec else None,
        **maint,
    }
    if args.probe:
        t1 = time.time()
        n = substring_topk_ondisk(
            spark, args.index, docs, args.probe
        ).count()
        out["probe_rows"] = n
        out["probe_sec"] = round(time.time() - t1, 3)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
