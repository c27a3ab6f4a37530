"""spark-submit job: corpus → dedup → postings → on-disk compressed index.

The north-rule deploy contract — the whole build runs via

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/build_index_job.py --input /root/testdata/sf0.1 \
        --output /tmp/se_index [--multiply 10] [--quality] [--queries]

On a real cluster ``--master``/executors come from spark-submit; the
job itself never hardcodes a master.  Prints ONE JSON line with build
metrics (docs/sec is the north-star throughput figure; bench.py
--scaling runs this job at two parallelism levels and reports the
N→4N scaling efficiency).

Resumable: re-running with the same --output resumes from the lineage
manifest (incomplete posting groups re-run; completed stages skip).
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--output", required=True, help="index output dir")
    ap.add_argument("--multiply", type=int, default=1,
                    help="amplify corpus xM for throughput runs")
    ap.add_argument("--quality", action="store_true",
                    help="also compute PageRank/HITS quality scores")
    ap.add_argument("--queries", action="store_true",
                    help="run the fixture query set against the index")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--simhash-bits", type=int, default=64,
                    choices=(32, 64),
                    help="64 = web-scale banding (default, "
                         "text/simhash.py); 32 = reference-parity")
    ap.add_argument("--id-order", default="hash",
                    choices=("lexical", "hash"),
                    help="docid assignment order: hash = samplerless "
                         "web-scale mode (default); lexical = oracle "
                         "parity")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("searchengine-build")
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # measured 19-29% faster whole-build vs lz4 (shuffle bytes are
        # the build's bandwidth ceiling; see session.py)
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.corpus.ingest import (
        documents_as_corpus,
        multiply_corpus,
    )
    from searchengine_spark.index import build_tables
    from searchengine_spark.index.shards import write_index

    t0 = time.time()
    corpus = multiply_corpus(
        documents_as_corpus(spark, args.input), args.multiply
    )
    tables = build_tables(
        spark,
        corpus,
        compute_quality=args.quality,
        simhash_bits=args.simhash_bits,
        id_order=args.id_order,
    )
    manifest = write_index(spark, tables, args.output)
    build_sec = time.time() - t0

    n_docs = tables.stats["n_total"]
    out = {
        "metric": "index-build throughput",
        "unit": "docs/sec",
        "input": args.input,
        "multiply": args.multiply,
        "n_docs": n_docs,
        "n_survivors": tables.stats["n_survivors"],
        "quality": bool(args.quality),
        "build_sec": round(build_sec, 3),
        "value": round(n_docs / build_sec, 2),
        "parallelism": spark.sparkContext.defaultParallelism,
        "blocks": sum(
            s.get("blocks", 0)
            for k, s in manifest["stages"].items()
            if k.startswith("postings_group_")
        ),
    }

    if args.queries:
        from searchengine_spark.corpus import QUERIES
        from searchengine_spark.index.shards import load_index
        from searchengine_spark.query.wand import wand_topk

        shards = load_index(spark, args.output)
        tq = time.time()
        n = wand_topk(spark, shards, QUERIES, k=10).count()
        out["query_sec"] = round(time.time() - tq, 3)
        out["query_rows"] = n

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
