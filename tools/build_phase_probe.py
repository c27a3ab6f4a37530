"""Instrumented decomposition of the index build into its phases.

Repeatable source of the BASELINE.md "build phase split" table: runs the
same stages as index.pipeline.build_tables + shards.write_index, but
forces a materialization at each phase boundary so the wall clock can be
attributed.  The forced barriers serialize work the real pipeline
overlaps (write_index interleaves the docs write with the postings
materialization), so phase sums slightly EXCEED the real build wall —
this probe ranks bottlenecks, it does not replace build_index_job
throughput numbers.

    python tools/build_phase_probe.py [--multiply 64] [--cpus 16] \
        [--input /root/testdata/sf0.1]

Prints one JSON line of per-phase seconds.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.1")
    ap.add_argument("--multiply", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--scratch", default="/dev/shm/se_phase"
                    if os.path.isdir("/dev/shm") else None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("build-phase-probe")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if args.scratch:
        os.makedirs(args.scratch, exist_ok=True)
        b = b.config("spark.local.dir", os.path.join(args.scratch, "local"))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.corpus.ingest import (
        documents_as_corpus,
        multiply_corpus,
    )
    from searchengine_spark.index.pipeline import (
        _dedup_exact,
        _dedup_simhash,
        assign_docids,
        simhash_dropped,
    )
    from searchengine_spark.index.shards import write_index
    from searchengine_spark.index import build_tables

    corpus = multiply_corpus(
        documents_as_corpus(spark, args.input), args.multiply
    )
    phases = {}

    t0 = time.time()
    ids, n_total = assign_docids(corpus, order="hash", with_count=True)
    ids = ids.persist()
    ids.count()
    phases["assign_docids"] = round(time.time() - t0, 2)

    t0 = time.time()
    nonempty = ids.filter(
        F.length(F.regexp_replace(F.col("content"), r"\s", "")) > 0
    )
    alive = _dedup_exact(nonempty).persist()
    alive.count()
    phases["sha_dedup"] = round(time.time() - t0, 2)

    t0 = time.time()
    from searchengine_spark.text.udfs import (
        SIMHASH_SCHEMA,
        make_simhash_partition,
    )

    fps = (
        alive.select("docid", "content")
        .mapInPandas(make_simhash_partition(64), schema=SIMHASH_SCHEMA)
        .persist()
    )
    fps.count()
    phases["simhash_udf"] = round(time.time() - t0, 2)

    t0 = time.time()
    survivors = alive.join(
        simhash_dropped(fps, 64), "docid", "left_anti"
    ).persist()
    n_survivors = survivors.count()
    phases["lsh_antijoin"] = round(time.time() - t0, 2)

    t0 = time.time()
    from searchengine_spark.text.udfs import (
        POSTINGS_SCHEMA,
        make_analyze_partition_arrow,
    )

    postings_full = (
        survivors.select("docid", "content")
        .mapInArrow(
            make_analyze_partition_arrow(stem=True), schema=POSTINGS_SCHEMA
        )
        .persist()
    )
    n_postings = postings_full.count()
    phases["analyze_udf"] = round(time.time() - t0, 2)
    for df in (postings_full, survivors, fps, alive, ids):
        df.unpersist()

    # whole-build reference points: build_tables alone, then + write_index
    t0 = time.time()
    tables = build_tables(
        spark, corpus, compute_quality=False,
        simhash_bits=64, id_order="hash",
    )
    tables.postings.count()
    phases["build_tables_total"] = round(time.time() - t0, 2)

    out_dir = tempfile.mkdtemp(prefix="se_phase_idx_", dir=args.scratch)
    try:
        t0 = time.time()
        write_index(spark, tables, out_dir)
        phases["write_index"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    print(json.dumps({
        "metric": "build phase split",
        "input": args.input,
        "multiply": args.multiply,
        "cpus": args.cpus,
        "n_docs": n_total,
        "n_survivors": n_survivors,
        "n_postings": n_postings,
        "phases": phases,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
