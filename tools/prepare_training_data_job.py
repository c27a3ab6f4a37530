"""spark-submit job: documents → curated training-data parquet.

The deploy surface for the curation operator family — the counterpart
of tools/build_index_job.py for the training-data side:

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/prepare_training_data_job.py \
        --input /root/testdata/sf0.1 --output /tmp/curated

Stages (each an oracled first-class operator; this job is pure
composition, no new semantics):

    training_data_prep   exact dedup → MinHash near-dup → one-pass
                         token features → quality gate → token-budget
                         prefix cut (ops/prep.py)
    decontaminate        drop docs sharing a 13-gram with the held-out
                         eval slice (ops/mix.py)
    stratified_sample    deterministic per-language hash-threshold
                         downsampling (ops/mix.py)

The survivors' text is re-joined and written as parquet, plus a
per-language mixture report of the FINAL corpus (the numbers a
pre-training run feeds into its sampling weights).  Prints ONE JSON
line with per-stage counts and wall times.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="sf dir with documents.parquet")
    ap.add_argument("--output", required=True, help="curated output dir")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--strip-spans", action="store_true",
                    help="span-level dedup of the FINAL corpus: rewrite "
                         "text with non-canonical duplicated spans "
                         "removed (ops/dedup.strip_dup_spans)")
    ap.add_argument("--pack", type=int, metavar="SEQ_LEN", default=None,
                    help="also pack the curated corpus into fixed "
                         "SEQ_LEN-token training sequences "
                         "(ops/prep.pack_sequences_df) under "
                         "<output>/packed")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    b = (
        SparkSession.builder.appName("searchengine-prepare-data")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
    )
    if args.shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(args.shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.ops.mix import (
        DECON_EVAL_MOD,
        decontaminate,
        stratified_sample,
        token_count_col,
    )
    from searchengine_spark.ops.prep import training_data_prep

    docs = spark.read.parquet(f"{args.input}/documents.parquet")
    n_input = docs.count()
    t = {}

    t0 = time.time()
    kept = training_data_prep(spark, args.input).select(
        "doc_id", "lang_pred", "n_pieces_bpe"
    ).persist()
    n_prep = kept.count()
    t["prep_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    # the eval slice is the BENCHMARK — held out entirely, never
    # trained on; decontaminate then flags the train docs that leak it
    flagged = decontaminate(spark, args.input).select("doc_id")
    kept2 = (
        kept.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(flagged, "doc_id", "left_anti")
        .persist()
    )
    n_decon = kept2.count()
    t["decon_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    sampled = stratified_sample(spark, args.input).select("doc_id")
    final_ids = kept2.join(sampled, "doc_id").persist()
    n_final = final_ids.count()
    t["sample_sec"] = round(time.time() - t0, 3)

    final = final_ids.join(docs, "doc_id").select(
        "doc_id", "lang", "text", "n_pieces_bpe"
    )
    n_span_tokens = None
    if args.strip_spans:
        # span-level dedup runs over the FINAL survivor set (after doc
        # dedup/decon/sampling): canonicals are picked among the docs
        # that will actually ship
        from searchengine_spark.ops.dedup import strip_dup_spans

        t0 = time.time()
        cleaned = strip_dup_spans(
            final.select("doc_id", "text")
        ).persist()
        n_span_tokens = cleaned.agg(
            F.sum("n_removed").alias("s")
        ).collect()[0]["s"]
        final = final.drop("text").join(
            cleaned.select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        )
        t["span_sec"] = round(time.time() - t0, 3)

    n_sequences = None
    if args.pack:
        from searchengine_spark.ops.prep import pack_sequences_df

        t0 = time.time()
        packed = pack_sequences_df(
            final.select("doc_id", "text"), seq_len=args.pack
        )
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")
        n_sequences = spark.read.parquet(
            f"{args.output}/packed"
        ).count()
        t["pack_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    final.write.mode("overwrite").parquet(f"{args.output}/curated")
    # per-language mixture of the FINAL corpus (engine tokenizer spec)
    mix = (
        final.select("lang", token_count_col().alias("_n"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("_n").alias("n_tokens"))
    )
    mix.write.mode("overwrite").parquet(f"{args.output}/mixture")
    t["write_sec"] = round(time.time() - t0, 3)

    wall = sum(v for k, v in t.items() if k.endswith("_sec"))
    print(json.dumps({
        "metric": "training-data curation throughput",
        "unit": "docs/sec",
        "input": args.input,
        "n_input": n_input,
        "n_after_prep": n_prep,
        "n_after_decon": n_decon,
        "n_final": n_final,
        "span_tokens_removed": n_span_tokens,
        "n_sequences": n_sequences,
        "wall_sec": round(wall, 3),
        "value": round(n_input / wall, 2) if wall else None,
        **t,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
