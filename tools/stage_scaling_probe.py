"""Stage-level scaling probe: the engine's hot kernels at N vs 4N cores.

Supplementary evidence for BASELINE.md: whole-job wall-clock efficiency
on this time-shared sandbox is dominated by host noise and per-job fixed
cost, so this probe isolates the stages that dominate a 10^12-file build
— the Arrow-batched analyze (tokenize+stem+count) and simhash UDFs over
an in-memory corpus — where scaling reflects the engine, not the box.

    python tools/stage_scaling_probe.py [n_docs=60000]

Prints one JSON line with per-core-count stage times and efficiencies.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(cpus: int, n_docs: int):
    from pyspark.sql import SparkSession

    from searchengine_spark.corpus import synth_corpus
    from searchengine_spark.text.udfs import (
        POSTINGS_SCHEMA,
        SIMHASH_SCHEMA,
        analyze_partition,
        make_simhash_partition,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = [
        (i + 1, r["content"]) for i, r in enumerate(synth_corpus(n_docs))
    ]
    df = (
        spark.createDataFrame(rows, "docid long, content string")
        .repartition(cpus * 2)
        .persist()
    )
    df.count()  # materialize before timing

    # two timed iterations per stage, keep the min: the first pays
    # python-worker spin-up and JIT; the min is the steady-state figure
    # a long cluster job actually runs at
    t_analyze = []
    n_postings = 0
    for _ in range(2):
        t0 = time.time()
        n_postings = df.mapInPandas(
            analyze_partition, schema=POSTINGS_SCHEMA
        ).count()
        t_analyze.append(time.time() - t0)

    t_simhash = []
    for _ in range(2):
        t0 = time.time()
        df.mapInPandas(
            make_simhash_partition(64), schema=SIMHASH_SCHEMA
        ).count()
        t_simhash.append(time.time() - t0)

    # block-decode kernel (the WAND/fetch_postings hot path): synthetic
    # 128-posting blocks with positions, decoded via the Arrow-native
    # decode_blocks (numpy varbyte kernel underneath)
    import random

    from searchengine_spark.index.shards import DECODE_SCHEMA, decode_blocks
    from searchengine_spark.index.varbyte import encode_block

    rng = random.Random(5)
    n_blocks = max(2000, n_docs // 2)
    payloads = []
    base = 0
    for i in range(n_blocks):
        ids = sorted(rng.sample(range(base + 1, base + 100_000), 128))
        base += 100_000
        tfs = [rng.randint(1, 9) for _ in ids]
        poss = [sorted(rng.sample(range(1, 500), 4)) for _ in ids]
        payloads.append((f"t{i % 97}", bytearray(encode_block(ids, tfs, poss))))
    bdf = (
        spark.createDataFrame(payloads, "term string, payload binary")
        .repartition(cpus * 2)
        .persist()
    )
    bdf.count()
    t_decode = []
    for _ in range(2):
        t0 = time.time()
        bdf.mapInArrow(decode_blocks, schema=DECODE_SCHEMA).count()
        t_decode.append(time.time() - t0)

    # span-level dedup (ops/dedup.span_dedup): the shingle-hash shuffle
    # + payload-free flag join — the round-3 dedup family's hot shape
    from searchengine_spark.ops.dedup import span_dedup

    sdocs = df.selectExpr("docid AS doc_id", "content AS text")
    t_span = []
    for _ in range(2):
        t0 = time.time()
        span_dedup(sdocs).count()
        t_span.append(time.time() - t0)

    # chunk-membership explode + per-chunk TF agg (ops/passages — the
    # passage family's hot shape: arithmetic explode, shuffle on
    # (doc, chunk, term))
    from pyspark.sql import functions as F

    from searchengine_spark.ops.passages import chunk_tokens_from
    from searchengine_spark.text.tokenizer import TOKEN_PATTERN

    toks = sdocs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("pos0", "term"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "term"
    )
    t_chunk = []
    for _ in range(2):
        t0 = time.time()
        chunk_tokens_from(toks).groupBy(
            "doc_id", "chunk_id", "term"
        ).count().count()
        t_chunk.append(time.time() - t0)

    # interpolated-bigram LM (ops/mix.bigram_logprob's hot shape):
    # token explode -> per-doc lag window -> two count aggs + equi-joins
    # — the curation family's widest shuffle chain
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("prev", F.lag("term").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "term")
    )
    t_bigram = []
    for _ in range(2):
        t0 = time.time()
        c2 = pairs.groupBy("prev", "term").agg(F.count("*").alias("c2"))
        c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
        pairs.join(c2, ["prev", "term"]).join(c1, "prev").groupBy(
            "doc_id"
        ).count().count()
        t_bigram.append(time.time() - t0)

    # event-time family (ops/events): synthetic deterministic event
    # stream — the as-of per-key window merge scan and the 2-bucket
    # range-join shape, the round-3 fourth-continuation hot kernels
    # floor: sub-second walls measure per-job fixed cost, not scaling
    n_events = max(n_docs * 4, 6_000_000)
    horizon_us = 30 * 86_400 * 1_000_000
    ev = (
        spark.range(n_events)
        .select(
            (F.col("id") % 512).alias("user"),
            F.pmod(F.col("id") * 2654435761, F.lit(horizon_us))
            .alias("us"),
            (F.col("id") % 3 == 0).cast("long").alias("kind"),
            (F.col("id") % 5).alias("etype"),
            F.col("id").alias("event_id"),
        )
        .repartition(cpus * 2)
        .persist()
    )
    ev.count()

    wz = (
        Window.partitionBy("user")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_src = F.last(
        F.when(F.col("kind") == 0, F.struct("us", "event_id")),
        ignorenulls=True,
    ).over(wz)
    t_asof = []
    for _ in range(2):
        t0 = time.time()
        # aggregate over the lag so the window cannot be pruned away
        ev.withColumn("_ls", last_src).filter(
            F.col("kind") == 1
        ).agg(
            F.sum(
                F.coalesce(F.col("us") - F.col("_ls.us"), F.lit(-1))
            )
        ).collect()
        t_asof.append(time.time() - t0)

    gap_us = 600 * 1_000_000
    lft = ev.select(
        "etype", F.col("us").alias("us_a"),
        F.explode(
            F.array(
                (F.col("us") / gap_us).cast("long"),
                (F.col("us") / gap_us).cast("long") + 1,
            )
        ).alias("tag"),
    )
    rgt = ev.select(
        "etype", F.col("us").alias("us_b"),
        (F.col("us") / gap_us).cast("long").alias("tag"),
    )
    t_rangejoin = []
    for _ in range(2):
        t0 = time.time()
        lft.join(rgt, ["etype", "tag"]).filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") <= F.col("us_a") + gap_us)
        ).groupBy("etype").count().count()
        t_rangejoin.append(time.time() - t0)

    spark.stop()
    return {"analyze": round(min(t_analyze), 2),
            "simhash": round(min(t_simhash), 2),
            "decode": round(min(t_decode), 2),
            "span": round(min(t_span), 2),
            "chunk": round(min(t_chunk), 2),
            "bigram": round(min(t_bigram), 2),
            "asof": round(min(t_asof), 2),
            "rangejoin": round(min(t_rangejoin), 2),
            "n_blocks": n_blocks,
            "postings": n_postings}


def main():
    if "--single" in sys.argv:
        i = sys.argv.index("--single")
        print(json.dumps(run(int(sys.argv[i + 1]), int(sys.argv[i + 2]))))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    lo, hi = 4, 16
    # one subprocess per core count: driver memory only applies at JVM
    # launch, and a fresh JVM per leg keeps the legs independent
    import subprocess

    res = {}
    for c in (lo, hi):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--single", str(c), str(n_docs)],
            capture_output=True, text=True,
        )
        lines = [ln for ln in p.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(p.stderr[-3000:])
            raise RuntimeError(f"probe failed at local[{c}]")
        res[c] = json.loads(lines[-1])
    out = {
        "metric": f"hot-stage scaling (local[{lo}] vs local[{hi}])",
        "n_docs": n_docs,
        "stages": res,
    }
    for s in ("analyze", "simhash", "decode", "span", "chunk", "bigram",
              "asof", "rangejoin"):
        speedup = res[lo][s] / res[hi][s]
        out[f"{s}_speedup"] = round(speedup, 3)
        out[f"{s}_efficiency"] = round(speedup / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
