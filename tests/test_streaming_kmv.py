"""Streaming KMV sketch (streaming/kmv.py): order-INDEPENDENT
equality with the batch op — the merge-exact property no ordered-waves
caveat is needed for — plus monotone refresh and replay suppression."""

import os
import time

import pandas as pd
import pytest

from searchengine_spark.ops.mix import kmv_distinct
from searchengine_spark.streaming.kmv import kmv_stream

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, chunks):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(chunks):
        p = os.path.join(dirpath, f"chunk{i}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False), p
        )
        os.utime(p, (now + i, now + i))


def _drain(spark, src_dir, name):
    q = (
        kmv_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within 300s"
    return spark.table(name).toPandas()


def test_stream_equals_batch_under_any_split(spark, tmp_path):
    """The FINAL per-language (kth, n_est) equals the batch sketch for
    an adversarial split: docs shuffled by md5 of doc_id (not
    event-time, not doc order) into 3 waves.  KMV merge is min-k of a
    union — order cannot matter, and this pins it."""
    import hashlib

    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    pdf = pdf.sort_values(
        "doc_id",
        key=lambda s: s.map(
            lambda d: hashlib.md5(str(d).encode()).hexdigest()
        ),
    ).reset_index(drop=True)
    n = len(pdf)
    chunks = [pdf.iloc[: n // 3], pdf.iloc[n // 3: 2 * n // 3],
              pdf.iloc[2 * n // 3:]]
    src = str(tmp_path / "documents.parquet")
    _write_chunks(src, chunks)
    out = _drain(spark, src, "kmv_mem")

    # last emitted row per language == the batch sketch columns
    final = {
        r.lang: (r.kth, r.n_est)
        for r in out.itertuples()  # append order: later rows win
    }
    want = {
        r["lang"]: (r["kth"], r["n_est"])
        for r in kmv_distinct(spark, SF).collect()
    }
    assert final == want

    # refreshes are monotone: kth never increases for a language
    for lang, g in out.groupby("lang"):
        ks = g["kth"].tolist()
        assert ks == sorted(ks, reverse=True)


def test_replay_emits_nothing_new(spark, tmp_path):
    """An availableNow re-run over the same checkpoint emits no rows
    (sketch unchanged == no emission) — the file sink stays
    exactly-once."""
    pdf = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    src = str(tmp_path / "documents.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, [pdf])

    def run():
        q = (
            kmv_stream(spark, src, max_files_per_trigger=1)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("overwrite").parquet(
                    f"{out}/batch={bid}"
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    run()
    first = spark.read.parquet(out).toPandas()
    assert len(first) == 5  # one full-sketch row per language
    run()
    again = spark.read.parquet(out).toPandas()
    assert len(again) == 5
