"""Streaming trigram ingest (streaming/trigram.py): the shard after
draining micro-batches serves identically to a one-shot build over
the union, replays append nothing, and a cross-batch doc_id resend
cannot double coverage rows."""

import json
import os
import time

import pyarrow.parquet as pq

from searchengine_spark.index.trigram import (
    build_trigram_index,
    substring_topk_ondisk,
)
from searchengine_spark.streaming.trigram import incremental_trigram

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, table, slices):
    os.makedirs(dirpath, exist_ok=True)
    now = time.time()
    for i, idx in enumerate(slices):
        p = os.path.join(dirpath, f"chunk{i}.parquet")
        pq.write_table(table.take(idx), p)
        os.utime(p, (now + i, now + i))


def test_streamed_shard_equals_one_shot_build(spark, tmp_path):
    docs_t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs_t.num_rows
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )

    # seed shard from the first third; stream the rest in two batches,
    # the second RESENDING some first-batch rows (cross-batch overlap)
    third = n // 3
    d = str(tmp_path / "tri")
    build_trigram_index(
        spark, docs.limit(0).unionByName(
            spark.createDataFrame(
                docs_t.take(list(range(third))).to_pandas()
            )
        ), d,
    )
    src = str(tmp_path / "in")
    _write_chunks(src, docs_t, [
        list(range(third, 2 * third)),
        list(range(2 * third - 5, n)),   # overlaps 5 rows of batch 1
    ])
    ckpt = str(tmp_path / "ckpt")
    incremental_trigram(spark, src, d, ckpt, max_files_per_trigger=1)

    d_full = str(tmp_path / "tri_full")
    build_trigram_index(spark, docs, d_full)
    q = "table hash"
    inc = [tuple(r) for r in
           substring_topk_ondisk(spark, d, docs, q, k=20).collect()]
    full = [tuple(r) for r in
            substring_topk_ondisk(spark, d_full, docs, q, k=20).collect()]
    assert inc == full and len(inc) > 0

    # availableNow replay: tags suppress everything, manifest unchanged
    man_before = json.load(open(os.path.join(d, "trigram_index.json")))
    incremental_trigram(spark, src, d, ckpt, max_files_per_trigger=1)
    man_after = json.load(open(os.path.join(d, "trigram_index.json")))
    assert man_after == man_before
    assert man_after["n_docs"] == n
