"""Streaming CMS store (streaming/sketch.py): the assembled sketch
equals the batch op over the union under an ARBITRARY (deliberately
non-ordered) micro-batch split — counter mergeability — and replays
append nothing."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from searchengine_spark.ops.mix import cms_heavy_hitters
from searchengine_spark.streaming.sketch import (
    incremental_cms,
    read_cms_heavy_hitters,
)

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, table, order):
    """Chunks in a shuffled doc order — CMS needs NO ordered waves."""
    os.makedirs(dirpath, exist_ok=True)
    import time

    now = time.time()
    for i, idx in enumerate(order):
        pq.write_table(
            table.take(idx),
            os.path.join(dirpath, f"chunk{i}.parquet"),
        )
        os.utime(os.path.join(dirpath, f"chunk{i}.parquet"),
                 (now + i, now + i))


def test_stream_sketch_equals_batch_any_split(spark, tmp_path):
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    n = docs.num_rows
    # interleaved, deliberately non-contiguous split
    order = [
        list(range(0, n, 3)), list(range(2, n, 3)), list(range(1, n, 3)),
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs, order)

    incremental_cms(spark, src, out, ckpt, max_files_per_trigger=1)
    got = [
        (r["term"], r["n_est"], r["n_exact"], r["err"])
        for r in read_cms_heavy_hitters(spark, out).collect()
    ]
    want = [
        (r["term"], r["n_est"], r["n_exact"], r["err"])
        for r in cms_heavy_hitters(spark, SF).collect()
    ]
    assert got == want and len(got) > 0

    # replay: nothing changes, tags suppress the batches
    man_before = json.load(open(os.path.join(out, "manifest.json")))
    incremental_cms(spark, src, out, ckpt, max_files_per_trigger=1)
    man_after = json.load(open(os.path.join(out, "manifest.json")))
    assert man_after == man_before
    again = [
        (r["term"], r["n_est"], r["n_exact"], r["err"])
        for r in read_cms_heavy_hitters(spark, out).collect()
    ]
    assert again == got
