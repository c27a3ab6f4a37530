"""Streaming decontamination gate (streaming/decon.py): the surviving
set must equal the batch operator's survivors on the same data, across
micro-batches, and stay exactly-once across an availableNow restart.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.mix import DECON_EVAL_MOD, decontaminate
from searchengine_spark.streaming.decon import (
    decontaminate_stream,
    eval_shingle_set,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


def _write_chunks(dirpath, table, n_chunks):
    os.makedirs(dirpath, exist_ok=True)
    n = table.num_rows
    step = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        pq.write_table(
            table.slice(i * step, step),
            os.path.join(dirpath, f"chunk{i}.parquet"),
        )


def test_stream_matches_batch_decontaminate(spark, docs_table, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # train_docs wires the hot-shingle cap contract (a no-op at this
    # corpus size — no shingle nears the cap — but the equivalence
    # below is only exact with the cap expressed on the eval side)
    shingles = eval_shingle_set(
        docs,
        train_docs=docs.filter(
            F.col("doc_id") % DECON_EVAL_MOD != 0
        ),
    )
    assert shingles  # fixture must have a non-trivial eval set

    # train-side rows only (the eval slice itself is not streamed —
    # it is the benchmark, not ingest)
    keep = pa.array(
        [v % DECON_EVAL_MOD != 0
         for v in docs_table["doc_id"].to_pylist()]
    )
    train = docs_table.filter(keep)
    src = str(tmp_path / "src")
    _write_chunks(src, train, 3)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    decontaminate_stream(spark, src, shingles, out, ckpt)
    got = {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    }

    flagged = {
        r["doc_id"] for r in decontaminate(spark, SF).collect()
    }
    train_ids = set(train["doc_id"].to_pylist())
    assert got == train_ids - flagged
    assert flagged, "fixture must exercise a non-empty contamination set"

    # exactly-once: re-draining with the same checkpoint adds nothing,
    # a NEW file is picked up incrementally
    decontaminate_stream(spark, src, shingles, out, ckpt)
    assert {
        r["doc_id"] for r in spark.read.parquet(out).collect()
    } == got

    clean_extra = train.slice(0, 1)
    extra_id = clean_extra["doc_id"][0].as_py()
    # give the repeat row a fresh doc_id outside the eval slice
    new_id = max(train_ids) + 1 + (
        DECON_EVAL_MOD - (max(train_ids) + 1) % DECON_EVAL_MOD
    ) % DECON_EVAL_MOD + 1
    clean_extra = clean_extra.set_column(
        0, "doc_id", pa.array([new_id], pa.int64())
    )
    pq.write_table(clean_extra, os.path.join(src, "chunk_late.parquet"))
    decontaminate_stream(spark, src, shingles, out, ckpt)
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    expect2 = set(got)
    if extra_id in got:  # its text was clean → the re-keyed copy is too
        expect2.add(new_id)
    assert got2 == expect2


def test_bloom_gate_properties_and_batch_parity(spark, docs_table,
                                                tmp_path):
    """The billions-of-shingles membership structure: (a) built
    distributively, a member is ALWAYS contained (one-sided — no
    false negatives, the guarantee decontamination needs); (b) the
    realized false-positive rate on non-members stays near target;
    (c) swapped into the stream gate, the surviving set still equals
    the batch operator's survivors on this corpus (no false positive
    fires at test scale with fpr=1e-4 — deterministic: the hash rule
    is fixed)."""
    from searchengine_spark.streaming.decon import (
        ShingleBloom,
        eval_shingle_bloom,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    train_docs = docs.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    exact = eval_shingle_set(docs, train_docs=train_docs)
    bloom = eval_shingle_bloom(docs, train_docs=train_docs)

    # (a) no false negatives, ever
    assert all(s in bloom for s in exact)

    # (b) fpr near target (fixed hash rule -> deterministic outcome)
    probes = [f"zz{i} yy{i} xx{i}" for i in range(20_000)]
    fp = sum((p not in exact) and (p in bloom) for p in probes)
    assert fp / len(probes) <= 5e-4

    # sizing sanity: power-of-two m, k >= 1
    m, k = ShingleBloom.params(10**9, 1e-2)
    assert m & (m - 1) == 0 and k >= 1

    # (c) stream survivors through the Bloom == through the exact set
    keep = pa.array(
        [v % DECON_EVAL_MOD != 0
         for v in docs_table["doc_id"].to_pylist()]
    )
    train = docs_table.filter(keep)
    src = str(tmp_path / "src")
    _write_chunks(src, train, 2)
    out_b = str(tmp_path / "out_bloom")
    out_e = str(tmp_path / "out_exact")
    decontaminate_stream(spark, src, bloom, out_b,
                         str(tmp_path / "ck_b"))
    decontaminate_stream(spark, src, exact, out_e,
                         str(tmp_path / "ck_e"))
    got_b = sorted(
        r["doc_id"] for r in spark.read.parquet(out_b).collect()
    )
    got_e = sorted(
        r["doc_id"] for r in spark.read.parquet(out_e).collect()
    )
    assert got_b == got_e
