"""Streaming percolator (streaming/percolate.py): alerts across
micro-batches must equal the batch operator (ops/search.percolate)
over the same documents, and an availableNow restart with no new
files must append nothing (exactly-once per input file).
"""

import os

import pyarrow.parquet as pq
import pytest

from searchengine_spark.ops.search import percolate
from searchengine_spark.streaming.percolate import percolate_stream

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


def test_stream_alerts_match_batch_percolate(spark, docs_table, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs_table, 3)

    percolate_stream(spark, src, out, ckpt)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = [
        (r["qid"], r["doc_id"]) for r in percolate(spark, SF).collect()
    ]
    assert got == want
    assert got, "fixture must fire at least one alert"
    # every standing query alerted at least once at this corpus size
    assert len({q for q, _ in got}) == 5

    # replay safety: a restart with no new files appends nothing
    percolate_stream(spark, src, out, ckpt)
    again = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got

    # a late-arriving chunk alerts incrementally (only the new doc)
    extra = docs_table.slice(0, 1).to_pylist()[0]
    late_id = max(d for _, d in got) + 10_000
    import pyarrow as pa

    late = pa.Table.from_pylist([{**extra, "doc_id": late_id}])
    pq.write_table(late, os.path.join(src, "late.parquet"))
    percolate_stream(spark, src, out, ckpt)
    final = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    new_rows = sorted(set(final) - set(got))
    base_doc = extra["doc_id"]
    assert new_rows == sorted(
        (q, late_id) for q, d in got if d == base_doc
    )


def test_rich_stream_alerts_match_batch(spark, docs_table, tmp_path):
    """The rich gate (bare/phrase/-not) equals ops/search.
    percolate_rich over the same docs, and replays append nothing."""
    from searchengine_spark.ops.search import percolate_rich
    from searchengine_spark.streaming.percolate import (
        percolate_rich_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs_table, 3)

    percolate_rich_stream(spark, src, out, ckpt)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = [
        (r["qid"], r["doc_id"])
        for r in percolate_rich(spark, SF).collect()
    ]
    assert got == want
    assert len({q for q, _ in got}) == 5  # every rich query fires

    percolate_rich_stream(spark, src, out, ckpt)
    again = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got
