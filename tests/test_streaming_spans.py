"""Streaming span-level dedup (streaming/spans.py): batch-boundary
equality with the batch op, cross-batch stripping, replay idempotence.
"""

from searchengine_spark.ops.dedup import SPAN_W, strip_dup_spans
from searchengine_spark.streaming.spans import incremental_span_dedup

SCHEMA = "doc_id long, text string"

BOILER = " ".join(f"tok{i}" for i in range(SPAN_W))      # shared w-gram
LOOP = " ".join(["loop"] * (2 * SPAN_W))                 # self-overlap

WAVE1 = [
    (1, BOILER + " unique alpha text one two three four five"),
    (2, "fresh words here " + BOILER),            # in-batch dup of doc 1
    (3, "completely unrelated content nothing shared at all here ok"),
]
WAVE2 = [
    (4, "second wave starts " + BOILER + " trailing bits"),  # cross-batch
    (5, LOOP),                                   # self-overlapping run
    (6, "novel closing document with plenty of original tokens inside"),
]


def _drain(spark, tmp, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(f"{tmp}/in")
    incremental_span_dedup(
        spark, f"{tmp}/in", f"{tmp}/store", f"{tmp}/out", f"{tmp}/ckpt"
    )


def test_streaming_equals_batch_on_docid_ordered_waves(spark, tmp_path):
    """Waves partition the corpus in doc_id order, so the arrival rule
    coincides with the batch rule: streamed output must EQUAL
    strip_dup_spans over the union."""
    tmp = str(tmp_path)
    _drain(spark, tmp, WAVE1)
    _drain(spark, tmp, WAVE2)

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in spark.read.parquet(f"{tmp}/out").collect()
    }
    want_df = strip_dup_spans(
        spark.createDataFrame(WAVE1 + WAVE2, SCHEMA)
    )
    want = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
        for r in want_df.collect()
    }
    assert got == want
    assert len(got) == 6
    # the planted semantics really happened
    assert got[1][1] == 0 or got[1][1] < got[1][0]  # canonical holder
    assert got[2][1] >= SPAN_W                      # in-batch dup strip
    assert got[4][1] >= SPAN_W                      # cross-batch strip
    assert got[5][1] > 0                            # self-overlap strip
    assert got[3][1] == 0 and got[6][1] == 0        # unique docs intact


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """A second drain with the same checkpoint and no new files must
    change nothing: no new output batches, no new store generations,
    no new tags."""
    import json
    import os

    tmp = str(tmp_path)
    _drain(spark, tmp, WAVE1)

    def state():
        with open(f"{tmp}/store/manifest.json") as f:
            m = json.load(f)
        outs = sorted(
            d for d in os.listdir(f"{tmp}/out") if d.startswith("batch=")
        )
        rows = spark.read.parquet(f"{tmp}/out").count()
        return m["generations"], m["tags"], outs, rows

    before = state()
    incremental_span_dedup(
        spark, f"{tmp}/in", f"{tmp}/store", f"{tmp}/out", f"{tmp}/ckpt"
    )
    assert state() == before

    # an all-duplicate wave strips everything and adds NO generation
    _drain(spark, tmp, [(7, WAVE1[0][1])])
    gens, tags, outs, rows = state()
    assert gens == before[0]          # no new shingles entered the store
    assert len(tags) == len(before[1]) + 1
    got7 = {
        r["doc_id"]: r for r in spark.read.parquet(f"{tmp}/out").collect()
    }[7]
    assert got7["n_removed"] == got7["n_tokens"]
    assert got7["clean_text"] == ""
