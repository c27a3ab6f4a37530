"""Stateful streaming funnel (streaming/funnel.py): ordered-waves
equality vs the batch rule, cross-batch strictness (no retro-advance),
and checkpoint replay suppression."""

import os
import time

import pandas as pd
import pytest

from searchengine_spark.ops.events import FUNNEL_STEPS, funnel_conversion
from searchengine_spark.streaming.funnel import (
    funnel_stream,
    run_funnel_stream,
)

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, chunks):
    """One parquet file per chunk with strictly increasing mtimes so
    FileStreamSource (oldest-first) processes them in list order; ts
    written at microsecond unit (the NTZ reader's source unit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(chunks):
        p = os.path.join(dirpath, f"chunk{i}.parquet")
        t = pa.Table.from_pandas(pdf, preserve_index=False)
        j = t.schema.get_field_index("ts")
        t = t.set_column(
            j, pa.field("ts", pa.timestamp("us")),
            t.column("ts").cast(pa.timestamp("us")),
        )
        pq.write_table(t, p)
        os.utime(p, (now + i, now + i))


def _drain_memory(spark, src_dir, name):
    q = (
        funnel_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within 300s"
    return spark.table(name).toPandas()


def _py_reached(pdf):
    """The batch rule, per user: greedy chained min-ts scan."""
    reached = {}
    for user, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        step, t = 0, None
        for r in g.itertuples():
            if (
                step < len(FUNNEL_STEPS)
                and r.event_type == FUNNEL_STEPS[step]
                and (t is None or r.ts > t)
            ):
                step += 1
                t = r.ts
        if step:
            reached[user] = step
    return reached


def test_stream_equals_batch_on_ordered_waves(spark, tmp_path):
    """Event-time-ordered micro-batches reproduce the batch funnel
    exactly: final per-user step == the chained-min rule, and the
    aggregate step counts == funnel_conversion on the same dir."""
    pdf = (
        spark.read.parquet(f"{SF}/events.parquet")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    n = len(pdf)
    chunks = [
        pdf.iloc[: n // 3], pdf.iloc[n // 3: 2 * n // 3],
        pdf.iloc[2 * n // 3:],
    ]
    src = str(tmp_path / "events.parquet")
    _write_chunks(src, chunks)
    out = _drain_memory(spark, src, "funnel_mem")

    got = out.groupby("user_id")["step"].max().to_dict()
    assert got == _py_reached(pdf)

    batch = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(spark, str(tmp_path)).collect()
    }
    for i in range(1, len(FUNNEL_STEPS) + 1):
        assert batch[i] == sum(1 for s in got.values() if s >= i)


def test_cross_batch_strictness_no_retro_advance(spark, tmp_path):
    """A late-arriving event OLDER than an already-taken step cannot
    advance the funnel; a genuinely later event in a later batch can."""
    T = pd.Timestamp

    def ev(eid, ts, etype, user=1):
        return {
            "event_id": eid, "ts": ts, "user_id": user,
            "event_type": etype, "value": 1.0, "props": "{}",
        }

    chunks = [
        pd.DataFrame([ev(1, T("2024-01-01 10:00:00"), "view")]),
        # late click BEFORE the taken view — must not advance
        pd.DataFrame([ev(2, T("2024-01-01 09:00:00"), "click")]),
        # genuinely later click — advances to step 2
        pd.DataFrame([ev(3, T("2024-01-01 11:00:00"), "click")]),
    ]
    src = str(tmp_path / "events.parquet")
    _write_chunks(src, chunks)
    out = _drain_memory(spark, src, "funnel_strict")
    rows = sorted(
        (r.step, r.event_type, str(r.ts)) for r in out.itertuples()
    )
    assert rows == [
        (1, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 11:00:00"),
    ]


def test_checkpoint_replay_suppression(spark, tmp_path):
    """An availableNow re-run over the same checkpoint emits nothing
    new; a new file afterwards advances from the restored state."""
    T = pd.Timestamp
    base = [{
        "event_id": 1, "ts": T("2024-01-01 10:00:00"), "user_id": 7,
        "event_type": "view", "value": 1.0, "props": "{}",
    }]
    src = str(tmp_path / "events.parquet")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, [pd.DataFrame(base)])
    run_funnel_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    first = spark.read.parquet(out).toPandas()
    assert len(first) == 1 and first["step"].iloc[0] == 1

    run_funnel_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    again = spark.read.parquet(out).toPandas()
    assert len(again) == 1  # replay emitted nothing new

    nxt = [{
        "event_id": 2, "ts": T("2024-01-01 11:00:00"), "user_id": 7,
        "event_type": "click", "value": 1.0, "props": "{}",
    }]
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.Table.from_pandas(
        pd.DataFrame(nxt), preserve_index=False
    )
    j = t.schema.get_field_index("ts")
    t = t.set_column(
        j, pa.field("ts", pa.timestamp("us")),
        t.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(t, os.path.join(src, "chunk_late.parquet"))
    run_funnel_stream(spark, src, out, ckpt, max_files_per_trigger=1)
    final = spark.read.parquet(out).toPandas()
    assert sorted(final["step"].tolist()) == [1, 2]  # state restored
