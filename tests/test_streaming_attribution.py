"""Stateful streaming as-of attribution (streaming/attribution.py):
ordered-waves equality vs the batch op, and the cross-batch as-of
guard (a late purchase never attributes a click from its future)."""

import os
import time

import pandas as pd

from searchengine_spark.ops.events import asof_attribution
from searchengine_spark.streaming.attribution import attribution_stream

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
        attribution_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within 300s"
    return spark.table(name).toPandas()


def test_stream_equals_batch_on_ordered_waves(spark, tmp_path):
    """Event-time-ordered micro-batches reproduce the batch as-of join
    exactly — every purchase row (click_id AND exact lag) matches
    ops/events.asof_attribution on the same events."""
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
    out = _drain_memory(spark, src, "attr_mem")

    batch = asof_attribution(spark, SF).toPandas()
    got = out.sort_values("event_id").reset_index(drop=True)
    want = batch.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "click_id", "lag_us"]],
        want[["event_id", "user_id", "click_id", "lag_us"]],
    )


def test_cross_batch_asof_guard(spark, tmp_path):
    """Across out-of-order batches the as-of rule still holds: a
    purchase older than the state click emits unmatched instead of
    attributing a click from its future, a late click older than the
    state cannot replace it, and state persists across batches."""
    T = pd.Timestamp

    def ev(eid, ts, etype, user=1):
        return {
            "event_id": eid, "ts": ts, "user_id": user,
            "event_type": etype, "value": 1.0, "props": "{}",
        }

    chunks = [
        pd.DataFrame([ev(5, T("2024-01-01 10:00:00"), "click")]),
        # purchase OLDER than the state click — must emit unmatched
        pd.DataFrame([ev(6, T("2024-01-01 09:00:00"), "purchase")]),
        # late click older than state — must NOT replace it
        pd.DataFrame([ev(7, T("2024-01-01 08:00:00"), "click")]),
        # in-order purchase — attributes the 10:00 click, not the late one
        pd.DataFrame([ev(8, T("2024-01-01 11:00:00"), "purchase")]),
    ]
    src = str(tmp_path / "events.parquet")
    _write_chunks(src, chunks)
    out = _drain_memory(spark, src, "attr_guard")
    rows = sorted(
        (r.event_id, r.click_id, r.lag_us) for r in out.itertuples()
    )
    hour = 3_600_000_000
    assert rows == [(6, 0, -1), (8, 5, hour)]
