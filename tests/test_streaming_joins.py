"""Watermarked stream-stream interval join (streaming/joins.py):
ordered-waves equality vs the batch inequality join, and the planted
bounds (inclusive both ends, cross-batch match survives the
watermark)."""

import os
import time

import pandas as pd

from searchengine_spark.streaming.joins import clickstream_join_stream

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, chunks):
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
        clickstream_join_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not drain within 300s"
    return spark.table(name).toPandas()


def _brute_force(pdf, gap_sec=600):
    """The batch spec: every same-user (click, purchase) pair with
    0 <= lag <= gap."""
    clicks = pdf[pdf.event_type == "click"]
    purch = pdf[pdf.event_type == "purchase"]
    out = []
    for p in purch.itertuples():
        for c in clicks[clicks.user_id == p.user_id].itertuples():
            lag = (p.ts - c.ts).value  # ns
            if 0 <= lag <= gap_sec * 1_000_000_000:
                out.append(
                    (p.event_id, c.event_id, p.user_id, lag // 1000)
                )
    return sorted(out)


def test_stream_join_equals_batch_on_ordered_waves(spark, tmp_path):
    """Event-time-ordered micro-batches reproduce the batch inequality
    join exactly — every (purchase, click) match with its exact lag."""
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
    out = _drain_memory(spark, src, "ssj_mem")

    got = sorted(
        (r.event_id, r.click_id, r.user_id, r.lag_us)
        for r in out.itertuples()
    )
    want = _brute_force(pdf)
    assert len(want) > 0, "sf0.001 must contain in-gap pairs"
    assert got == want


def test_stream_join_bounds_and_cross_batch(spark, tmp_path):
    """Inclusive bounds at both ends (lag 0 and lag == gap match, one
    microsecond beyond does not), a purchase matches EVERY in-gap
    click (all-touch), and a match whose sides arrive in different
    micro-batches still emits (join state carries the click)."""
    T = pd.Timestamp

    def ev(eid, ts, etype, user=1):
        return {
            "event_id": eid, "ts": ts, "user_id": user,
            "event_type": etype, "value": 1.0, "props": "{}",
        }

    chunks = [
        pd.DataFrame([
            ev(1, T("2024-01-01 09:00:00"), "click"),
            ev(2, T("2024-01-01 09:05:00"), "click"),
            # same-instant purchase: lag 0 matches click 3 only
            ev(3, T("2024-01-01 09:05:00"), "click"),
        ]),
        pd.DataFrame([
            # lag vs click1 = 600s exactly (inclusive), vs click2/3
            # = 300s — matches all three (all-touch)
            ev(4, T("2024-01-01 09:10:00"), "purchase"),
        ]),
        pd.DataFrame([
            # 600s + 1us after click 2: out of window for click 2,
            # within for click 3?  no — clicks 2 and 3 share a ts, so
            # both are out; click 1 is long gone.  no matches.
            ev(5, T("2024-01-01 09:15:00.000001"), "purchase"),
        ]),
    ]
    src = str(tmp_path / "events.parquet")
    _write_chunks(src, chunks)
    out = _drain_memory(spark, src, "ssj_bounds")
    got = sorted(
        (r.event_id, r.click_id, r.lag_us) for r in out.itertuples()
    )
    s = 1_000_000
    assert got == [
        (4, 1, 600 * s),
        (4, 2, 300 * s),
        (4, 3, 300 * s),
    ]
