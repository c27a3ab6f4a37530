"""Watermarked event-time windows (streaming/windows.py).

Drives the streaming variant with availableNow + maxFilesPerTrigger=1
(deterministic watermark progression: one file per micro-batch, files
ordered by mtime) and pins the two semantics that matter:

 * closed-window equality — every window the watermark has passed is
   emitted exactly once and equals the batch twin on the same rows;
 * late-data drop — an event arriving after its window closed is
   discarded (the batch twin still counts it; the stream must not).
"""

import os
import time

import pandas as pd
import pytest

from searchengine_spark.streaming.windows import (
    WATERMARK,
    events_windowed,
    windowed_events_stream,
)

SF = "/root/testdata/sf0.001"


def _write_chunks(dirpath, chunks):
    """Write each pandas chunk as one parquet file with strictly
    increasing mtimes so FileStreamSource (oldest-first) processes them
    in list order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dirpath, exist_ok=True)
    now = time.time()
    for i, pdf in enumerate(chunks):
        p = os.path.join(dirpath, f"chunk{i}.parquet")
        t = pa.Table.from_pandas(pdf, preserve_index=False)
        # pandas round-trips ts as timestamp[ns]; Spark's NTZ reader
        # wants the source's microsecond unit
        j = t.schema.get_field_index("ts")
        t = t.set_column(
            j, pa.field("ts", pa.timestamp("us")),
            t.column("ts").cast(pa.timestamp("us")),
        )
        pq.write_table(t, p)
        os.utime(p, (now + i, now + i))


def _run_stream(spark, src_dir, name):
    q = (
        windowed_events_stream(spark, src_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout (it does NOT raise);
    # reading the memory sink then would compare against a half-
    # populated table and fail confusingly — or pass vacuously
    assert q.awaitTermination(300), "stream did not drain within 300s"
    return spark.table(name).toPandas()


def _sorted(df):
    return (
        df.sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module", autouse=True)
def utc_session(spark):
    """The NTZ→TIMESTAMP cast at the stream source interprets wall
    clocks in the session timezone; pin UTC so window boundaries are
    hour-aligned and restore afterwards."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    yield
    spark.conf.set("spark.sql.session.timeZone", old)


@pytest.fixture(scope="module")
def events_pdf(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .orderBy("ts")
        .toPandas()
    )


def test_closed_windows_match_batch_twin(spark, tmp_path, events_pdf):
    n = len(events_pdf)
    chunks = [
        events_pdf.iloc[: n // 3],
        events_pdf.iloc[n // 3 : 2 * n // 3],
        events_pdf.iloc[2 * n // 3 :],
    ]
    src = str(tmp_path / "stream_src")
    _write_chunks(src, chunks)
    got = _sorted(_run_stream(spark, src, "winq1"))

    # expected: the batch twin restricted to windows whose END the
    # final watermark (max ts − delay) has passed
    assert WATERMARK == "30 minutes"
    wm = events_pdf["ts"].max() - pd.Timedelta(minutes=30)
    batch = events_windowed(spark, SF).toPandas()
    ends = pd.to_datetime(batch["window_start"]) + pd.Timedelta(hours=1)
    closed = _sorted(batch[ends <= wm])

    pd.testing.assert_frame_equal(got, closed, check_dtype=False)
    # sanity: the cut is real — some window stayed open
    assert len(closed) < len(batch)
    assert len(closed) > 0


def test_late_event_is_dropped(spark, tmp_path, events_pdf):
    t0 = events_pdf["ts"].min().floor("h")
    late = events_pdf[events_pdf["ts"] < t0 + pd.Timedelta(minutes=50)]
    on_time = events_pdf[events_pdf["ts"] >= t0 + pd.Timedelta(hours=2)]
    assert len(late) > 0 and len(on_time) > 1
    src = str(tmp_path / "late_src")
    # on-time rows first; the late chunk goes in the THIRD micro-batch
    # because the late-events watermark lags the eviction watermark by
    # one batch (the physical plan's two watermark slots) — after two
    # on-time batches it stands well past hour 0's end, so the late
    # event must be discarded
    _write_chunks(
        src, [on_time.iloc[:-1], on_time.iloc[-1:], late.iloc[:1]]
    )
    got = _run_stream(spark, src, "winq2")
    hour0 = t0.strftime("%Y-%m-%d %H:%M:%S")
    # guard against vacuous pass: the on-time hours must have emitted
    assert len(got) > 0
    assert (got["window_start"] == hour0).sum() == 0
    # the batch twin over the same rows WOULD count it
    full = events_windowed(spark, SF).toPandas()
    assert (full["window_start"] == hour0).sum() > 0


def test_session_gap_boundary(spark, tmp_path):
    """A gap EXACTLY equal to the timeout still MERGES (Spark's
    session-window merge test is inclusive — measured); only a strictly
    larger gap splits.  The oracle SQL's `> INTERVAL` pins the same
    rule; a drifted `>=` would split the boundary case."""
    from searchengine_spark.streaming.windows import user_sessions

    rows = pd.DataFrame({
        "event_id": [0, 1, 2],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00",
            "2024-01-01 00:10:00",         # == gap: merges
            "2024-01-01 00:20:00.000001",  # >  gap: splits
        ], format="ISO8601"),
        "user_id": [7, 7, 7],
        "event_type": ["view"] * 3,
        "value": [1.0, 2.0, 3.0],
        "props": ["{}"] * 3,
    })
    src = str(tmp_path / "sess_src")
    _write_chunks(src, [rows])
    # user_sessions reads <dir>/events.parquet — stage the file there
    os.makedirs(str(tmp_path / "sf"), exist_ok=True)
    os.rename(os.path.join(src, "chunk0.parquet"),
              str(tmp_path / "sf" / "events.parquet"))
    got = (user_sessions(spark, str(tmp_path / "sf"))
           .toPandas().sort_values("session_start").reset_index(drop=True))
    assert list(got["n_events"]) == [2, 1]
    assert got["session_start"].iloc[0] == "2024-01-01 00:00:00.000000"
    assert got["session_start"].iloc[1] == "2024-01-01 00:20:00.000001"


def test_sessions_match_python_reference(spark, tmp_path):
    """Randomized (seeded) sessionization check vs a serial pure-Python
    sessionizer implementing the pinned rule: merge while the gap to
    the previous event is <= the 10-minute timeout."""
    import random

    rng = random.Random(20260817)
    base = pd.Timestamp("2024-03-01")
    rows = []
    eid = 0
    for uid in range(1, 21):
        t = base
        for _ in range(rng.randint(1, 60)):
            # gaps cluster around the boundary to stress the rule
            gap_s = rng.choice([1, 60, 599, 600, 601, 1200, 7200])
            t = t + pd.Timedelta(seconds=gap_s)
            rows.append((eid, t, uid, "view", float(eid % 7), "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value",
                 "props"],
    )
    os.makedirs(str(tmp_path / "sf2"), exist_ok=True)
    _write_chunks(str(tmp_path / "chunks"), [pdf])
    os.rename(str(tmp_path / "chunks" / "chunk0.parquet"),
              str(tmp_path / "sf2" / "events.parquet"))

    from searchengine_spark.streaming.windows import user_sessions

    got = (user_sessions(spark, str(tmp_path / "sf2")).toPandas()
           .sort_values(["user_id", "session_start"])
           .reset_index(drop=True))

    expect = []
    for uid, grp in pdf.groupby("user_id"):
        grp = grp.sort_values("ts")
        start, n, sv, prev = None, 0, 0.0, None
        for _, r in grp.iterrows():
            if prev is None or (r["ts"] - prev) > pd.Timedelta(minutes=10):
                if start is not None:
                    expect.append((uid, start, n, round(sv, 6)))
                start, n, sv = r["ts"], 0, 0.0
            n += 1
            sv += r["value"]
            prev = r["ts"]
        expect.append((uid, start, n, round(sv, 6)))
    epdf = pd.DataFrame(
        expect, columns=["user_id", "ts", "n_events", "sum_value"]
    ).sort_values(["user_id", "ts"]).reset_index(drop=True)

    assert len(got) == len(epdf)
    assert (got["user_id"].values == epdf["user_id"].values).all()
    assert (got["n_events"].values == epdf["n_events"].values).all()
    assert (got["session_start"].values
            == epdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S.%f").values).all()
    assert (got["sum_value"].values == epdf["sum_value"].values).all()


def test_event_bursts_match_python(spark, tmp_path):
    """Planted burst: type 'a' has four 2-event hours and one 12-event
    hour; the z formula (exact-integer moments, sample variance) is
    recomputed in Python.  A constant-rate type (var 0) and a
    single-bucket type (c < 2) must be excluded entirely."""
    import math

    rows = []

    def plant(etype, hour, k):
        for i in range(k):
            rows.append(
                (pd.Timestamp(2024, 1, 1, hour, 0, 30)
                 + pd.Timedelta(seconds=i), etype)
            )

    for h, k in enumerate((2, 2, 2, 2, 12)):
        plant("a", h, k)
    for h in range(3):
        plant("flat", h, 3)          # var 0 -> excluded
    plant("solo", 0, 4)              # one bucket -> excluded

    pdf = pd.DataFrame(rows, columns=["ts", "event_type"])
    _write_chunks(str(tmp_path / "events.parquet"), [pdf])

    from searchengine_spark.streaming.windows import event_bursts

    got = (event_bursts(spark, str(tmp_path)).toPandas()
           .sort_values("rank").reset_index(drop=True))

    counts = [2, 2, 2, 2, 12]
    s1, s2, c = sum(counts), sum(k * k for k in counts), len(counts)
    mean = s1 / c
    var = (s2 - s1 * s1 / c) / (c - 1)

    def z(k):
        return round((k - mean) / math.sqrt(var), 6)

    assert set(got["event_type"]) == {"a"}
    assert len(got) == 5
    top = got.iloc[0]
    assert (top["rank"], top["window_start"], top["n"], top["z"]) == (
        1, "2024-01-01 04:00:00", 12, z(12)
    )
    assert list(got["z"]) == [z(12)] + [z(2)] * 4
    # ties among the four 2-count hours break by window_start asc
    assert list(got["window_start"][1:]) == [
        f"2024-01-01 0{h}:00:00" for h in range(4)
    ]
