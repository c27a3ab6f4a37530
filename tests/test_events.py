"""Value-column analytics (ops/events.py): planted-data recomputation
of the exact semantics the driver's SQL compare also checks — the
nearest-rank percentile rule (incl. the pinned double-ceil quirk) and
the histogram's last-bin clamp."""

import math

import pandas as pd
import pytest

from searchengine_spark.ops.events import (
    value_histogram,
    value_percentiles,
)


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "event_type", "value"]
    )
    pdf["ts"] = pd.Timestamp(2024, 1, 1)
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def test_value_percentiles_nearest_rank(spark, tmp_path):
    """p50/p90/p99 = value at rank ceil(p * n) over the (value,
    event_id) total order — the rank recomputed with the SAME IEEE
    double product both engines use (the ::DOUBLE oracle cast pins
    that; a decimal product could pick a different rank whenever
    p * n is integral in decimal but not in binary)."""
    rows = [(i, "a", float(i)) for i in range(1, 21)]      # values 1..20
    rows += [(100 + i, "b", float(i)) for i in range(1, 4)]  # n = 3
    sf = _write_events(spark, tmp_path, rows)

    got = {
        (r["event_type"], r["pct"]): r["value"]
        for r in value_percentiles(spark, sf).collect()
    }

    def nearest(vals, p):
        vals = sorted(vals)
        return vals[math.ceil(p * len(vals)) - 1]   # double product

    a_vals = [float(i) for i in range(1, 21)]
    for pct, p in ((50, 0.5), (90, 0.9), (99, 0.99)):
        assert got[("a", pct)] == nearest(a_vals, p)
        assert got[("b", pct)] == nearest([1.0, 2.0, 3.0], p)
    assert got[("a", 50)] == 10.0 and got[("a", 90)] == 18.0
    assert got[("a", 99)] == 20.0 and got[("b", 50)] == 2.0


def test_value_histogram_edges_and_clamp(spark, tmp_path):
    """Global [min, max] edges shared across types; the max value
    clamps into the last bin; counts and 6dp sums match a recompute."""
    rows = [(1, "a", 0.0), (2, "a", 5.0), (3, "a", 10.0),
            (4, "b", 9.99), (5, "b", 10.0)]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["bin"]): (r["n_events"], r["sum_value"])
        for r in value_histogram(spark, sf).collect()
    }
    # lo=0, hi=10, width=1: value 10.0 -> floor(10)=10 -> clamped to 9
    assert got[("a", 0)] == (1, 0.0)
    assert got[("a", 5)] == (1, 5.0)
    assert got[("a", 9)] == (1, 10.0)
    assert got[("b", 9)] == (2, round(9.99 + 10.0, 6))
    assert len(got) == 4
