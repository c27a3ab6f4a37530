"""tools/events_report_job.py: the spark-submit analytics rollup is
pure composition of the oracled events operators — its outputs must
equal re-running them in-process, through the real deploy surface."""

import json
import subprocess

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_result(tmp_path_factory):
    from tools.make_pyfiles import build_zip

    out = str(tmp_path_factory.mktemp("events_report"))
    zpath = build_zip()
    p = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "tools/events_report_job.py",
            "--input", SF, "--out", out,
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = [ln for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, p.stdout[-2000:] + p.stderr[-3000:]
    return json.loads(lines[-1]), out


def test_report_matches_operators(spark, job_result):
    metrics, out = job_result
    from searchengine_spark.ops.events import (
        funnel_conversion,
        retention_cohorts,
    )

    assert metrics["value"] == 10
    assert set(metrics["rows"]) == {
        "funnel_conversion", "retention_cohorts", "event_transitions",
        "user_sessions", "event_bursts", "value_histogram",
        "value_percentiles", "props_stats", "asof_attribution",
        "burst_pairs",
    }
    # spot-check two surfaces value-for-value through the written files
    want_f = {
        (r["step"], r["event_type"], r["n_users"], r["conv"])
        for r in funnel_conversion(spark, SF).collect()
    }
    got_f = {
        (r["step"], r["event_type"], r["n_users"], r["conv"])
        for r in spark.read.parquet(
            f"{out}/funnel_conversion"
        ).collect()
    }
    assert got_f == want_f
    want_r = {
        (r["cohort"], r["k"], r["n_active"], r["retention"])
        for r in retention_cohorts(spark, SF).collect()
    }
    got_r = {
        (r["cohort"], r["k"], r["n_active"], r["retention"])
        for r in spark.read.parquet(
            f"{out}/retention_cohorts"
        ).collect()
    }
    assert got_r == want_r
    for name, n in metrics["rows"].items():
        assert n == spark.read.parquet(f"{out}/{name}").count()
