"""tools/prepare_training_data_job.py: the spark-submit curation job
is pure composition of the oracled operators — its survivor set must
equal intersecting them by hand, through the real deploy surface
(spark-submit --py-files), not an in-process import.
"""

import json
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_result(tmp_path_factory):
    from tools.make_pyfiles import build_zip

    out = str(tmp_path_factory.mktemp("curated"))
    zpath = build_zip()
    p = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "tools/prepare_training_data_job.py",
            "--input", SF, "--output", out,
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = [ln for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, p.stdout[-2000:] + p.stderr[-3000:]
    return json.loads(lines[-1]), out


def test_job_funnel_matches_operators(spark, job_result):
    metrics, out = job_result
    from searchengine_spark.ops.mix import (
        DECON_EVAL_MOD,
        decontaminate,
        stratified_sample,
    )
    from searchengine_spark.ops.prep import training_data_prep

    prep = {r["doc_id"] for r in training_data_prep(spark, SF).collect()}
    flagged = {r["doc_id"] for r in decontaminate(spark, SF).collect()}
    sampled = {r["doc_id"] for r in stratified_sample(spark, SF).collect()}
    # the eval slice is held out entirely — the benchmark must never
    # appear in the curated training set
    no_eval = {d for d in prep if d % DECON_EVAL_MOD != 0}
    expect = (no_eval - flagged) & sampled

    assert metrics["n_after_prep"] == len(prep)
    assert metrics["n_after_decon"] == len(no_eval - flagged)
    assert metrics["n_final"] == len(expect)

    got = {
        r["doc_id"]
        for r in spark.read.parquet(f"{out}/curated").collect()
    }
    assert got == expect
    assert not any(d % DECON_EVAL_MOD == 0 for d in got)

    mix = {
        r["lang"]: (r["n_docs"], r["n_tokens"])
        for r in spark.read.parquet(f"{out}/mixture").collect()
    }
    assert sum(n for n, _ in mix.values()) == len(expect)


def test_job_strip_spans_flag(spark, job_result, tmp_path_factory):
    """--strip-spans must rewrite the curated text exactly as
    strip_dup_spans over the final survivor corpus (composition through
    the real spark-submit surface), and report the removed-token sum."""
    from tools.make_pyfiles import build_zip

    _, base_out = job_result
    out = str(tmp_path_factory.mktemp("curated_spans"))
    p = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", build_zip(),
            "tools/prepare_training_data_job.py",
            "--input", SF, "--output", out, "--strip-spans",
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = [ln for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, p.stdout[-2000:] + p.stderr[-3000:]
    metrics = json.loads(lines[-1])

    from searchengine_spark.ops.dedup import strip_dup_spans

    base = spark.read.parquet(f"{base_out}/curated")
    want = {
        r["doc_id"]: r["clean_text"]
        for r in strip_dup_spans(
            base.select("doc_id", "text")
        ).collect()
    }
    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/curated").collect()
    }
    assert got == want
    n_removed = sum(
        r["n_removed"]
        for r in strip_dup_spans(base.select("doc_id", "text")).collect()
    )
    assert metrics["span_tokens_removed"] == n_removed
    assert "span_sec" in metrics
