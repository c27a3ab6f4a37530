"""tools/maintain_ivf_job.py: the spark-submit vector-index deploy
surface, driven exactly as a deployment would (spark-submit
--py-files).  A build window then a maintenance window (append +
delete + compact), each printing its JSON metrics; the final served
probe must agree with the Spark-free LocalANN over the same dir."""

import json
import subprocess

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _submit(zpath, *job_args):
    p = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zpath,
            "tools/maintain_ivf_job.py", *job_args,
        ],
        capture_output=True, text=True, cwd="/root/repo",
    )
    lines = [ln for ln in p.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, p.stdout[-2000:] + p.stderr[-3000:]
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def job_runs(spark, tmp_path_factory):
    from tools.make_pyfiles import build_zip

    zpath = build_zip()
    root = tmp_path_factory.mktemp("ivf_job")
    idx = str(root / "idx")
    sf_half = str(root / "sf_half")
    odds_dir = str(root / "odds")

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(
        f"{sf_half}/embeddings.parquet"
    )
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(odds_dir)

    r1 = _submit(zpath, "--index", idx, "--build", sf_half,
                 "--probe-vec-id", "0")
    r2 = _submit(zpath, "--index", idx, "--append", odds_dir,
                 "--delete-ids", "11,13,17", "--compact",
                 "--probe-vec-id", "0")
    return idx, r1, r2


def test_build_window(job_runs):
    idx, r1, _ = job_runs
    assert [o["op"] for o in r1["ops"]] == ["build"]
    assert r1["manifest"]["base"] == "cells"
    assert len(r1["probe"]) == 10


def test_maintenance_window_and_local_agreement(job_runs):
    from searchengine_spark.query.serve_ivf import LocalANN

    idx, _, r2 = job_runs
    assert [o["op"] for o in r2["ops"]] == ["append", "delete", "compact"]
    # post-compact: one fresh base, no outstanding generations/tombstones
    assert r2["manifest"]["base"] != "cells"
    assert r2["manifest"]["n_generations"] == 0
    assert r2["manifest"]["n_tombstone_sets"] == 0
    got = [(p["vec_id"], p["cosine"]) for p in r2["probe"]]
    assert not {11, 13, 17} & {v for v, _ in got}

    # the job's served values must equal the Spark-free tier's
    import pyarrow.parquet as pq

    ann = LocalANN(idx)
    qv = None
    for vid, v in zip(
        pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])["vec_id"].to_pylist(),
        pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])["embedding"].to_pylist(),
    ):
        if vid == 0:
            qv = v
            break
    assert got == ann.topk(qv, k=10, exclude_vec_id=0)
