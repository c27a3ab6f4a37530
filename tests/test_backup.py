"""Index snapshot/restore (index/backup.py): round-trip rank identity
through the Spark-free serving tier, manifest-last completeness, and
corruption detection."""

import json
import os
import shutil

import pytest

from searchengine_spark.corpus import synth_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.backup import (
    BACKUP_MANIFEST,
    backup_index,
    restore_index,
    verify_backup,
)
from searchengine_spark.index.segments import append_segment, init_segmented
from searchengine_spark.query.serve_local import LocalSearcher


@pytest.fixture(scope="module")
def seg_dir(spark, tmp_path_factory):
    rows = sorted(
        synth_corpus(100),
        key=lambda r: (r["repo"], r["path"], r["commit"]),
    )
    half = len(rows) // 2
    d = str(tmp_path_factory.mktemp("bk") / "idx")
    kwargs = dict(compute_quality=False, near_dup=False)
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(rows[:half]), **kwargs),
        d,
    )
    append_segment(
        spark, d, spark.createDataFrame(rows[half:]), **kwargs
    )
    return d


def test_backup_restore_round_trip(seg_dir, tmp_path):
    before = LocalSearcher(seg_dir, stem=True)
    want = before.topk("parser notes", k=5)
    want_stats = before.stats()
    assert want, "fixture must return hits"

    bdir = str(tmp_path / "snap")
    info = backup_index(seg_dir, bdir)
    assert info["n_files"] > 0 and not info["retried"]
    assert verify_backup(bdir)["ok"]

    # destroy the original, restore, serve — rank-identical
    dest = str(tmp_path / "restored")
    restore_index(bdir, dest)
    after = LocalSearcher(dest, stem=True)
    assert after.topk("parser notes", k=5) == want
    assert after.stats() == want_stats

    # overwrite protection + explicit overwrite
    with pytest.raises(ValueError):
        restore_index(bdir, dest)
    restore_index(bdir, dest, overwrite=True)
    assert LocalSearcher(dest, stem=True).topk("parser notes", k=5) == want


def test_backup_detects_corruption(seg_dir, tmp_path):
    bdir = str(tmp_path / "snap2")
    backup_index(seg_dir, bdir)
    # truncate one data file
    with open(os.path.join(bdir, BACKUP_MANIFEST)) as f:
        manifest = json.load(f)
    victim = next(
        e["path"] for e in manifest["files"]
        if e["path"].endswith(".parquet") or "docs" in e["path"]
    )
    vp = os.path.join(bdir, victim)
    with open(vp, "r+b") as f:
        f.truncate(max(0, os.path.getsize(vp) - 1))
    v = verify_backup(bdir)
    assert not v["ok"] and victim in v["bad"]
    with pytest.raises(ValueError):
        restore_index(bdir, str(tmp_path / "nope"))


def test_torn_backup_is_not_servable(seg_dir, tmp_path):
    """A backup missing its completeness marker must fail verification
    outright — the manifest is written strictly last."""
    bdir = str(tmp_path / "snap3")
    backup_index(seg_dir, bdir)
    os.remove(os.path.join(bdir, BACKUP_MANIFEST))
    v = verify_backup(bdir)
    assert not v["ok"] and BACKUP_MANIFEST in v["bad"]


def test_backup_refuses_uncommitted_dir(tmp_path):
    d = str(tmp_path / "empty")
    os.makedirs(d)
    with open(os.path.join(d, "stray.bin"), "wb") as f:
        f.write(b"x")
    with pytest.raises(ValueError):
        backup_index(d, str(tmp_path / "snap4"))
    shutil.rmtree(d)


def test_backup_restore_ivf_index(spark, tmp_path):
    """Layout-agnostic claim, exercised on the vector store: a
    maintained IVF dir (ivf_segments.json commit point) round-trips
    through backup/restore and serves identically via LocalANN."""
    from pyspark.sql import functions as F

    from searchengine_spark.ops.vectors import append_ivf, build_ivf_index
    from searchengine_spark.query.serve_ivf import LocalANN

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)

    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    want = LocalANN(d).topk(qv, k=10, exclude_vec_id=0)
    assert want

    bdir = str(tmp_path / "snap")
    backup_index(d, bdir)
    assert verify_backup(bdir)["ok"]
    dest = str(tmp_path / "restored")
    restore_index(bdir, dest)
    assert LocalANN(dest).topk(qv, k=10, exclude_vec_id=0) == want
