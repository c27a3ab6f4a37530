"""Snapshot diff tool (tools/index_diff.py): added / removed /
changed / unchanged classification across a delete + upsert + append
maintenance cycle, Spark-free read side."""

import shutil

import pandas as pd

from searchengine_spark.corpus import synth_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.segments import (
    delete_docs,
    init_segmented,
    load_segments,
    upsert_segment,
)


def test_index_diff_classification(spark, tmp_path):
    from tools.index_diff import diff_indexes

    rows = sorted(
        synth_corpus(120),
        key=lambda r: (r["repo"], r["path"], r["commit"]),
    )
    corpus = spark.createDataFrame(pd.DataFrame(rows))
    d = str(tmp_path / "idx")
    init_segmented(
        spark,
        build_tables(spark, corpus, compute_quality=False,
                     near_dup=False),
        d,
    )
    old = str(tmp_path / "old")
    shutil.copytree(d, old)

    live = load_segments(spark, d).docs
    victims = [
        int(r["docid"])
        for r in live.select("docid").orderBy("docid").limit(2).collect()
    ]
    assert delete_docs(spark, d, victims) == 2

    # upsert: one existing key with CHANGED content + two new keys
    src = live.orderBy("repo", "path", "commit").collect()[-1]
    batch = spark.createDataFrame(pd.DataFrame([
        {"repo": src["repo"], "path": src["path"],
         "commit": src["commit"], "lang": "py",
         "content": "entirely new body for the changed doc"},
        {"repo": "brand-new", "path": "a.py", "commit": "c1",
         "lang": "py", "content": "fresh content one"},
        {"repo": "brand-new", "path": "b.py", "commit": "c1",
         "lang": "py", "content": "fresh content two"},
    ]))
    res = upsert_segment(spark, d, batch, compute_quality=False,
                         near_dup=False)
    assert res["deleted"] == 1 and res["segment"] is not None

    out = diff_indexes(old, d)
    assert out["n_old"] == out["unchanged"] + 2 + 1  # deletes + change
    assert out["added"] == 2          # the two brand-new keys
    assert out["removed"] == 2        # the two explicit deletes
    assert out["changed"] == 1        # the upserted (repo, path)
    assert out["n_new"] == out["n_old"] - 2 + 2
    assert any("brand-new/a.py" in u for u in out["examples"]["added"])

    # identical snapshots diff to zero
    same = diff_indexes(d, d)
    assert (same["added"], same["removed"], same["changed"]) == (0, 0, 0)
    assert same["unchanged"] == same["n_old"] == same["n_new"]
