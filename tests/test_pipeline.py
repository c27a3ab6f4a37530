"""Spark build-pipeline correctness vs the oracle (SURVEY.md §5)."""

import hashlib

from pyspark.sql import functions as F

from searchengine_spark.index import assign_docids, build_tables


def test_docid_matches_canonical_order(corpus_df, corpus_rows):
    ids = assign_docids(corpus_df)
    got = {
        (r["repo"], r["path"], r["commit"]): r["docid"]
        for r in ids.select("docid", "repo", "path", "commit").collect()
    }
    expect = {
        (r["repo"], r["path"], r["commit"]): i
        for i, r in enumerate(
            sorted(corpus_rows, key=lambda r: (r["repo"], r["path"], r["commit"])), 1
        )
    }
    assert got == expect


def test_docid_partition_count_invariance(spark, corpus_df):
    """SURVEY.md §1.2: ids must be identical across parallelism levels —
    the stand-in for N vs 4N executors."""
    a = {
        r["docid"]: (r["repo"], r["path"])
        for r in assign_docids(corpus_df, n_parts=3).collect()
    }
    b = {
        r["docid"]: (r["repo"], r["path"])
        for r in assign_docids(corpus_df, n_parts=17).collect()
    }
    assert a == b


def test_docid_null_key_columns_survive(spark):
    """The (key, docid) map joins back NULL-SAFELY: a corpus row with a
    NULL key column must keep its row (and its dense id) in both id
    orders — a plain equi-join would silently drop the document."""
    rows = [
        ("r1", "a.py", "c1", "alpha"),
        ("r1", "b.py", None, "bravo"),
        (None, "c.py", "c3", "charlie"),
        ("r2", None, None, "delta"),
    ]
    corpus = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    for order in ("lexical", "hash"):
        out = assign_docids(corpus, n_parts=3, order=order)
        got = sorted(
            (r["content"], r["docid"]) for r in out.collect()
        )
        assert [c for c, _ in got] == ["alpha", "bravo", "charlie",
                                       "delta"]
        assert sorted(d for _, d in got) == [1, 2, 3, 4]


def test_stats_match_oracle(tables, oracle):
    assert tables.stats["n_total"] == oracle.n_total
    assert tables.stats["n_survivors"] == oracle.n_survivors
    assert abs(tables.stats["avgdl"] - oracle.avgdl) < 1e-9


def test_survivor_set_matches_oracle(tables, oracle):
    got = {r["docid"] for r in tables.survivors.select("docid").collect()}
    assert got == set(oracle.docs.keys())


def test_postings_match_oracle(tables, oracle):
    got = {
        (r["term"], r["docid"]): (r["tf"], list(r["positions"]))
        for r in tables.postings.collect()
    }
    expect = {
        (term, docid): (tf, positions)
        for term, plist in oracle.postings.items()
        for docid, (tf, positions) in plist.items()
    }
    assert got == expect


def test_doc_lengths_match_oracle(tables, oracle):
    got = {
        r["docid"]: r["total_tokens"]
        for r in tables.docs.select("docid", "total_tokens").collect()
    }
    expect = {d: info["total_tokens"] for d, info in oracle.docs.items()}
    assert got == expect


def test_termdict_df(tables, oracle):
    got = {r["term"]: r["df"] for r in tables.termdict.collect()}
    expect = {t: len(p) for t, p in oracle.postings.items()}
    assert got == expect


def test_edges_match_oracle(tables, oracle):
    got = {(r["src"], r["dst"]) for r in tables.edges.collect()}
    assert got == oracle.edges


def test_quality_scores_match_oracle(tables, oracle):
    rows = tables.docs.select(
        "docid", "pr_quality", "hub_quality", "auth_quality"
    ).collect()
    for r in rows:
        d = r["docid"]
        assert abs(r["pr_quality"] - oracle.pr[d]) < 1e-9, ("pr", d)
        assert abs(r["hub_quality"] - oracle.hub[d]) < 1e-9, ("hub", d)
        assert abs(r["auth_quality"] - oracle.auth[d]) < 1e-9, ("auth", d)


def test_sha256_invariant_spark(spark, corpus_df, corpus_rows):
    """input_hint: F.sha2(content, 256) == hashlib.sha256 per row."""
    got = {
        (r["repo"], r["path"]): r["h"]
        for r in corpus_df.select(
            "repo", "path", F.sha2("content", 256).alias("h")
        ).collect()
    }
    for row in corpus_rows[:100]:
        expect = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        assert got[(row["repo"], row["path"])] == expect


def test_docid_hash_order_dense_and_invariant(spark, corpus_df, corpus_rows):
    """Web-scale id mode: dense 1..N, partition-count invariant, ordered
    by xxhash64 (samplerless static bucketing — assign_docids)."""
    a = {
        r["docid"]: (r["repo"], r["path"], r["commit"])
        for r in assign_docids(corpus_df, n_parts=3, order="hash").collect()
    }
    b = {
        r["docid"]: (r["repo"], r["path"], r["commit"])
        for r in assign_docids(corpus_df, n_parts=17, order="hash").collect()
    }
    assert a == b
    assert sorted(a) == list(range(1, len(corpus_rows) + 1))
    assert set(a.values()) == {
        (r["repo"], r["path"], r["commit"]) for r in corpus_rows
    }
