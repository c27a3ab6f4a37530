"""Local (Spark-free) serving front-end: hash parity, rank identity
with the cluster WAND path, and segmented serving-state exactness."""

import math
import random
import string

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import QUERIES
from searchengine_spark.index.shards import load_index
from searchengine_spark.query.serve_local import LocalSearcher
from searchengine_spark.query.wand import wand_topk


def test_xxhash64_matches_spark(spark):
    """The pure-Python XXH64 must equal Spark's JVM implementation —
    bucket pruning would silently miss terms otherwise.  Probes every
    length class of the algorithm (empty, <4, <8, <32, >=32 bytes) plus
    unicode."""
    from searchengine_spark.index.xxhash64 import spark_xxhash64

    rng = random.Random(5)
    words = ["", "a", "ab", "abc", "abcd", "hash", "parser",
             "länger-ünïcode", "日本語トークン", "x" * 31, "y" * 32,
             "z" * 100]
    words += [
        "".join(rng.choices(string.ascii_lowercase + string.digits,
                            k=rng.randint(1, 40)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got = {
        r["term"]: r["h"]
        for r in df.select(
            "term", F.xxhash64("term").alias("h")
        ).collect()
    }
    for w in words:
        assert spark_xxhash64(w) == got[w], repr(w)


@pytest.fixture(scope="module")
def searcher(index_dir):
    return LocalSearcher(index_dir, stem=True)


@pytest.fixture(scope="module")
def split_corpora(spark):
    """Lexical-median split (same recipe as tests/test_segments.py)."""
    from searchengine_spark.corpus import synth_corpus

    rows = sorted(
        synth_corpus(200), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    half = len(rows) // 2
    return (
        spark.createDataFrame(rows),
        spark.createDataFrame(rows[:half]),
        spark.createDataFrame(rows[half:]),
    )


def _spark_rows(spark, shards, queries, mode):
    res = wand_topk(spark, shards, queries, k=10, mode=mode)
    out = {}
    for r in res.collect():
        out.setdefault(r["qid"], []).append(
            (r["rank"], r["docid"], r["score"])
        )
    return out


def test_local_serving_equals_wand(spark, index_dir, searcher):
    """Single-query local answers must be rank- and score-identical to
    the cluster WAND path over the same index files, both modes."""
    shards = load_index(spark, index_dir)
    queries = [(qid, q) for qid, q in QUERIES]
    for mode in ("and", "or"):
        expect = _spark_rows(spark, shards, queries, mode)
        n_nonempty = 0
        for qid, q in queries:
            got = searcher.topk(q, k=10, mode=mode)
            exp = expect.get(qid, [])
            assert len(got) == len(exp), (mode, qid)
            for (gr, gd, gs), (er, ed, es) in zip(got, exp):
                assert (gr, gd) == (er, ed), (mode, qid)
                assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12)
            n_nonempty += bool(got)
        assert n_nonempty > len(queries) // 2


def test_local_serving_unknown_and_empty_queries(searcher):
    assert searcher.topk("zzzqx parser") == []          # AND, missing
    assert searcher.topk("") == []
    assert searcher.topk("zzzqx vvkwq", mode="or") == []  # all missing
    # blended path shares the prune/abort heuristics
    assert searcher.blended_topk("zzzqx vvkwq qqqpt parser") == []
    assert searcher.blended_topk("") == []


def test_local_blended_equals_ondisk_scorer(spark, index_dir, searcher):
    """blended_topk must reproduce the full end-user scoring chain
    (prune → BM25 → cosine → norms → quality blend) rank- and
    score-identically to score_queries_ondisk over the same index."""
    from searchengine_spark.query.scoring import score_queries_ondisk

    shards = load_index(spark, index_dir)
    queries = [(qid, q) for qid, q in QUERIES]
    expect = {}
    res = score_queries_ondisk(spark, queries, shards, k=10)
    for r in res.collect():
        expect.setdefault(r["qid"], []).append(
            (r["rank"], r["docid"], r["score"])
        )
    n_nonempty = 0
    for qid, q in queries:
        got = searcher.blended_topk(q, k=10)
        exp = expect.get(qid, [])
        assert [(r, d) for r, d, _ in got] == [
            (r, d) for r, d, _ in exp
        ], (qid, q)
        for (_, _, gs), (_, _, es) in zip(got, exp):
            assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12)
        n_nonempty += bool(got)
    assert n_nonempty > len(queries) // 2


def test_local_searcher_refresh_on_append(spark, split_corpora,
                                          tmp_path_factory):
    """A serving replica must pick up committed appends: maybe_refresh
    is a no-op until segments.json swaps, then the new generation's
    docs become searchable."""
    from searchengine_spark.index import build_tables
    from searchengine_spark.index.segments import (
        append_segment,
        init_segmented,
    )

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("refresh") / "idx")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    ls = LocalSearcher(seg_dir, stem=True)
    n0 = ls.n_survivors
    assert ls.maybe_refresh() is False  # nothing committed

    marker = spark.createDataFrame(
        [("zz-live", "p", "c", "python",
          "qqlivemarker qqlivemarker fresh tokens arriving now")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_segment(
        spark, seg_dir, b.unionByName(marker), compute_quality=False
    )
    # stale replica: new content invisible until refresh
    assert ls.topk("qqlivemarker", mode="or") == []
    assert ls.maybe_refresh() is True
    assert ls.n_survivors > n0
    hits = ls.topk("qqlivemarker", mode="or")
    assert len(hits) == 1
    assert ls.maybe_refresh() is False  # idempotent


def test_local_serving_over_compacted_segments(spark, split_corpora,
                                               tmp_path_factory):
    """A segmented dir with tombstones + df corrections must serve the
    SAME answers locally as wand_topk over load_segments — the whole
    serving-state contract (stats, idf, block maxima, liveness) redone
    without Spark."""
    from searchengine_spark.index import build_tables
    from searchengine_spark.index.segments import (
        append_segment,
        compact_near_dups,
        init_segmented,
        load_segments,
    )

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("local_seg") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    src = a.orderBy("repo", "path", "commit").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [("zz-twin2", src["path"], src["commit"], src["lang"],
          src["content"] + " zzextra zzmore")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_segment(
        spark, seg_dir, b.unionByName(twin),
        compute_quality=False, simhash_bits=32,
    )
    assert compact_near_dups(spark, seg_dir, bits=32) >= 1

    seg = load_segments(spark, seg_dir)
    local = LocalSearcher(seg_dir, stem=True)
    assert local.n_survivors == seg.stats["n_survivors"]
    assert local.avgdl == seg.stats["avgdl"]

    queries = [(qid, q) for qid, q in QUERIES]
    for mode in ("and", "or"):
        expect = _spark_rows(spark, seg, queries, mode)
        for qid, q in queries:
            got = local.topk(q, k=10, mode=mode)
            exp = expect.get(qid, [])
            assert [(r, d) for r, d, _ in got] == [
                (r, d) for r, d, _ in exp
            ], (mode, qid)
            for (_, _, gs), (_, _, es) in zip(got, exp):
                assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12)

    # physical merge: the replica refreshes onto the single merged
    # generation and keeps answering identically
    from searchengine_spark.index.segments import merge_segments

    pre = {qid: local.topk(q, k=10) for qid, q in queries}
    merge_segments(spark, seg_dir)
    assert local.maybe_refresh() is True
    for qid, q in queries:
        got = local.topk(q, k=10)
        assert [(r, d) for r, d, _ in got] == [
            (r, d) for r, d, _ in pre[qid]
        ], qid


def test_sharded_serving_equals_unsharded(spark, tmp_path_factory):
    """Docid-range sharding must be invisible to callers: a
    ShardedSearcher over a 3-generation dir (with tombstones from
    compaction) answers rank- AND score-identically to one unsharded
    LocalSearcher on both WAND modes and the blended chain — including
    after a physical merge collapses the generations under it."""
    from searchengine_spark.corpus import synth_corpus
    from searchengine_spark.index import build_tables
    from searchengine_spark.index.segments import (
        append_segment,
        compact_near_dups,
        init_segmented,
        merge_segments,
    )
    from searchengine_spark.query.serve_local import ShardedSearcher

    rows = sorted(
        synth_corpus(210), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    thirds = [rows[:70], rows[70:140], rows[140:]]
    seg_dir = str(tmp_path_factory.mktemp("sharded") / "idx")
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(thirds[0]),
                     compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    for part in thirds[1:]:
        append_segment(
            spark, seg_dir, spark.createDataFrame(part),
            compute_quality=False, simhash_bits=32,
        )
    # a near-dup twin of an early doc lands in the LAST generation so
    # compaction tombstones across the shard boundary
    src = rows[0]
    twin = spark.createDataFrame(
        [("zz-shard-twin", src["path"], src["commit"], src["lang"],
          src["content"] + " zzshardextra")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_segment(spark, seg_dir, twin, compute_quality=False,
                   simhash_bits=32)
    assert compact_near_dups(spark, seg_dir, bits=32) >= 1

    whole = LocalSearcher(seg_dir, stem=True)
    for n_shards in (2, 3, 8):  # 8 > n_segments: clamps, stays exact
        router = ShardedSearcher(seg_dir, n_shards=n_shards, stem=True)
        assert router.n_survivors == whole.n_survivors
        assert len(router.shards) <= 4
        # every segment served exactly once
        served = [
            s for sh in router.shards for s in sh._segments_subset
        ]
        assert len(served) == len(set(served)) == 4
        n_nonempty = 0
        for qid, q in QUERIES:
            for mode in ("and", "or"):
                exp = whole.topk(q, k=10, mode=mode)
                got = router.topk(q, k=10, mode=mode)
                assert [(r, d) for r, d, _ in got] == [
                    (r, d) for r, d, _ in exp
                ], (n_shards, mode, qid)
                for (_, _, gs), (_, _, es) in zip(got, exp):
                    assert math.isclose(gs, es, rel_tol=1e-9,
                                        abs_tol=1e-12)
                n_nonempty += bool(got)
            exp_b = whole.blended_topk(q, k=10)
            got_b = router.blended_topk(q, k=10)
            assert [(r, d) for r, d, _ in got_b] == [
                (r, d) for r, d, _ in exp_b
            ], (n_shards, qid)
            for (_, _, gs), (_, _, es) in zip(got_b, exp_b):
                assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12)
        assert n_nonempty > len(QUERIES) // 2

    # physical merge under a live router: refresh re-partitions onto
    # the single merged generation, answers unchanged
    router = ShardedSearcher(seg_dir, n_shards=2, stem=True)
    pre = {qid: router.topk(q, k=10) for qid, q in QUERIES}
    merge_segments(spark, seg_dir)
    assert router.maybe_refresh() is True
    assert len(router.shards) == 1
    for qid, q in QUERIES:
        assert [
            (r, d) for r, d, _ in router.topk(q, k=10)
        ] == [(r, d) for r, d, _ in pre[qid]], qid
    assert router.maybe_refresh() is False


def test_shard_param_validation(index_dir):
    with pytest.raises(ValueError):
        LocalSearcher(index_dir, segments=["g0"])  # not a segmented dir
