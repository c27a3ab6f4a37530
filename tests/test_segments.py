"""Incremental segmented index: append == monolithic rebuild on the
same corpus (modulo float avgdl composition), cross-segment exact
dedup, and dense-id continuity (SURVEY.md §2.8 extension)."""

import math

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import QUERIES, synth_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.segments import (
    append_segment,
    init_segmented,
    load_segments,
)
from searchengine_spark.index.shards import load_index, write_index
from searchengine_spark.query.scoring import score_queries_ondisk


@pytest.fixture(scope="module")
def split_corpora(spark):
    """synth corpus split at the lexical (repo,path,commit) median, so
    segment-by-segment docid assignment reproduces the monolithic one."""
    rows = sorted(
        synth_corpus(200), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    half = len(rows) // 2
    full = spark.createDataFrame(rows)
    a = spark.createDataFrame(rows[:half])
    b = spark.createDataFrame(rows[half:])
    return full, a, b


def test_segmented_equals_monolithic(spark, split_corpora, tmp_path_factory):
    """near_dup=False here: simhash deliberately does not span segments
    (documented in index/segments.py), so exact equivalence holds for
    the sha256-dedup pipeline; the planted cross-half near-dups are
    exactly what the monolithic build would additionally drop."""
    full, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg")

    mono_dir = str(base / "mono")
    write_index(
        spark,
        build_tables(spark, full, compute_quality=False, near_dup=False),
        mono_dir,
    )
    mono = load_index(spark, mono_dir)

    seg_dir = str(base / "segmented")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        seg_dir,
    )
    append_segment(
        spark, seg_dir, b, compute_quality=False, near_dup=False
    )
    seg = load_segments(spark, seg_dir)

    assert seg.stats["n_total"] == mono.stats["n_total"]
    assert seg.stats["n_survivors"] == mono.stats["n_survivors"]
    assert math.isclose(
        seg.stats["avgdl"], mono.stats["avgdl"], rel_tol=1e-12
    )

    # same docid universe (lexical split ⇒ identical id assignment)
    ma = sorted(r["docid"] for r in mono.docs.select("docid").collect())
    sa = sorted(r["docid"] for r in seg.docs.select("docid").collect())
    assert ma == sa

    # identical term statistics after the lazy cross-segment re-agg
    mt = {r["term"]: (r["df"], r["cf"])
          for r in mono.termdict.collect()}
    st = {r["term"]: (r["df"], r["cf"])
          for r in seg.termdict.collect()}
    assert mt == st

    # identical blended top-k on the full query set (scores to 1e-9 —
    # avgdl composes by weighted mean, float-identical only to rounding)
    queries = [(qid, q) for qid, q in QUERIES]
    rm = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in score_queries_ondisk(spark, queries, mono, k=10).collect()}
    rs = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in score_queries_ondisk(spark, queries, seg, k=10).collect()}
    assert set(rm) == set(rs) and len(rm) > 0
    for key, (dm, sm) in rm.items():
        ds, ss = rs[key]
        assert dm == ds, key
        assert math.isclose(sm, ss, rel_tol=1e-9, abs_tol=1e-12), key


def test_append_drops_cross_segment_exact_dups(
    spark, split_corpora, tmp_path_factory
):
    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("seg") / "dup")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    n_a = load_segments(spark, seg_dir).stats["n_survivors"]

    # second batch = fresh docs PLUS exact re-sends of first-batch
    # content under new keys: the re-sends must consume ids but index
    # nothing
    resend = a.limit(5).select(
        F.concat(F.lit("re/"), F.col("repo")).alias("repo"),
        "path", "commit", "lang", "content",
    )
    appended = append_segment(
        spark, seg_dir, b.unionByName(resend), compute_quality=False
    )
    assert appended == "seg=1"
    seg = load_segments(spark, seg_dir)
    n_b_input = b.count() + 5
    assert seg.stats["n_total"] == a.count() + n_b_input
    # survivors exclude the 5 exact re-sends (plus any dups inside b
    # itself: the synth halves are dup-free except planted pairs)
    assert seg.stats["n_survivors"] <= n_a + b.count()
    shas = [r["sha256"] for r in seg.docs.select("sha256").collect()]
    assert len(shas) == len(set(shas))  # no duplicate content indexed

    # docid spaces are disjoint and dense-continuing
    seg0_max = (
        load_index(spark, f"{seg_dir}/seg=0").docs.agg(
            F.max("docid")
        ).first()[0]
    )
    seg1_min = (
        load_index(spark, f"{seg_dir}/seg=1").docs.agg(
            F.min("docid")
        ).first()[0]
    )
    assert seg1_min > seg0_max


def test_segment_union_preserves_pruning(spark, split_corpora,
                                         tmp_path_factory):
    """The physical plan over the segment union must keep per-segment
    bucket partition pruning AND term predicate pushdown — the scan
    properties the single-index reader has (else queries over a
    many-generation index would read every bucket of every segment)."""
    from searchengine_spark.index.shards import fetch_postings

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("seg") / "plan")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    append_segment(spark, seg_dir, b, compute_quality=False)
    sh = load_segments(spark, seg_dir)
    plan = fetch_postings(sh, ["parser", "hash"])._jdf.queryExecution(
    ).explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # one pruned scan per segment
    assert plan.count("PartitionFilters: [bucket") == 2, plan
    assert plan.count("PushedFilters: [In(term") == 2, plan


def test_compact_near_dups_across_segments(spark, split_corpora,
                                           tmp_path_factory):
    """A near-dup twin arriving in a LATER generation survives append
    (cross-segment simhash is not an append-time filter) and is then
    tombstoned by compaction, with stats adjusted exactly."""
    from searchengine_spark.index.segments import compact_near_dups

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("seg") / "compact")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )

    # twin = an a-doc's content + 2 tokens (the synth corpus's own
    # near-dup recipe), under a key that lands in the later segment
    src = a.orderBy("repo", "path", "commit").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [("zz-twin", src["path"], src["commit"], src["lang"],
          src["content"] + " zzextra zzmore")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_segment(
        spark, seg_dir, b.unionByName(twin),
        compute_quality=False, simhash_bits=32,
    )

    before = load_segments(spark, seg_dir)
    n_before = before.stats["n_survivors"]
    twin_row = before.docs.filter(F.col("repo") == "zz-twin").collect()
    assert len(twin_row) == 1  # survived the per-segment dedup

    n_dropped = compact_near_dups(spark, seg_dir, bits=32)
    assert n_dropped >= 1

    after = load_segments(spark, seg_dir)
    assert after.stats["n_survivors"] == n_before - n_dropped
    assert after.docs.filter(F.col("repo") == "zz-twin").count() == 0
    # stats adjustment is exact: avgdl == direct mean over served docs
    direct = after.docs.agg(F.avg("total_tokens")).first()[0]
    assert math.isclose(after.stats["avgdl"], direct, rel_tol=1e-9)
    # idempotent
    assert compact_near_dups(spark, seg_dir, bits=32) == 0
    # queries over the compacted index never return a tombstoned doc
    res = score_queries_ondisk(
        spark, [(qid, q) for qid, q in QUERIES], after, k=10
    )
    served = {r["docid"] for r in res.collect()}
    assert int(twin_row[0]["docid"]) not in served


@pytest.fixture(scope="module")
def compacted(spark, split_corpora, tmp_path_factory):
    """A 2-generation index with a cross-segment near-dup compacted
    away, PLUS the monolithic rebuild of the exact survivor set — the
    pair every serving-state-exactness test compares."""
    from searchengine_spark.index.segments import (
        compact_near_dups,
        load_segments,
    )

    _, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg_exact")
    seg_dir = str(base / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    src = a.orderBy("repo", "path", "commit").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [("zz-twin", src["path"], src["commit"], src["lang"],
          src["content"] + " zzextra zzmore")],
        "repo string, path string, commit string, lang string, content string",
    )
    full = a.unionByName(b).unionByName(twin)
    append_segment(
        spark, seg_dir, b.unionByName(twin),
        compute_quality=False, simhash_bits=32,
    )
    n_dropped = compact_near_dups(spark, seg_dir, bits=32)
    assert n_dropped >= 1
    seg = load_segments(spark, seg_dir)

    # monolithic rebuild of the EXACT survivor set (near_dup off: the
    # content set is already the compacted survivor set)
    keys = seg.docs.select("repo", "path", "commit")
    survivors_corpus = full.join(keys, ["repo", "path", "commit"])
    mono_dir = str(base / "mono")
    write_index(
        spark,
        build_tables(
            spark, survivors_corpus, compute_quality=False, near_dup=False
        ),
        mono_dir,
    )
    mono = load_index(spark, mono_dir)
    return seg_dir, seg, mono, twin


def _by_url(res, docs):
    """(qid, rank) → (url, score): docid spaces differ between a
    compacted index (holes) and a rebuild (dense), urls don't."""
    rows = res.join(docs.select("docid", "url"), "docid").collect()
    return {(r["qid"], r["rank"]): (r["url"], r["score"]) for r in rows}


def _assert_rank_identity(ra, rb):
    assert set(ra) == set(rb) and len(ra) > 0
    for key, (ua, sa) in ra.items():
        ub, sb = rb[key]
        assert ua == ub, key
        assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12), key


def test_compacted_termdict_equals_rebuild(spark, compacted):
    """df_corrections make the union termdict's df/cf EXACTLY the
    monolithic rebuild's over the survivor set (stale idf was the one
    way the engine returned wrong scores — VERDICT r2 #1)."""
    _, seg, mono, _ = compacted
    st = {r["term"]: (r["df"], r["cf"]) for r in seg.termdict.collect()}
    mt = {r["term"]: (r["df"], r["cf"]) for r in mono.termdict.collect()}
    assert st == mt
    # and the integer-composed avgdl is bit-identical, not merely close
    assert seg.stats["avgdl"] == mono.stats["avgdl"]
    assert seg.stats["n_survivors"] == mono.stats["n_survivors"]


def test_compacted_scores_match_rebuild(spark, compacted):
    """Blended scorer rank identity: compacted 2-generation index vs
    monolithic rebuild of the survivor set, matched by url."""
    _, seg, mono, _ = compacted
    qs = [(qid, q) for qid, q in QUERIES]
    ra = _by_url(score_queries_ondisk(spark, qs, seg, k=10), seg.docs)
    rb = _by_url(score_queries_ondisk(spark, qs, mono, k=10), mono.docs)
    _assert_rank_identity(ra, rb)


def test_wand_lossless_over_compacted_segments(spark, compacted):
    """WAND (both modes) over a compacted multi-segment index must stay
    lossless vs the exhaustive scorer: exercises the docs-liveness mask
    in the kernels AND the avgdl-drift block-max correction (each
    segment's maxima were written under its own build avgdl)."""
    from searchengine_spark.query.wand import exhaustive_topk, wand_topk

    _, seg, mono, twin = compacted
    qs = [(qid, q) for qid, q in QUERIES]
    for mode in ("and", "or"):
        a = wand_topk(spark, seg, qs, k=10, docs_per_range=64, mode=mode)
        b = exhaustive_topk(spark, seg, qs, k=10, mode=mode)
        ga = {(r["qid"], r["rank"]): (r["docid"], r["score"])
              for r in a.collect()}
        gb = {(r["qid"], r["rank"]): (r["docid"], r["score"])
              for r in b.collect()}
        assert set(ga) == set(gb) and len(ga) > 0, mode
        for key, (da, sa) in ga.items():
            db, sb = gb[key]
            assert da == db, (mode, key)
            assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12)
        # cross-check against the rebuild by url (same ranking universe)
        ra = _by_url(a, seg.docs)
        rb = _by_url(
            wand_topk(spark, mono, qs, k=10, docs_per_range=64, mode=mode),
            mono.docs,
        )
        _assert_rank_identity(ra, rb)


def test_append_rejects_tombstoned_content(spark, compacted,
                                           split_corpora):
    """Content identical to a TOMBSTONED doc must not re-enter on
    append (the dedup universe is the stored segment docs, not the
    tombstone-filtered serving view)."""
    from searchengine_spark.index.segments import load_segments

    seg_dir, seg, _, twin = compacted
    before = load_segments(spark, seg_dir)
    n_before = before.stats["n_survivors"]
    resend = twin.select(
        F.lit("zz-resend").alias("repo"), "path", "commit", "lang",
        "content",
    )
    fresh = twin.select(
        F.lit("zz-fresh").alias("repo"), "path", "commit", "lang",
        F.lit("entirely new content tokens qqfresh").alias("content"),
    )
    append_segment(
        spark, seg_dir, resend.unionByName(fresh),
        compute_quality=False, simhash_bits=32,
    )
    after = load_segments(spark, seg_dir)
    # resend's id consumed but nothing indexed; fresh doc survives
    assert after.stats["n_total"] == before.stats["n_total"] + 2
    assert after.stats["n_survivors"] == n_before + 1
    assert after.docs.filter(F.col("repo") == "zz-resend").count() == 0
    assert after.docs.filter(F.col("repo") == "zz-fresh").count() == 1


def test_merge_segments_physical(spark, compacted, tmp_path_factory):
    """merge_segments rewrites the generations into one segment:
    deterministic output, exact termdict, rank identity with the
    pre-merge serving view, tombstone state reset."""
    import shutil

    from searchengine_spark.index.segments import (
        _read_meta,
        load_segments,
        merge_segments,
    )
    from searchengine_spark.query.wand import wand_topk

    seg_dir, _, _, _ = compacted
    base = tmp_path_factory.mktemp("merge")
    d1, d2 = str(base / "m1"), str(base / "m2")
    shutil.copytree(seg_dir, d1)
    shutil.copytree(seg_dir, d2)

    pre = load_segments(spark, d1)
    qs = [(qid, q) for qid, q in QUERIES]
    pre_blend = _by_url(score_queries_ondisk(spark, qs, pre, k=10),
                        pre.docs)
    pre_wand = _by_url(
        wand_topk(spark, pre, qs, k=10, docs_per_range=64), pre.docs
    )
    pre_docids = sorted(r["docid"] for r in pre.docs.collect())
    pre_td = {r["term"]: (r["df"], r["cf"]) for r in pre.termdict.collect()}

    name = merge_segments(spark, d1)
    meta = _read_meta(d1)
    assert meta["segments"] == [name]
    assert meta["n_tombstones"] == 0
    assert not (base / "m1" / "tombstones").exists()

    post = load_segments(spark, d1)
    # docids preserved (holes kept — ids are never reused)
    assert sorted(r["docid"] for r in post.docs.collect()) == pre_docids
    assert post.stats["n_total"] == pre.stats["n_total"]
    assert post.stats["avgdl"] == pre.stats["avgdl"]
    # termdict recomputed from surviving postings == corrected union
    post_td = {r["term"]: (r["df"], r["cf"])
               for r in post.termdict.collect()}
    assert post_td == pre_td
    # rank identity through both query paths
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, post, k=10), post.docs),
        pre_blend,
    )
    _assert_rank_identity(
        _by_url(wand_topk(spark, post, qs, k=10, docs_per_range=64),
                post.docs),
        pre_wand,
    )

    # byte-determinism: merging an identical copy yields identical blocks
    merge_segments(spark, d2)
    key = lambda r: (r["term"], r["docid_first"])  # noqa: E731
    b1 = sorted(
        load_segments(spark, d1).blocks.select(
            "term", "docid_first", "docid_last", "n", "cf", "payload"
        ).collect(), key=key)
    b2 = sorted(
        load_segments(spark, d2).blocks.select(
            "term", "docid_first", "docid_last", "n", "cf", "payload"
        ).collect(), key=key)
    assert [tuple(r) for r in b1] == [tuple(r) for r in b2]


def test_compaction_crash_does_not_double_apply(spark, split_corpora,
                                                tmp_path_factory,
                                                monkeypatch):
    """A compaction that crashes AFTER writing tombstones/corrections
    but BEFORE the meta commit must leave serving state untouched, and
    a rerun must apply the corrections exactly once (the commit lists
    the generation dir last; the rerun overwrites the orphan)."""
    from searchengine_spark.index import segments as segmod

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("crash") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    src = a.orderBy("repo", "path", "commit").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [("zz-ctwin", src["path"], src["commit"], src["lang"],
          src["content"] + " zzextra zzmore")],
        "repo string, path string, commit string, lang string, content string",
    )
    append_segment(
        spark, seg_dir, b.unionByName(twin),
        compute_quality=False, simhash_bits=32,
    )
    before = load_segments(spark, seg_dir)
    td_before = {r["term"]: (r["df"], r["cf"])
                 for r in before.termdict.collect()}

    real_save = segmod._save_meta

    def crash_save(index_dir, meta):
        raise RuntimeError("injected crash before compaction commit")

    monkeypatch.setattr(segmod, "_save_meta", crash_save)
    with pytest.raises(RuntimeError, match="injected crash"):
        segmod.compact_near_dups(spark, seg_dir, bits=32)
    monkeypatch.setattr(segmod, "_save_meta", real_save)

    # orphan written but uncommitted → serving state unchanged
    mid = load_segments(spark, seg_dir)
    assert mid.stats["n_survivors"] == before.stats["n_survivors"]
    td_mid = {r["term"]: (r["df"], r["cf"])
              for r in mid.termdict.collect()}
    assert td_mid == td_before

    # rerun commits exactly once; a second run is a no-op
    n1 = segmod.compact_near_dups(spark, seg_dir, bits=32)
    assert n1 >= 1
    assert segmod.compact_near_dups(spark, seg_dir, bits=32) == 0
    meta = segmod._read_meta(seg_dir)
    assert meta["tomb_gens"] == ["g0"]
    after = load_segments(spark, seg_dir)
    # corrections applied once: df strictly below the uncompacted value
    # and consistent (no term double-subtracted to extinction that the
    # rebuild would keep) — cross-checked by the rank-identity tests
    assert after.stats["n_survivors"] == before.stats["n_survivors"] - n1


def test_crashed_merge_never_collides_with_append(spark, split_corpora,
                                                 tmp_path_factory):
    """The generation counter is persisted at reservation time, so a
    merge that died mid-write leaves an orphan dir a later append can
    never reuse (write_index would otherwise resume from the orphan's
    half-written manifest and mix two operations' data)."""
    import os

    from searchengine_spark.index import segments as segmod

    _, a, b = split_corpora
    seg_dir = str(tmp_path_factory.mktemp("collide") / "idx")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    # emulate a crashed merge: the name was reserved and a partial dir
    # exists, but segments.json still lists only seg=0
    meta = segmod._read_meta(seg_dir)
    orphan = segmod._reserve_name(seg_dir, meta)
    os.makedirs(os.path.join(seg_dir, orphan))
    with open(os.path.join(seg_dir, orphan, "_manifest.json"), "w") as f:
        f.write('{"version": 1, "stages": {}, "complete": false}')

    name = append_segment(spark, seg_dir, b, compute_quality=False)
    assert name != orphan  # fresh name, no manifest mixing
    seg = load_segments(spark, seg_dir)
    assert segmod._read_meta(seg_dir)["segments"] == ["seg=0", name]
    assert seg.stats["n_total"] == a.count() + b.count()

    # a successful merge reclaims the orphan
    segmod.merge_segments(spark, seg_dir)
    live = [d for d in os.listdir(seg_dir) if d.startswith("seg=")]
    assert live == segmod._read_meta(seg_dir)["segments"]


def test_streaming_queries_over_segments(spark, split_corpora,
                                         tmp_path_factory):
    """The streaming query front-end serves a segmented index through
    the same IndexShards handle — streamed answers must equal the batch
    scorer's over the union."""
    import json as _json

    from searchengine_spark.streaming.queries import serve_query_stream

    _, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg_q")
    seg_dir = str(base / "idx")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    append_segment(spark, seg_dir, b, compute_quality=False)
    seg = load_segments(spark, seg_dir)

    qdir = base / "queries"
    qdir.mkdir()
    qs = [(qid, q) for qid, q in QUERIES[:5]]
    with open(qdir / "batch.json", "w") as f:
        for qid, q in qs:
            f.write(_json.dumps({"qid": qid, "query": q}) + "\n")
    out = str(base / "answers")
    serve_query_stream(
        spark, seg, str(qdir), out, str(base / "ckpt"), k=10
    )
    streamed = {
        (r["qid"], r["rank"], r["docid"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["qid"], r["rank"], r["docid"])
        for r in score_queries_ondisk(spark, qs, seg, k=10).collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_stream_compaction_to_segments(spark, split_corpora, tmp_path_factory):
    """Corpus parquet lands over time; each compaction folds ONLY the
    new files into one new generation (exactly-once via the marker),
    dedup'd against everything earlier."""
    from searchengine_spark.streaming.ingest import (
        compact_stream_to_segment,
    )

    _, a, b = split_corpora
    base = tmp_path_factory.mktemp("stream_seg")
    inbox = base / "inbox"
    inbox.mkdir()
    seg_dir = str(base / "idx")
    marker = str(base / "processed.json")

    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    n0 = load_segments(spark, seg_dir).stats["n_total"]

    b.coalesce(1).write.mode("overwrite").parquet(str(base / "tmp_b"))
    import glob
    import shutil

    (pfile,) = glob.glob(str(base / "tmp_b" / "*.parquet"))
    shutil.copy(pfile, str(inbox / "batch1.parquet"))

    name = compact_stream_to_segment(
        spark, str(inbox), seg_dir, marker, compute_quality=False
    )
    assert name == "seg=1"
    n1 = load_segments(spark, seg_dir).stats["n_total"]
    assert n1 == n0 + b.count()

    # no new files → no new segment (exactly-once)
    assert compact_stream_to_segment(
        spark, str(inbox), seg_dir, marker, compute_quality=False
    ) is None

    # re-sending the SAME file content as a new file: ids consumed,
    # nothing re-indexed (cross-segment sha dedup)
    shutil.copy(pfile, str(inbox / "batch2.parquet"))
    name = compact_stream_to_segment(
        spark, str(inbox), seg_dir, marker, compute_quality=False
    )
    assert name == "seg=2"
    seg = load_segments(spark, seg_dir)
    assert seg.stats["n_total"] == n1 + b.count()
    shas = [r["sha256"] for r in seg.docs.select("sha256").collect()]
    assert len(shas) == len(set(shas))


def test_partial_merge_run_preserves_serving_state(spark,
                                                   tmp_path_factory):
    """merge_run over an adjacent 2-of-3 run must leave the serving
    view EXACTLY unchanged: termdict (with corrections recomputed for
    the surviving out-of-run tombstone), stats, and rankings — while
    physically removing the in-run tombstone and shrinking the list."""
    from searchengine_spark.index.segments import (
        _read_meta,
        compact_near_dups,
        merge_run,
    )
    from searchengine_spark.query.wand import wand_topk

    rows = sorted(
        synth_corpus(180), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    third = len(rows) // 3
    a = spark.createDataFrame(rows[:third])
    b = spark.createDataFrame(rows[third:2 * third])
    c = spark.createDataFrame(rows[2 * third:])

    def twin_of(src_df, tag):
        src = src_df.orderBy("repo", "path", "commit").limit(1).collect()[0]
        return spark.createDataFrame(
            [(f"zz-{tag}", src["path"], src["commit"], src["lang"],
              src["content"] + f" zz{tag} zzmore")],
            "repo string, path string, commit string, lang string,"
            " content string",
        )

    seg_dir = str(tmp_path_factory.mktemp("pmerge") / "idx")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False,
                            simhash_bits=32), seg_dir,
    )
    # twin1 lands in gen1 (inside the merge run), twin2 in gen2 (outside)
    append_segment(spark, seg_dir, b.unionByName(twin_of(a, "t1")),
                   compute_quality=False, simhash_bits=32)
    append_segment(spark, seg_dir, c.unionByName(twin_of(b, "t2")),
                   compute_quality=False, simhash_bits=32)
    n_dropped = compact_near_dups(spark, seg_dir, bits=32)
    assert n_dropped >= 2

    pre = load_segments(spark, seg_dir, cache_meta=False)
    qs = [(qid, q) for qid, q in QUERIES]
    pre_scores = _by_url(
        score_queries_ondisk(spark, qs, pre, k=10), pre.docs
    )
    pre_wand = _by_url(wand_topk(spark, pre, qs, k=10), pre.docs)
    pre_td = {r["term"]: (r["df"], r["cf"])
              for r in pre.termdict.collect()}
    pre_docids = {r["docid"] for r in pre.docs.select("docid").collect()}
    pre_stats = dict(pre.stats)
    meta0 = _read_meta(seg_dir)
    assert meta0["n_tombstones"] >= 2

    merge_run(spark, seg_dir, 0, 2)

    meta1 = _read_meta(seg_dir)
    assert len(meta1["segments"]) == 2
    # the out-of-run tombstone survives into a recomputed generation
    assert 1 <= meta1["n_tombstones"] < meta0["n_tombstones"]
    assert meta1["tomb_gens"] and meta1["tomb_gens"] != meta0["tomb_gens"]

    post = load_segments(spark, seg_dir, cache_meta=False)
    assert {r["docid"] for r in post.docs.select("docid").collect()} \
        == pre_docids
    assert {r["term"]: (r["df"], r["cf"])
            for r in post.termdict.collect()} == pre_td
    assert post.stats["n_survivors"] == pre_stats["n_survivors"]
    assert post.stats["token_sum"] == pre_stats["token_sum"]
    assert post.stats["avgdl"] == pre_stats["avgdl"]
    assert post.stats["n_total"] == pre_stats["n_total"]
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, post, k=10), post.docs),
        pre_scores,
    )
    _assert_rank_identity(
        _by_url(wand_topk(spark, post, qs, k=10), post.docs), pre_wand
    )

    # dense-id continuity: a post-merge append starts after n_total
    name = append_segment(
        spark, seg_dir, twin_of(c, "t3").withColumn(
            "content", F.concat(F.col("content"), F.lit(" fresh xqz"))
        ),
        compute_quality=False, simhash_bits=32,
    )
    import os

    new_docs = spark.read.parquet(
        os.path.join(seg_dir, name, "docs")
    )
    assert new_docs.agg(F.min("docid")).collect()[0][0] \
        == pre_stats["n_total"] + 1


def test_maybe_merge_log_doc_policy(spark, tmp_path_factory):
    """The tiered policy merges the first adjacent same-tier run of
    merge_factor segments, and leaves mixed-tier prefixes alone —
    steady state stays O(mf·log N) segments, never a full rewrite."""
    from searchengine_spark.index.segments import _read_meta, maybe_merge

    rows = sorted(
        synth_corpus(160), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    chunks = [rows[i * 20:(i + 1) * 20] for i in range(8)]
    seg_dir = str(tmp_path_factory.mktemp("tiered") / "idx")
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(chunks[0]),
                     compute_quality=False, near_dup=False),
        seg_dir,
    )
    for ch in chunks[1:4]:
        append_segment(spark, seg_dir, spark.createDataFrame(ch),
                       compute_quality=False, near_dup=False)
    assert maybe_merge(spark, seg_dir, merge_factor=4) is not None
    assert len(_read_meta(seg_dir)["segments"]) == 1

    for ch in chunks[4:7]:
        append_segment(spark, seg_dir, spark.createDataFrame(ch),
                       compute_quality=False, near_dup=False)
    # window [big, s, s, s] spans two tiers -> no merge yet
    assert maybe_merge(spark, seg_dir, merge_factor=4) is None
    append_segment(spark, seg_dir, spark.createDataFrame(chunks[7]),
                   compute_quality=False, near_dup=False)
    # now [big, s, s, s, s]: the small tier is full and merges
    assert maybe_merge(spark, seg_dir, merge_factor=4) is not None
    meta = _read_meta(seg_dir)
    assert len(meta["segments"]) == 2

    # the union still serves: every stored doc is reachable
    shards = load_segments(spark, seg_dir, cache_meta=False)
    assert shards.docs.count() == shards.stats["n_survivors"]
    res = score_queries_ondisk(
        spark, [(1, "parser")], shards, k=10
    )
    assert res.count() >= 0


def test_stream_compaction_with_tiered_merge(spark, tmp_path_factory):
    """Continuous arrival with merge_factor set behaves like an LSM:
    the segment count stays bounded while the served answers equal an
    unmerged twin dir fed the identical waves."""
    import glob
    import shutil

    from searchengine_spark.index.segments import _read_meta
    from searchengine_spark.streaming.ingest import (
        compact_stream_to_segment,
    )

    rows = sorted(
        synth_corpus(150), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    waves = [rows[i * 30:(i + 1) * 30] for i in range(5)]
    base = tmp_path_factory.mktemp("stream_tier")
    dirs = {}
    for mode in ("merged", "plain"):
        inbox = base / f"inbox_{mode}"
        inbox.mkdir()
        seg_dir = str(base / f"idx_{mode}")
        marker = str(base / f"processed_{mode}.json")
        init_segmented(
            spark,
            build_tables(spark, spark.createDataFrame(waves[0]),
                         compute_quality=False, near_dup=False),
            seg_dir,
        )
        for i, wave in enumerate(waves[1:], start=1):
            tmp = base / f"tmp_{mode}_{i}"
            spark.createDataFrame(wave).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(tmp))
            (pfile,) = glob.glob(str(tmp / "*.parquet"))
            shutil.copy(pfile, str(inbox / f"wave{i}.parquet"))
            assert compact_stream_to_segment(
                spark, str(inbox), seg_dir, marker,
                merge_factor=2 if mode == "merged" else None,
                compute_quality=False, near_dup=False,
            ) is not None
        dirs[mode] = seg_dir

    n_merged = len(_read_meta(dirs["merged"])["segments"])
    n_plain = len(_read_meta(dirs["plain"])["segments"])
    assert n_plain == 5
    assert n_merged < n_plain  # the policy actually fired

    sm = load_segments(spark, dirs["merged"], cache_meta=False)
    sp = load_segments(spark, dirs["plain"], cache_meta=False)
    assert sm.stats == sp.stats
    qs = [(qid, q) for qid, q in QUERIES]
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, sm, k=10), sm.docs),
        _by_url(score_queries_ondisk(spark, qs, sp, k=10), sp.docs),
    )


def test_crashed_partial_merge_is_invisible_and_rerunnable(
        spark, tmp_path_factory, monkeypatch):
    """A merge_run that dies before its segments.json swap leaves only
    invisible orphans: readers see the old state unchanged, and the
    rerun completes from committed state (fresh reserved name; the
    uncommitted tombstone generation is overwritten, never applied
    twice)."""
    from searchengine_spark.index import segments as segmod

    rows = sorted(
        synth_corpus(120), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    chunks = [rows[i * 40:(i + 1) * 40] for i in range(3)]
    seg_dir = str(tmp_path_factory.mktemp("pm_crash") / "idx")
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(chunks[0]),
                     compute_quality=False, near_dup=False),
        seg_dir,
    )
    for ch in chunks[1:]:
        append_segment(spark, seg_dir, spark.createDataFrame(ch),
                       compute_quality=False, near_dup=False)

    before_meta = segmod._read_meta(seg_dir)
    qs = [(qid, q) for qid, q in QUERIES]
    pre = load_segments(spark, seg_dir, cache_meta=False)
    pre_scores = _by_url(
        score_queries_ondisk(spark, qs, pre, k=10), pre.docs
    )

    orig = segmod._save_meta

    def boom(index_dir, meta):
        if meta.get("segments") != before_meta["segments"]:
            raise RuntimeError("crash before the commit swap")
        return orig(index_dir, meta)

    monkeypatch.setattr(segmod, "_save_meta", boom)
    with pytest.raises(RuntimeError):
        segmod.merge_run(spark, seg_dir, 0, 2)
    monkeypatch.setattr(segmod, "_save_meta", orig)

    # invisible: readers see the exact pre-crash state
    mid_meta = segmod._read_meta(seg_dir)
    assert mid_meta["segments"] == before_meta["segments"]
    mid = load_segments(spark, seg_dir, cache_meta=False)
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, mid, k=10), mid.docs),
        pre_scores,
    )

    # rerun completes on a FRESH reserved name and serves identically
    name = segmod.merge_run(spark, seg_dir, 0, 2)
    meta = segmod._read_meta(seg_dir)
    assert meta["segments"] == [name, before_meta["segments"][2]]
    post = load_segments(spark, seg_dir, cache_meta=False)
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, post, k=10), post.docs),
        pre_scores,
    )


def test_expunge_deletes_rewrites_only_heavy_segments(
        spark, tmp_path_factory):
    """expunge_deletes touches only segments whose tombstone fraction
    crosses the threshold: the heavy segment's dead postings leave
    physically, the light segment keeps its tombstone (still masked at
    serving), and answers are unchanged throughout."""
    from searchengine_spark.index.segments import (
        _read_meta,
        compact_near_dups,
        expunge_deletes,
    )

    rows = sorted(
        synth_corpus(130), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    a, b = rows[:60], rows[60:120]

    def twin_of(src, tag):
        return {
            "repo": f"zz-{tag}", "path": src["path"],
            "commit": src["commit"], "lang": src["lang"],
            "content": src["content"] + f" zz{tag} zzmore",
        }

    seg_dir = str(tmp_path_factory.mktemp("expunge") / "idx")
    # gen0: 60 docs, clean
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(a),
                     compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    # gen1: 60 docs + a twin of a gen0 doc — the twin (larger docid)
    # tombstones HERE at compaction, fraction 1/61 << threshold (light)
    append_segment(
        spark, seg_dir,
        spark.createDataFrame(b + [twin_of(a[1], "t1")]),
        compute_quality=False, simhash_bits=32,
    )
    # gen2: tiny — two fresh docs + a twin of a gen1 doc; one of its
    # 3 docs tombstones (fraction 1/3 > threshold, survivors remain)
    tiny = spark.createDataFrame(
        [rows[120], rows[121], twin_of(b[0], "t2")]
    )
    append_segment(spark, seg_dir, tiny,
                   compute_quality=False, simhash_bits=32)
    assert compact_near_dups(spark, seg_dir, bits=32) >= 2

    meta0 = _read_meta(seg_dir)
    pre = load_segments(spark, seg_dir, cache_meta=False)
    qs = [(qid, q) for qid, q in QUERIES]
    pre_scores = _by_url(
        score_queries_ondisk(spark, qs, pre, k=10), pre.docs
    )
    pre_stats = dict(pre.stats)

    new = expunge_deletes(spark, seg_dir, max_del_frac=0.2)
    assert len(new) == 1  # only the tiny tombstone-heavy segment
    meta1 = _read_meta(seg_dir)
    assert meta1["segments"][:2] == meta0["segments"][:2]  # untouched
    assert meta1["segments"][2] == new[0]
    # the light segment's tombstone survives; the heavy one's is gone
    assert 1 <= meta1["n_tombstones"] < meta0["n_tombstones"]

    post = load_segments(spark, seg_dir, cache_meta=False)
    assert post.stats == pre_stats
    _assert_rank_identity(
        _by_url(score_queries_ondisk(spark, qs, post, k=10), post.docs),
        pre_scores,
    )
    # below-threshold second pass is a no-op
    assert expunge_deletes(spark, seg_dir, max_del_frac=0.2) == []


def test_delete_docs_matches_rebuild(spark, split_corpora,
                                     tmp_path_factory):
    """Explicit delete-by-id (index/segments.delete_docs): serving
    state after a cross-generation delete must EXACTLY equal a
    monolithic rebuild of the survivor set (stats, termdict, blended
    ranking, lossless WAND), deletes must be idempotent, and a
    physical merge must reclaim the tombstones."""
    from searchengine_spark.index.segments import (
        delete_docs,
        merge_segments,
    )
    from searchengine_spark.query.wand import exhaustive_topk, wand_topk

    full, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg_del")
    seg_dir = str(base / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    append_segment(spark, seg_dir, b, compute_quality=False,
                   simhash_bits=32)
    before = load_segments(spark, seg_dir)
    n_before = before.stats["n_survivors"]
    # one victim from each generation + one unknown id
    docs = before.docs.select("docid").orderBy("docid").collect()
    victims = [int(docs[0]["docid"]), int(docs[-1]["docid"])]
    assert delete_docs(spark, seg_dir, victims + [10_000_000]) == 2
    # idempotent: replaying the same delete commits nothing
    assert delete_docs(spark, seg_dir, victims) == 0

    seg = load_segments(spark, seg_dir)
    assert seg.stats["n_survivors"] == n_before - 2
    assert seg.docs.filter(F.col("docid").isin(victims)).count() == 0
    direct = seg.docs.agg(F.avg("total_tokens")).first()[0]
    assert math.isclose(seg.stats["avgdl"], direct, rel_tol=1e-9)

    # monolithic rebuild of the exact survivor set
    keys = seg.docs.select("repo", "path", "commit")
    mono_dir = str(base / "mono")
    write_index(
        spark,
        build_tables(
            spark,
            full.join(keys, ["repo", "path", "commit"]),
            compute_quality=False,
            near_dup=False,
        ),
        mono_dir,
    )
    mono = load_index(spark, mono_dir)
    st = {r["term"]: (r["df"], r["cf"]) for r in seg.termdict.collect()}
    mt = {r["term"]: (r["df"], r["cf"]) for r in mono.termdict.collect()}
    assert st == mt
    assert seg.stats["avgdl"] == mono.stats["avgdl"]

    qs = [(qid, q) for qid, q in QUERIES]
    ra = _by_url(score_queries_ondisk(spark, qs, seg, k=10), seg.docs)
    rb = _by_url(score_queries_ondisk(spark, qs, mono, k=10), mono.docs)
    _assert_rank_identity(ra, rb)
    # WAND stays lossless with the delete tombstones in the mask
    for mode in ("and", "or"):
        ga = [
            (r["qid"], r["rank"], r["docid"], r["score"])
            for r in wand_topk(spark, seg, qs, k=10, docs_per_range=64,
                               mode=mode).collect()
        ]
        gb = [
            (r["qid"], r["rank"], r["docid"], r["score"])
            for r in exhaustive_topk(spark, seg, qs, k=10,
                                     mode=mode).collect()
        ]
        assert [t[:3] for t in ga] == [t[:3] for t in gb] and ga, mode
        for (*_, sa), (*_, sb) in zip(ga, gb):
            assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12)

    # merge reclaims: tombstone state resets, ranking unchanged
    merge_segments(spark, seg_dir)
    merged = load_segments(spark, seg_dir)
    assert merged.stats["n_survivors"] == n_before - 2
    rm = _by_url(
        score_queries_ondisk(spark, qs, merged, k=10), merged.docs
    )
    _assert_rank_identity(rm, rb)


def test_upsert_segment_replaces_changed_docs(spark, split_corpora,
                                              tmp_path_factory):
    """upsert_segment: changed (repo, path) content replaces the old
    doc; unchanged content keeps its docid; replays no-op; ranking
    equals a monolithic rebuild of the UPDATED corpus."""
    from searchengine_spark.index.segments import upsert_segment

    full, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg_upsert")
    seg_dir = str(base / "idx")
    init_segmented(
        spark,
        build_tables(spark, full, compute_quality=False,
                     simhash_bits=32),
        seg_dir,
    )
    before = load_segments(spark, seg_dir)
    n_before = before.stats["n_survivors"]

    rows = full.orderBy("repo", "path", "commit").limit(3).collect()
    changed = [
        {**r.asDict(), "commit": r["commit"] + "x",
         "content": r["content"] + " zzupserted zztokens"}
        for r in rows[:2]
    ]
    unchanged = [rows[2].asDict()]  # same key, same content
    newdoc = [{
        "repo": "zz-new-repo", "path": "new.py", "commit": "c1",
        "lang": rows[0]["lang"],
        "content": "zzbrand zznew zzcontent spark table",
    }]
    batch = spark.createDataFrame(changed + unchanged + newdoc)
    old_ids = {
        (r["repo"], r["path"]): int(r["docid"])
        for r in before.docs.filter(
            F.col("repo").isin([c["repo"] for c in changed + unchanged])
        ).select("repo", "path", "docid").collect()
    }

    out = upsert_segment(spark, seg_dir, batch, compute_quality=False,
                         simhash_bits=32)
    assert out["deleted"] == 2 and out["segment"] is not None

    seg = load_segments(spark, seg_dir)
    # +1 new doc, +2 replacements, -2 old versions
    assert seg.stats["n_survivors"] == n_before + 1
    served = {
        (r["repo"], r["path"], r["commit"]): int(r["docid"])
        for r in seg.docs.select(
            "repo", "path", "commit", "docid"
        ).collect()
    }
    for c in changed:  # new version in, old version out
        assert (c["repo"], c["path"], c["commit"]) in served
        old_commit = c["commit"][:-1]
        assert (c["repo"], c["path"], old_commit) not in served
    u = unchanged[0]  # unchanged doc kept its original docid
    assert served[(u["repo"], u["path"], u["commit"])] == old_ids[
        (u["repo"], u["path"])
    ]
    assert ("zz-new-repo", "new.py", "c1") in served

    # replay: nothing deleted, no generation appended, serving stable
    segs_now = list(
        __import__("json").load(
            open(f"{seg_dir}/segments.json")
        )["segments"]
    )
    out2 = upsert_segment(spark, seg_dir, batch, compute_quality=False,
                          simhash_bits=32)
    assert out2 == {"deleted": 0, "segment": None}
    assert list(
        __import__("json").load(
            open(f"{seg_dir}/segments.json")
        )["segments"]
    ) == segs_now

    # rank identity vs a monolithic rebuild of the updated corpus
    keys = seg.docs.select("repo", "path", "commit")
    updated = full.unionByName(batch).join(
        keys, ["repo", "path", "commit"]
    ).dropDuplicates(["repo", "path", "commit"])
    mono_dir = str(base / "mono")
    write_index(
        spark,
        build_tables(spark, updated, compute_quality=False,
                     near_dup=False),
        mono_dir,
    )
    mono = load_index(spark, mono_dir)
    qs = [(qid, q) for qid, q in QUERIES]
    ra = _by_url(score_queries_ondisk(spark, qs, seg, k=10), seg.docs)
    rb = _by_url(score_queries_ondisk(spark, qs, mono, k=10), mono.docs)
    _assert_rank_identity(ra, rb)


def test_stream_upsert_mode_replaces_changed_docs(spark, split_corpora,
                                                  tmp_path_factory):
    """compact_stream_to_segment(upsert=True) — the changes-feed mode:
    a re-sent (repo, path) with changed content replaces its old doc;
    an identical re-send adds NO generation; docids of untouched docs
    are stable."""
    from searchengine_spark.streaming.ingest import (
        compact_stream_to_segment,
    )

    _, a, _b = split_corpora
    base = tmp_path_factory.mktemp("stream_upsert")
    inbox = base / "inbox"
    inbox.mkdir()
    seg_dir = str(base / "idx")
    marker = str(base / "processed.json")
    init_segmented(
        spark, build_tables(spark, a, compute_quality=False), seg_dir
    )
    before = load_segments(spark, seg_dir)
    n0 = before.stats["n_survivors"]
    victim = before.docs.orderBy("docid").limit(1).collect()[0]

    wave = spark.createDataFrame(
        [(victim["repo"], victim["path"], victim["commit"] + "x",
          "java", "zzchanged body spark table join query")],
        "repo string, path string, commit string, lang string, "
        "content string",
    )
    wave.coalesce(1).write.mode("overwrite").parquet(str(base / "w1"))
    import glob
    import shutil

    (pfile,) = glob.glob(str(base / "w1" / "*.parquet"))
    shutil.copy(pfile, str(inbox / "wave1.parquet"))

    name = compact_stream_to_segment(
        spark, str(inbox), seg_dir, marker, upsert=True,
        compute_quality=False,
    )
    assert name == "seg=1"
    seg = load_segments(spark, seg_dir)
    assert seg.stats["n_survivors"] == n0  # one out, one in
    assert seg.docs.filter(
        F.col("docid") == victim["docid"]
    ).count() == 0
    assert seg.docs.filter(
        F.col("commit") == victim["commit"] + "x"
    ).count() == 1

    # identical re-send under a new filename: marker advances, no
    # generation, serving unchanged (content-idempotent upsert)
    shutil.copy(pfile, str(inbox / "wave2.parquet"))
    assert compact_stream_to_segment(
        spark, str(inbox), seg_dir, marker, upsert=True,
        compute_quality=False,
    ) is None
    assert load_segments(spark, seg_dir).stats["n_survivors"] == n0


def test_index_stats_surface(spark, compacted):
    """index_stats (the segments/_stats observability surface): the
    TOTAL row must equal the serving state load_segments composes
    (n_live, integer token_sum, avgdl, union termdict size), and the
    per-generation tombstone attribution (contiguous docid intervals)
    must sum to the meta total."""
    import json
    import os

    from searchengine_spark.index.segments import index_stats
    from searchengine_spark.ops.textops import _mmr_round6

    seg_dir, _seg_stale, _mono, _twin = compacted
    # other module tests may have appended to the shared fixture dir:
    # reload the serving view fresh so the comparison is against the
    # CURRENT commit point, independent of test order
    seg = load_segments(spark, seg_dir)
    st = index_stats(spark, seg_dir).collect()
    per = [r for r in st if r["segment"] != "TOTAL"]
    tot = [r for r in st if r["segment"] == "TOTAL"][0]

    with open(os.path.join(seg_dir, "segments.json")) as f:
        meta = json.load(f)
    assert len(per) == len(meta["segments"]) >= 2
    assert sum(r["n_tombstoned"] for r in per) == meta["n_tombstones"]
    for r in per:
        assert r["n_live"] == r["n_stored"] - r["n_tombstoned"]

    # TOTAL == the serving state (load_segments stats + live doc count)
    assert tot["n_live"] == seg.docs.count()
    assert tot["n_live"] == seg.stats["n_survivors"]
    assert tot["token_sum"] == seg.stats["token_sum"]
    assert tot["avgdl"] == _mmr_round6(seg.stats["avgdl"])
    assert tot["n_tombstoned"] == meta["n_tombstones"] >= 1
    # n_terms = STORED vocabulary (union of generation termdicts); the
    # serving termdict can be strictly smaller when a term's whole df
    # was tombstoned away (df_corrections drop it) — assert both facts
    from functools import reduce
    tds = [
        spark.read.parquet(os.path.join(seg_dir, s, "termdict"))
        for s in meta["segments"]
    ]
    stored_terms = (
        reduce(lambda a, b: a.unionByName(b),
               (td.select("term") for td in tds))
        .distinct().count()
    )
    serving_terms = seg.termdict.select("term").distinct().count()
    assert tot["n_terms"] == stored_terms
    assert serving_terms <= stored_terms

    # the Spark-free serving tier reports the same TOTAL state
    from searchengine_spark.query.serve_local import LocalSearcher

    ls = LocalSearcher(seg_dir, stem=True)
    got = ls.stats()
    assert got["n_segments"] == len(per)
    assert got["n_total"] == tot["n_total"]
    assert got["n_stored"] == tot["n_stored"]
    assert got["n_tombstoned"] == tot["n_tombstoned"]
    assert got["n_live"] == tot["n_live"]
    assert got["token_sum"] == tot["token_sum"]
    assert got["avgdl"] == tot["avgdl"]
    assert got["n_terms_stored"] == tot["n_terms"]
    assert got["n_terms"] == serving_terms
    # per-generation stored stats come from mergeinfo verbatim
    for r, s in zip(per, meta["segments"]):
        with open(os.path.join(seg_dir, s, "mergeinfo.json")) as f:
            mi = json.load(f)
        assert r["n_total"] == mi["n_total"]
        assert r["n_stored"] == mi["n_survivors"]
        assert r["token_sum"] == mi["token_sum"]


def test_fsck_index_clean_and_detects_corruption(spark, index_dir,
                                                 tmp_path):
    """fsck_index returns ZERO violations on a freshly-written index,
    then flags exactly the invariant that was broken: a tampered block
    ``cf`` -> block-cf, a tampered termdict ``df`` -> termdict-df."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from searchengine_spark.index.segments import fsck_index

    assert fsck_index(spark, index_dir).count() == 0

    d = str(tmp_path / "tampered")
    shutil.copytree(index_dir, d)

    # tamper ONE block row's cf inside one resume group
    gdir = None
    for g in sorted(os.listdir(os.path.join(d, "postings"))):
        if g.startswith("group="):
            gdir = os.path.join(d, "postings", g)
            break
    rows = spark.read.parquet(gdir)
    first_term = rows.orderBy("term").first()["term"]
    fixed = rows.withColumn(
        "cf",
        F.when(F.col("term") == first_term, F.col("cf") + 7)
        .otherwise(F.col("cf")),
    )
    tmp_out = str(tmp_path / "gfix")
    fixed.write.mode("overwrite").partitionBy("bucket").parquet(tmp_out)
    shutil.rmtree(gdir)
    shutil.copytree(tmp_out, gdir)

    viol = fsck_index(spark, d).collect()
    kinds = {v["check"] for v in viol}
    assert "block-cf" in kinds
    assert all(v["check"] == "block-cf" for v in viol)
    assert any(v["term"] == first_term for v in viol)

    # additionally tamper the termdict df of one term
    td = spark.read.parquet(os.path.join(d, "termdict"))
    some = td.orderBy("term").first()["term"]
    td2 = td.withColumn(
        "df",
        F.when(F.col("term") == some, F.col("df") + 1)
        .otherwise(F.col("df")),
    )
    tdo = str(tmp_path / "tdfix")
    td2.write.mode("overwrite").parquet(tdo)
    shutil.rmtree(os.path.join(d, "termdict"))
    shutil.copytree(tdo, os.path.join(d, "termdict"))

    kinds2 = {v["check"] for v in fsck_index(spark, d).collect()}
    assert kinds2 == {"block-cf", "termdict-df"}


def test_delete_where_predicate(spark, split_corpora, tmp_path_factory):
    """delete_where (the policy/GDPR surface): tombstones exactly the
    LIVE docs matching the metadata predicate — equivalent to
    delete_docs of the resolved ids — a replay matches nothing, and
    the repo's docs are gone from serving while everything else
    survives."""
    from searchengine_spark.index.segments import delete_where

    full, a, b = split_corpora
    base = tmp_path_factory.mktemp("seg_delw")
    seg_dir = str(base / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, simhash_bits=32),
        seg_dir,
    )
    append_segment(spark, seg_dir, b, compute_quality=False,
                   simhash_bits=32)
    before = load_segments(spark, seg_dir)
    repo = before.docs.select("repo").orderBy("repo").first()["repo"]
    n_repo = before.docs.filter(f"repo = '{repo}'").count()
    n_before = before.stats["n_survivors"]
    assert n_repo > 0

    assert delete_where(spark, seg_dir, f"repo = '{repo}'") == n_repo
    # replay: every matching doc is already tombstoned
    assert delete_where(spark, seg_dir, f"repo = '{repo}'") == 0

    after = load_segments(spark, seg_dir)
    assert after.stats["n_survivors"] == n_before - n_repo
    assert after.docs.filter(f"repo = '{repo}'").count() == 0
    assert after.docs.count() == n_before - n_repo


def test_mass_delete_stays_distributed(spark, tmp_path_factory,
                                       monkeypatch):
    """The 100-TB maintenance contract: a predicate delete matching
    the MAJORITY of the corpus, followed by a merge that rewrites the
    out-of-run tombstones, must keep the dropped/resolved docid set a
    DataFrame end-to-end — every DataFrame.collect issued during the
    maintenance calls returns a bounded handful of rows (scalar
    aggregates, per-segment stats, bucket lists), never the dropped
    set itself.  Exactness of the resulting serving state is what the
    rest of this suite pins; this test pins the PLAN SHAPE."""
    from searchengine_spark.index.segments import (
        delete_where,
        merge_run,
    )

    rows = sorted(
        synth_corpus(800),
        key=lambda r: (r["repo"], r["path"], r["commit"]),
    )
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half])
    b = spark.createDataFrame(rows[half:])
    seg_dir = str(tmp_path_factory.mktemp("seg_mass") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        seg_dir,
    )
    append_segment(spark, seg_dir, b, compute_quality=False,
                   near_dup=False)
    before = load_segments(spark, seg_dir)
    n_before = before.stats["n_survivors"]
    # middle repos: majority of the corpus, but the lexical split
    # leaves survivors in BOTH segments (merge_run refuses a
    # zero-survivor rewrite by design)
    pred = ("repo like 'org2/%' or repo like 'org3/%' or "
            "repo like 'org4/%' or repo like 'org5/%'")
    expect = before.docs.filter(pred).count()
    assert expect > 200, "fixture must drop a majority-scale set"

    # patch the CONCRETE class (pyspark.sql.classic) — instances
    # override the pyspark.sql.DataFrame base, so patching the base
    # would intercept nothing
    from pyspark.sql.classic.dataframe import (
        DataFrame as ClassicDataFrame,
    )

    sizes = []
    orig = ClassicDataFrame.collect

    def spy(self):
        out = orig(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(ClassicDataFrame, "collect", spy)
    n = delete_where(spark, seg_dir, pred)
    # merging segment 0's run alone forces the out-of-run (segment 1)
    # tombstones through the rewrite-into-a-fresh-generation path
    merge_run(spark, seg_dir, 0, 1)
    monkeypatch.undo()

    assert n == expect
    assert sizes, "spy saw no driver results at all"
    assert max(sizes) <= 128, (
        f"maintenance materialized {max(sizes)} rows driver-side — "
        "the dropped set must stay distributed"
    )

    after = load_segments(spark, seg_dir)
    assert after.stats["n_survivors"] == n_before - expect
    assert after.docs.filter(pred).count() == 0
    # the delete replays as a no-op through the distributed path too
    monkeypatch.setattr(ClassicDataFrame, "collect", spy)
    assert delete_where(spark, seg_dir, pred) == 0
    monkeypatch.undo()


def test_tombstone_corrections_df_wide_block(spark):
    """The corrections prune's bucket explode is CAPPED
    (CORR_SPAN_CAP): a rare term's single block spanning the whole
    docid space (10^9 ids → ~244k buckets) must NOT explode — wide
    blocks skip pruning and decode unconditionally (a superset `hit`
    is safe: the exact docid semi-join after decode filters
    precisely), and the per-term corrections stay exact for wide,
    narrow, and untouched blocks alike."""
    from searchengine_spark.index.segments import (
        CORR_RANGE,
        CORR_SPAN_CAP,
        _tombstone_corrections_df,
    )
    from searchengine_spark.index.varbyte import encode_block

    wide_ids = [1, 500_000_000, 1_000_000_000]
    assert (wide_ids[-1] - 1) // CORR_RANGE > CORR_SPAN_CAP
    blocks = spark.createDataFrame(
        [
            ("rareterm", wide_ids[0], wide_ids[-1],
             bytes(encode_block(wide_ids, [3, 5, 7], [[], [], []]))),
            ("denseterm", 10, 12,
             bytes(encode_block([10, 11, 12], [2, 4, 6],
                                [[], [], []]))),
            ("untouched", 20, 22,
             bytes(encode_block([20, 21, 22], [1, 1, 1],
                                [[], [], []]))),
        ],
        "term string, docid_first long, docid_last long, payload binary",
    )
    tomb = spark.createDataFrame(
        [(500_000_000,), (11,), (12,)], "docid long"
    )
    got = {
        r["term"]: (r["df_sub"], r["cf_sub"])
        for r in _tombstone_corrections_df(blocks, tomb).collect()
    }
    assert got == {"rareterm": (1, 5), "denseterm": (2, 10)}


def test_segmented_bm25f_matches_monolithic(spark, split_corpora,
                                            tmp_path_factory):
    """Segmented BM25F (VERDICT r4 #6): init_segmented(
    store_importance=True) + append (flavor INHERITED from mergeinfo)
    must serve importance=True WAND and the on-disk blended scorer
    rank-identical to a monolithic BM25F rebuild of the same corpus;
    WAND stays lossless vs exhaustive over the segment union (the
    avgdl-drift factor bounds importance-scaled maxima too); merges
    preserve the flavor byte-contract (fsck block-bytes clean); both
    flavor-mismatch directions fail loudly."""
    import math

    from searchengine_spark.index.segments import fsck_index, merge_run
    from searchengine_spark.query.wand import exhaustive_topk, wand_topk
    from searchengine_spark.text.importance import (
        extract_importance_text,
    )

    full, a, b = split_corpora
    base = tmp_path_factory.mktemp("segimp")

    mono_dir = str(base / "mono")
    write_index(
        spark,
        build_tables(spark, full, compute_quality=False, near_dup=False,
                     importance_fn=extract_importance_text),
        mono_dir, store_importance=True,
    )
    mono = load_index(spark, mono_dir)

    seg_dir = str(base / "seg")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False,
                     importance_fn=extract_importance_text),
        seg_dir, store_importance=True,
    )
    append_segment(
        spark, seg_dir, b, compute_quality=False, near_dup=False,
        importance_fn=extract_importance_text,
    )
    seg = load_segments(spark, seg_dir)
    assert seg.stats["importance_payload"] is True

    queries = [(qid, q) for qid, q in QUERIES]

    def rows(df):
        return [
            (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
            for r in df.orderBy("qid", "rank").collect()
        ]

    wm = rows(wand_topk(spark, mono, queries, k=10, importance=True))
    ws = rows(wand_topk(spark, seg, queries, k=10, docs_per_range=64,
                        importance=True))
    assert wm == ws and ws
    # lossless over the union: WAND == exhaustive BM25F on the
    # segmented handle (importance-scaled maxima + avgdl-drift factor)
    es = rows(exhaustive_topk(spark, seg, queries, k=10,
                              importance=True))
    assert ws == es
    # blended on-disk chain: segmented == monolithic
    sm = rows(score_queries_ondisk(spark, queries, mono, k=10,
                                   stem=False, importance=True))
    ss = rows(score_queries_ondisk(spark, queries, seg, k=10,
                                   stem=False, importance=True))
    assert sm == ss and sm

    # both flavor-mismatch directions refuse on the segmented handle
    with pytest.raises(ValueError):
        wand_topk(spark, seg, queries)              # field-blind over BM25F
    plain_dir = str(base / "plain")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        plain_dir,
    )
    with pytest.raises(ValueError):
        wand_topk(spark, load_segments(spark, plain_dir), queries,
                  importance=True)
    # a plain append into a BM25F index fails loudly (build_tables
    # would silently fall back to the const-0 parity importance)
    extra = spark.createDataFrame([
        {**r, "path": r["path"] + "x", "content": r["content"] + " zz"}
        for r in sorted(
            synth_corpus(200),
            key=lambda r: (r["repo"], r["path"], r["commit"]),
        )[:5]
    ])
    with pytest.raises(ValueError, match="importance_fn"):
        append_segment(spark, seg_dir, extra, compute_quality=False,
                       near_dup=False)

    # serving tier: LocalSearcher auto-detects the flavor across the
    # segment union and serves BM25F values identical to wand_topk
    from searchengine_spark.query.serve_local import LocalSearcher

    lsr = LocalSearcher(seg_dir, stem=True)
    by_qid = {}
    for qid, rk, d, s in ws:
        by_qid.setdefault(qid, []).append((rk, d, s))
    n_checked = 0
    for qid, q in queries:
        mine = lsr.topk(q, k=10)
        want = sorted(by_qid.get(qid, []))
        assert len(mine) == len(want), (qid, q)
        for (ra_, da_, sa_), (rb_, db_, sb_) in zip(mine, want):
            assert (ra_, da_) == (rb_, db_), (qid, q)
            assert math.isclose(sa_, sb_, rel_tol=1e-9), (qid, q)
        n_checked += len(mine)
    assert n_checked > 0

    # sharded router over the 2-segment BM25F index (before the merge
    # collapses it to one segment): per-shard BM25F answers merge to
    # the unsharded values exactly — importance multipliers ride the
    # per-shard idf plan, which is global-stats-only like plain BM25
    from searchengine_spark.query.serve_local import ShardedSearcher

    rtr = ShardedSearcher(seg_dir, n_shards=2, stem=True)
    for qid, q in queries:
        got_r = rtr.topk(q, k=10)
        want_r = sorted(by_qid.get(qid, []))
        assert [(r_, d_) for r_, d_, _ in got_r] == [
            (r_, d_) for r_, d_, _ in want_r
        ], (qid, q)
        for (_, _, ga_), (_, _, wa_) in zip(got_r, want_r):
            assert math.isclose(ga_, wa_, rel_tol=1e-9), (qid, q)

    # merge preserves the flavor and the served values exactly
    merge_run(spark, seg_dir, 0, 2)
    seg2 = load_segments(spark, seg_dir)
    assert seg2.stats["importance_payload"] is True
    ws2 = rows(wand_topk(spark, seg2, queries, k=10, docs_per_range=64,
                         importance=True))
    assert ws2 == ws
    # ...and the serving tier refreshes onto the merged generation
    assert lsr.maybe_refresh() is True
    for qid, q in queries[:3]:
        got_m = lsr.topk(q, k=10)
        want_m = sorted(by_qid.get(qid, []))
        assert [(r_, d_) for r_, d_, _ in got_m] == [
            (r_, d_) for r_, d_, _ in want_m
        ], q
        for (_, _, ga_), (_, _, wa_) in zip(got_m, want_m):
            assert math.isclose(ga_, wa_, rel_tol=1e-9), q
    # flavor-aware audit: byte-identity + importance-range checks clean
    assert fsck_index(spark, seg_dir).count() == 0
