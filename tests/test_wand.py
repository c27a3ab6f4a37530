"""Block-max WAND: unit pruning behavior + cluster equivalence
(SURVEY.md §7 "WAND correctness: equivalence test vs exhaustive scorer")."""

import math

import pytest

from searchengine_spark.corpus import QUERIES
from searchengine_spark.index.shards import load_index
from searchengine_spark.index.varbyte import encode_block
from searchengine_spark.query.wand import (
    bm25_weight,
    bmw_or_range,
    bmw_range,
    exhaustive_topk,
    wand_topk,
)


def _mk_blocks(postings, avgdl, dl, block=4):
    """postings: sorted (docid, tf) → block tuples with true maxima."""
    out = []
    for i in range(0, len(postings), block):
        chunk = postings[i : i + block]
        docids = [d for d, _ in chunk]
        tfs = [t for _, t in chunk]
        payload = encode_block(docids, tfs, [[] for _ in chunk])
        mw = max(bm25_weight(t, dl[d], avgdl) for d, t in chunk)
        out.append((docids[0], docids[-1], mw, payload))
    return out


def _brute(term_blocks_raw, idfs, dl, avgdl, k):
    """Exhaustive conjunctive BM25 over raw postings dicts."""
    sets = [set(p) for p in term_blocks_raw]
    common = set.intersection(*sets)
    scored = []
    for d in common:
        s = sum(
            idf * bm25_weight(raw[d], dl[d], avgdl)
            for raw, idf in zip(term_blocks_raw, idfs)
        )
        scored.append((s, d))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


def test_bmw_range_matches_brute_force():
    import random

    rng = random.Random(7)
    dl = {d: rng.randint(5, 60) for d in range(1, 401)}
    avgdl = sum(dl.values()) / len(dl)
    raws = []
    for df in (50, 180, 320):
        docs = sorted(rng.sample(range(1, 401), df))
        raws.append({d: rng.randint(1, 9) for d in docs})
    idfs = [math.log((400 - len(r) + 0.5) / (len(r) + 0.5) + 1) for r in raws]
    tbs = [
        {"idf": idf, "blocks": _mk_blocks(sorted(r.items()), avgdl, dl)}
        for r, idf in sorted(zip(raws, idfs), key=lambda x: len(x[0]))
    ]
    raws_sorted = sorted(raws, key=len)
    idfs_sorted = [
        math.log((400 - len(r) + 0.5) / (len(r) + 0.5) + 1)
        for r in raws_sorted
    ]
    for k in (1, 5, 20, 1000):
        got, _ = bmw_range(tbs, dl, avgdl, k)
        expect = _brute(raws_sorted, idfs_sorted, dl, avgdl, k)
        assert [d for _, d in got] == [d for _, d in expect]
        for (gs, _), (es, _) in zip(got, expect):
            assert abs(gs - es) < 1e-12


def test_bmw_range_prunes_blocks():
    """A rare first term + huge second term: most of the big term's
    blocks must never be decoded (skip pointers / block-max at work)."""
    import random

    rng = random.Random(11)
    dl = {d: 30 for d in range(1, 100_001)}
    avgdl = 30.0
    rare = {d: 3 for d in sorted(rng.sample(range(1, 100_001), 20))}
    big = {d: rng.randint(1, 5) for d in range(1, 100_001)}
    tbs = [
        {"idf": 5.0, "blocks": _mk_blocks(sorted(rare.items()), avgdl, dl,
                                          block=4)},
        {"idf": 0.1, "blocks": _mk_blocks(sorted(big.items()), avgdl, dl,
                                          block=128)},
    ]
    total_blocks = len(tbs[0]["blocks"]) + len(tbs[1]["blocks"])
    got, decoded = bmw_range(tbs, dl, avgdl, 10)
    assert len(got) == 10
    # candidate-driven skipping: decode ≈ 5 rare blocks + ≤20 big blocks,
    # out of ~787 total
    assert decoded < total_blocks / 10


def _brute_or(term_blocks_raw, idfs, dl, avgdl, k):
    """Exhaustive disjunctive BM25 over raw postings dicts."""
    union = set().union(*(set(p) for p in term_blocks_raw))
    scored = []
    for d in union:
        s = sum(
            idf * bm25_weight(raw[d], dl[d], avgdl)
            for raw, idf in zip(term_blocks_raw, idfs)
            if d in raw
        )
        scored.append((s, d))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return scored[:k]


def test_bmw_or_range_matches_brute_force():
    import random

    rng = random.Random(7)
    dl = {d: rng.randint(5, 60) for d in range(1, 401)}
    avgdl = sum(dl.values()) / len(dl)
    raws = []
    for df in (50, 180, 320):
        docs = sorted(rng.sample(range(1, 401), df))
        raws.append({d: rng.randint(1, 9) for d in docs})
    idfs = [math.log((400 - len(r) + 0.5) / (len(r) + 0.5) + 1) for r in raws]
    tbs = [
        {"idf": idf, "blocks": _mk_blocks(sorted(r.items()), avgdl, dl)}
        for r, idf in zip(raws, idfs)
    ]
    for k in (1, 5, 20, 1000):
        got, _ = bmw_or_range(tbs, dl, avgdl, k)
        expect = _brute_or(raws, idfs, dl, avgdl, k)
        assert [d for _, d in got] == [d for _, d in expect], k
        for (gs, _), (es, _) in zip(got, expect):
            assert math.isclose(gs, es, rel_tol=1e-9, abs_tol=1e-12)


def test_bmw_or_range_prunes_blocks():
    """OR-mode pruning: the seed term's partial top-k raises the
    threshold above the weak term's upper bound everywhere outside the
    rare docs' neighborhoods — most of the big term's blocks must never
    be decoded."""
    import random

    rng = random.Random(11)
    dl = {d: 30 for d in range(1, 100_001)}
    avgdl = 30.0
    rare = {d: 3 for d in sorted(rng.sample(range(1, 100_001), 20))}
    big = {d: rng.randint(1, 5) for d in range(1, 100_001)}
    tbs = [
        {"idf": 5.0, "blocks": _mk_blocks(sorted(rare.items()), avgdl, dl,
                                          block=4)},
        {"idf": 0.01, "blocks": _mk_blocks(sorted(big.items()), avgdl, dl,
                                           block=128)},
    ]
    total_blocks = len(tbs[0]["blocks"]) + len(tbs[1]["blocks"])
    got, decoded = bmw_or_range(tbs, dl, avgdl, 10)
    expect = _brute_or([rare, big], [5.0, 0.01], dl, avgdl, 10)
    assert [d for _, d in got] == [d for _, d in expect]
    assert decoded < total_blocks / 10, (decoded, total_blocks)


def test_bmw_kernels_mask_docids_missing_from_docs():
    """Tombstoned docs (segment compaction) stay in posting blocks but
    vanish from the docs table; both kernels must drop them — including
    the largest docid, where an unmasked searchsorted would read past
    the dl array (or alias a neighbor's doc length)."""
    dl_build = {d: 30 for d in range(1, 401)}
    # serving view: docid 400 (max) and 7 tombstoned
    dl_serve = {d: 30 for d in range(1, 401) if d not in (7, 400)}
    avgdl = 30.0
    a = {d: 2 for d in range(1, 401)}
    b = {d: 1 for d in range(5, 401, 5)}
    tbs = [
        {"idf": 2.0,
         "blocks": _mk_blocks(sorted(a.items()), avgdl, dl_build)},
        {"idf": 1.0,
         "blocks": _mk_blocks(sorted(b.items()), avgdl, dl_build)},
    ]
    a_live = {d: t for d, t in a.items() if d in dl_serve}
    b_live = {d: t for d, t in b.items() if d in dl_serve}

    got, _ = bmw_range(tbs, dl_serve, avgdl, 1000)
    expect = _brute([a_live, b_live], [2.0, 1.0], dl_serve, avgdl, 1000)
    assert [d for _, d in got] == [d for _, d in expect]
    assert not {7, 400} & {d for _, d in got}

    got, _ = bmw_or_range(tbs, dl_serve, avgdl, 1000)
    expect = _brute_or([a_live, b_live], [2.0, 1.0], dl_serve, avgdl, 1000)
    assert [d for _, d in got] == [d for _, d in expect]
    assert not {7, 400} & {d for _, d in got}

    # degenerate: every doc tombstoned → empty, no crash
    got, _ = bmw_range(tbs, {}, avgdl, 10)
    assert got == []
    got, _ = bmw_or_range(tbs, {}, avgdl, 10)
    assert got == []


def test_bmw_empty_and_single_term():
    dl = {1: 10, 2: 20}
    blocks = _mk_blocks([(1, 2), (2, 1)], 15.0, dl)
    got, _ = bmw_range([{"idf": 1.0, "blocks": blocks}], dl, 15.0, 5)
    assert [d for _, d in got] == sorted(
        [1, 2],
        key=lambda d: -1.0 * bm25_weight({1: 2, 2: 1}[d], dl[d], 15.0),
    )
    got, _ = bmw_range([], dl, 15.0, 5)
    assert got == []


# -- cluster equivalence ---------------------------------------------------

@pytest.fixture(scope="session")
def shards(spark, index_dir):
    return load_index(spark, index_dir)


def test_wand_equals_exhaustive_on_query_set(spark, shards):
    queries = [(qid, q) for qid, q in QUERIES]
    a = wand_topk(spark, shards, queries, k=10, docs_per_range=64)
    b = exhaustive_topk(spark, shards, queries, k=10)
    ga = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in a.collect()}
    gb = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in b.collect()}
    # same (qid, rank) → docid identity; scores compared with a relative
    # tolerance — WAND accumulates rarest-first while the exhaustive
    # scorer sums in Spark's reduction order, and float64 addition is
    # non-associative
    assert set(ga) == set(gb) and len(ga) > 0
    for key, (da, sa) in ga.items():
        db, sb = gb[key]
        assert da == db, key
        assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12), key


def test_wand_or_equals_exhaustive_or(spark, shards):
    queries = [(qid, q) for qid, q in QUERIES]
    a = wand_topk(spark, shards, queries, k=10, docs_per_range=64,
                  mode="or")
    b = exhaustive_topk(spark, shards, queries, k=10, mode="or")
    ga = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in a.collect()}
    gb = {(r["qid"], r["rank"]): (r["docid"], r["score"])
          for r in b.collect()}
    assert set(ga) == set(gb) and len(ga) > len(QUERIES)
    for key, (da, sa) in ga.items():
        db, sb = gb[key]
        assert da == db, key
        assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12), key


def test_wand_range_partition_invariance(spark, shards):
    """Result must not depend on the docid-range cut (the distributed
    seam of the WAND operator)."""
    queries = [(1, "parser notes"), (8, "hash bucket")]
    a = wand_topk(spark, shards, queries, k=10, docs_per_range=17)
    b = wand_topk(spark, shards, queries, k=10, docs_per_range=100_000)
    ka = sorted((r["qid"], r["rank"], r["docid"]) for r in a.collect())
    kb = sorted((r["qid"], r["rank"], r["docid"]) for r in b.collect())
    assert ka == kb


def test_wand_filtered_matches_exhaustive_and_local(spark, shards,
                                                    index_dir):
    """Filtered search (allowed_docs eligibility, corpus-global stats)
    must stay LOSSLESS: the pruned kernel path, the exhaustive scorer,
    and the local serving tier must return identical rankings over the
    same allowed set — and only allowed docids."""
    from searchengine_spark.query.serve_local import LocalSearcher
    from pyspark.sql import functions as F

    allowed_ids = sorted(
        r["docid"] for r in shards.docs.select("docid").collect()
        if r["docid"] % 2 == 0
    )
    allowed_df = spark.createDataFrame(
        [(d,) for d in allowed_ids], "docid long"
    )
    queries = [(qid, q) for qid, q in QUERIES]
    for mode in ("and", "or"):
        a = wand_topk(spark, shards, queries, k=10, docs_per_range=64,
                      mode=mode, allowed_docs=allowed_df)
        b = exhaustive_topk(spark, shards, queries, k=10, mode=mode,
                            allowed_docs=allowed_df)
        ga = {(r["qid"], r["rank"]): (r["docid"], r["score"])
              for r in a.collect()}
        gb = {(r["qid"], r["rank"]): (r["docid"], r["score"])
              for r in b.collect()}
        assert set(ga) == set(gb) and len(ga) > 0
        allowed_set = set(allowed_ids)
        for key, (da, sa) in ga.items():
            db, sb = gb[key]
            assert da == db and da in allowed_set, key
            assert math.isclose(sa, sb, rel_tol=1e-9, abs_tol=1e-12), key
        # the serving tier applies the same mask to the same kernels
        ls = LocalSearcher(index_dir, stem=True)
        for qid, text in queries:
            want = [(r, d) for (q, r), (d, _) in sorted(ga.items())
                    if q == qid]
            got = [(r, d) for r, d, _ in ls.topk(text, k=10, mode=mode,
                                                 allowed=allowed_ids)]
            assert got == want, (mode, qid)


def test_wand_unknown_term_gives_empty(spark, shards):
    out = wand_topk(spark, shards, [(1, "zzzqx parser")], k=10)
    assert out.count() == 0


def test_wand_block_cache_preserves_results(spark, shards):
    """Repeated batches through BlockCache must equal the uncached path
    — including a subset batch served from a cached superset entry —
    and the cache must hold persisted entries it can evict."""
    from searchengine_spark.query.wand import BlockCache

    queries = [(qid, q) for qid, q in QUERIES[:6]]
    cache = BlockCache(capacity=2)
    plain = sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in wand_topk(spark, shards, queries, k=10).collect()
    )
    for _ in range(2):  # second pass = cache hit
        cached = sorted(
            (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
            for r in wand_topk(
                spark, shards, queries, k=10, cache=cache
            ).collect()
        )
        assert cached == plain
    assert len(cache._entries) == 1
    # subset batch: served from the cached superset, same answers
    sub = queries[:2]
    plain_sub = sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in wand_topk(spark, shards, sub, k=10).collect()
    )
    got_sub = sorted(
        (r["qid"], r["rank"], r["docid"], round(r["score"], 9))
        for r in wand_topk(spark, shards, sub, k=10, cache=cache).collect()
    )
    assert got_sub == plain_sub
    assert len(cache._entries) == 1  # superset reused, no new entry
    cache.clear()
    assert not cache._entries


def test_wand_block_cache_warm_plan_and_memo(spark, shards):
    """The repeated-batch serving contract: a warm batch's plan reads
    both cogroup inputs from executor memory with NO input-side shuffle
    (the only remaining exchange is the per-qid result window), and its
    PLANNING runs zero Spark jobs (term df comes from the driver-side
    termdict memo — absent terms included, so unknown-term batches
    never re-scan)."""
    from pyspark.sql import functions as F

    from searchengine_spark.query.wand import BlockCache, plan_terms

    queries = [(qid, q) for qid, q in QUERIES[:6]]
    cache = BlockCache()
    wand_topk(spark, shards, queries, k=10, cache=cache).count()  # warm

    df = wand_topk(spark, shards, queries, k=10, cache=cache)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both cogroup inputs come from the cache, pre-partitioned
    assert plan.count("InMemoryTableScan") >= 2, plan
    # the only re-shuffle left is the final per-qid top-k window
    assert plan.count("ENSURE_REQUIREMENTS") == 1, plan

    # planning is Spark-job-free when memoized: a second plan_terms hits
    # only the memo (tracked via the termdict lineage access — assert
    # the df values instead, incl. a NEGATIVE entry that must be cached)
    plans1, _ = plan_terms(spark, shards, queries, cache=cache)
    missing_q = [(99, "qqzzneverterm parser")]
    plans_neg, _ = plan_terms(spark, shards, missing_q, cache=cache)
    assert 99 not in plans_neg  # conjunctive: absent term drops the qid
    assert cache._dfmap.get("qqzzneverterm", "absent-marker") is None
    plans2, _ = plan_terms(spark, shards, queries, cache=cache)
    assert plans1 == plans2
    # memo values equal a direct termdict lookup
    direct = {
        r["term"]: r["df"]
        for r in shards.termdict.filter(
            F.col("term").isin([t for q in plans1.values() for t, _, _ in q])
        ).select("term", "df").collect()
    }
    for plan_terms_list in plans1.values():
        for t, _idf, dfv in plan_terms_list:
            assert direct[t] == dfv

    # a shards-handle change (reload after append/compact/merge gives a
    # new blocks lineage) flushes frames AND the termdict memo
    from searchengine_spark.index.shards import IndexShards

    reloaded = IndexShards(
        blocks=shards.blocks.filter(F.lit(True)),
        termdict=shards.termdict, docs=shards.docs, stats=shards.stats,
    )
    assert cache._dfmap
    wand_topk(spark, reloaded, queries, k=10, cache=cache).count()
    assert cache._shards_key[0] == id(reloaded.blocks)
    assert "qqzzneverterm" not in cache._dfmap  # memo flushed with the handle
    cache.clear()


def test_wand_importance_lossless_and_matches_inmemory(
        spark, corpus_df, tmp_path_factory):
    """On-disk BM25F ([NORTH-EXT] completion): an importance-payload
    index (write_index(store_importance=True)) must (a) keep WAND
    lossless — wand_topk(importance=True) equals the exhaustive BM25F
    scorer exactly, bounds being importance-scaled block maxima — and
    (b) serve score_queries_ondisk(importance=True) rank-identical to
    the in-memory BM25F chain the driver oracle pins."""
    from searchengine_spark.index import build_tables
    from searchengine_spark.index.shards import write_index
    from searchengine_spark.query.scoring import (
        score_queries,
        score_queries_ondisk,
    )
    from searchengine_spark.text.importance import (
        extract_importance_text,
    )

    tables = build_tables(
        spark, corpus_df, compute_quality=False, stem=False,
        near_dup=False, importance_fn=extract_importance_text,
    )
    d = str(tmp_path_factory.mktemp("idx_imp") / "idx")
    write_index(spark, tables, d, store_importance=True)
    sh = load_index(spark, d)
    assert sh.stats["importance_payload"] is True

    queries = [(qid, q) for qid, q in QUERIES]
    for mode in ("and", "or"):
        a = wand_topk(spark, sh, queries, k=10, docs_per_range=64,
                      mode=mode, importance=True)
        b = exhaustive_topk(spark, sh, queries, k=10, mode=mode,
                            importance=True)
        ra = [(r["qid"], r["rank"], r["docid"], r["score"])
              for r in a.orderBy("qid", "rank").collect()]
        rb = [(r["qid"], r["rank"], r["docid"], r["score"])
              for r in b.orderBy("qid", "rank").collect()]
        assert len(ra) == len(rb) and ra, mode
        for (qa, ka, da, sa), (qb, kb, db, sb) in zip(ra, rb):
            assert (qa, ka, da) == (qb, kb, db), mode
            assert math.isclose(sa, sb, rel_tol=1e-9), mode

    # importance actually changes ranks vs the plain index on this
    # corpus (the extractor is live) — guard against a silent no-op
    plain = exhaustive_topk(spark, sh, queries, k=10)
    imp = exhaustive_topk(spark, sh, queries, k=10, importance=True)
    sp = [(r["qid"], r["docid"], round(r["score"], 9))
          for r in plain.orderBy("qid", "rank").collect()]
    si = [(r["qid"], r["docid"], round(r["score"], 9))
          for r in imp.orderBy("qid", "rank").collect()]
    assert sp != si

    # full blended chain: ondisk BM25F == in-memory BM25F
    mem = score_queries(spark, queries, tables, k=10, stem=False,
                        importance=True)
    dsk = score_queries_ondisk(spark, queries, sh, k=10, stem=False,
                               importance=True)
    rm = [(r["qid"], r["rank"], r["docid"], round(r["score"], 9))
          for r in mem.orderBy("qid", "rank").collect()]
    rd = [(r["qid"], r["rank"], r["docid"], round(r["score"], 9))
          for r in dsk.orderBy("qid", "rank").collect()]
    assert rm == rd and rm

    # serving tier: LocalSearcher auto-detects the payload flavor and
    # serves BM25F values identical to wand_topk(importance=True)
    from searchengine_spark.query.serve_local import LocalSearcher

    lsr = LocalSearcher(d, stem=True)
    want_rows = {}
    got = wand_topk(spark, sh, queries, k=10, docs_per_range=64,
                    importance=True)
    for r in got.collect():
        want_rows.setdefault(r["qid"], []).append(
            (r["rank"], r["docid"], r["score"])
        )
    n_checked = 0
    for qid, q in queries:
        mine = lsr.topk(q, k=10)
        want = sorted(want_rows.get(qid, []))
        assert len(mine) == len(want), (qid, q)
        for (ra_, da_, sa_), (rb_, db_, sb_) in zip(mine, want):
            assert (ra_, da_) == (rb_, db_), (qid, q)
            assert math.isclose(sa_, sb_, rel_tol=1e-9), (qid, q)
        n_checked += len(mine)
    assert n_checked > 0

    # a plain index refuses importance serving (loud, not silent)
    plain_tables = build_tables(
        spark, corpus_df, compute_quality=False, stem=False,
        near_dup=False,
    )
    d2 = str(tmp_path_factory.mktemp("idx_plain") / "idx")
    write_index(spark, plain_tables, d2)
    with pytest.raises(ValueError):
        wand_topk(spark, load_index(spark, d2), queries,
                  importance=True)

    # ...and the opposite direction: field-blind WAND over an
    # importance-payload index would prune lossily (block maxima are
    # importance-SCALED, multipliers < 1 exist) — must raise, mirroring
    # serve_local, never silently undershoot bounds
    with pytest.raises(ValueError, match="lossy"):
        wand_topk(spark, sh, queries, importance=False)
    # exhaustive stays the field-blind scorer over this flavor (no
    # bounds, no loss) — the `plain` run above already exercised it
