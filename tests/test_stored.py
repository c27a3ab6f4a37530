"""Stored-fields sidecar (index/stored.py): point reads by docid off
the index dir, liveness-masked exactly like every query surface, and
rebuilt through physical merges.

Contracts pinned here (see the module docstring):
 * roundtrip — every LIVE docid's get_doc content hashes to the
   docs.sha256 the build recorded (complete-corpus check, not a
   sample);
 * tombstones mask serving while the bytes stay physically present
   until a merge (delete_docs -> get_doc None, raw sidecar read still
   returns content);
 * merge_segments / merge_run rebuild the merged generation's sidecar
   from the inputs' survivors (deleted rows physically gone after);
 * the mixed rule is loud: a run with any sidecar-less input merges to
   NO sidecar (store_content must be used consistently).
"""

import hashlib
import os

import pytest

from searchengine_spark.corpus import synth_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.segments import (
    append_segment,
    delete_docs,
    init_segmented,
    load_segments,
    merge_run,
    merge_segments,
)
from searchengine_spark.index.stored import (
    STORED_DIR,
    has_stored_fields,
    read_stored_doc,
)
from searchengine_spark.query.serve_local import LocalSearcher, ShardedSearcher


def _sha(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


@pytest.fixture(scope="module")
def halves(spark):
    """120-doc synth corpus split at the lexical key median (the
    test_segments convention: segment-by-segment docid assignment then
    reproduces the monolithic order)."""
    rows = sorted(
        synth_corpus(120), key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    half = len(rows) // 2
    return (
        spark.createDataFrame(rows[:half]),
        spark.createDataFrame(rows[half:]),
    )


@pytest.fixture(scope="module")
def stored_dir(spark, halves, tmp_path_factory):
    a, b = halves
    d = str(tmp_path_factory.mktemp("stored") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        d,
        store_content=True,
    )
    append_segment(
        spark, d, b, compute_quality=False, near_dup=False,
        store_content=True,
    )
    return d


def test_stored_roundtrip_all_live_docids(spark, stored_dir):
    cur = load_segments(spark, stored_dir, cache_meta=False)
    want = {
        int(r["docid"]): r["sha256"]
        for r in cur.docs.select("docid", "sha256").collect()
    }
    assert want
    ls = LocalSearcher(stored_dir, stem=True)
    for docid, sha in want.items():
        content = ls.get_doc(docid)
        assert content is not None, f"docid {docid} missing from sidecar"
        assert _sha(content) == sha
    # unknown ids: below, above, and the docid-0 hole
    assert ls.get_doc(0) is None
    assert ls.get_doc(max(want) + 10_000) is None

    # sharded point read routes to exactly one shard's range
    sh = ShardedSearcher(stored_dir, n_shards=2, stem=True)
    probe = sorted(want)[:3] + sorted(want)[-3:]
    for docid in probe:
        assert sh.get_doc(docid) is not None
        assert _sha(sh.get_doc(docid)) == want[docid]
    assert sh.get_doc(max(want) + 10_000) is None


def test_stored_tombstone_masks_but_keeps_bytes(spark, halves,
                                                tmp_path_factory):
    a, b = halves
    d = str(tmp_path_factory.mktemp("stored_del") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        d,
        store_content=True,
    )
    append_segment(
        spark, d, b, compute_quality=False, near_dup=False,
        store_content=True,
    )
    cur = load_segments(spark, d, cache_meta=False)
    ids = sorted(int(r["docid"]) for r in cur.docs.select("docid").collect())
    victims = [ids[0], ids[len(ids) // 2], ids[-1]]
    assert delete_docs(spark, d, victims) == len(victims)

    ls = LocalSearcher(d, stem=True)
    meta_segs = ls._serve_dirs
    raw_dirs = [os.path.join(s, STORED_DIR) for s in meta_segs]
    for v in victims:
        # serving masks the tombstone ...
        assert ls.get_doc(v) is None
        # ... but the bytes are physically present until a merge
        assert read_stored_doc(raw_dirs, v) is not None
    survivor = next(i for i in ids if i not in victims)
    assert ls.get_doc(survivor) is not None

    # physical merge drops the deleted rows from the rebuilt sidecar
    merged = merge_segments(spark, d)
    assert has_stored_fields(os.path.join(d, merged))
    merged_raw = [os.path.join(d, merged, STORED_DIR)]
    for v in victims:
        assert read_stored_doc(merged_raw, v) is None
    ls2 = LocalSearcher(d, stem=True)
    assert ls2.get_doc(survivor) is not None
    cur2 = load_segments(spark, d, cache_meta=False)
    for r in cur2.docs.select("docid", "sha256").collect():
        assert _sha(ls2.get_doc(int(r["docid"]))) == r["sha256"]


def test_highlight_matches_independent_render(spark, halves, stored_dir):
    """highlight = snippet_windows' (already-oracled) window rendered
    from the sidecar bytes: equal to an independent renderer over the
    raw corpus content, with exactly the query-term tokens marked."""
    import re

    from searchengine_spark.text.analyze import analyze

    TOK = re.compile(r"[a-z0-9]+")
    a, b = halves
    sha2content = {
        _sha(r["content"]): r["content"]
        for r in a.unionByName(b).select("content").collect()
    }
    cur = load_segments(spark, stored_dir, cache_meta=False)
    did2content = {
        int(r["docid"]): sha2content[r["sha256"]]
        for r in cur.docs.select("docid", "sha256").collect()
    }

    query, w = "parser notes", 12
    qterms = set(analyze(query, stem=True))
    ls = LocalSearcher(stored_dir, stem=True)
    wins = ls.snippet_windows(query, k=8, w=w)
    hits = ls.highlight(query, k=8, w=w)
    assert len(hits) == len(wins) > 0
    for (rank, docid, score, p, _nt, _nm), (hr, hd, hs, snip) in zip(
        wins, hits
    ):
        assert (rank, docid, score) == (hr, hd, hs)
        content = did2content[docid]
        low = content.lower()
        spans = [m.span() for m in TOK.finditer(low)]
        lo, hi = p - 1, min(p - 1 + w, len(spans))
        want, cur_pos = [], spans[lo][0]
        marked_any = False
        for s, e in spans[lo:hi]:
            want.append(content[cur_pos:s])
            word = content[s:e]
            if analyze(low[s:e], stem=True)[0] in qterms:
                want.append(f"**{word}**")
                marked_any = True
            else:
                want.append(word)
            cur_pos = e
        assert snip == "".join(want)
        assert marked_any  # windows anchor at a query-term match
        # stripped of markers, the snippet is verbatim document text
        # (skip docs whose own text contains the marker string)
        if "**" not in content:
            assert snip.replace("**", "") in content

    # sharded rendering merges to the same rows
    sh = ShardedSearcher(stored_dir, n_shards=2, stem=True)
    assert sh.highlight(query, k=8, w=w) == hits


def test_mixed_run_merges_to_no_sidecar(spark, halves, tmp_path_factory):
    a, b = halves
    d = str(tmp_path_factory.mktemp("stored_mixed") / "idx")
    init_segmented(
        spark,
        build_tables(spark, a, compute_quality=False, near_dup=False),
        d,
        store_content=True,
    )
    # second generation deliberately built WITHOUT the sidecar
    append_segment(spark, d, b, compute_quality=False, near_dup=False)
    ls = LocalSearcher(d, stem=True)
    cur = load_segments(spark, d, cache_meta=False)
    ids = sorted(int(r["docid"]) for r in cur.docs.select("docid").collect())
    # gen-1 ids resolve, gen-2 ids honestly return None pre-merge
    assert ls.get_doc(ids[0]) is not None
    assert ls.get_doc(ids[-1]) is None

    # merge_run over the mixed pair: the merged generation gets NO
    # sidecar (the loud consistency rule) — and the index still serves
    merged = merge_run(spark, d, 0, 2)
    assert not has_stored_fields(os.path.join(d, merged))
    ls2 = LocalSearcher(d, stem=True)
    assert ls2.get_doc(ids[0]) is None
    assert ls2.topk("parser notes", k=5)


def test_more_like_this_matches_recomputation(spark, stored_dir):
    """Serving-tier MLT: keyword extraction equals an independent
    tf-idf recomputation over the analyzed corpus (the
    tfidf_keywords rounded-rank rule), results are the OR-mode pass
    minus the source doc, the sharded answer is identical, and a
    content-less docid raises loudly."""
    import math
    from collections import Counter

    from searchengine_spark.text.analyze import analyze

    ls = LocalSearcher(stored_dir, stem=True)
    cur = load_segments(spark, stored_dir, cache_meta=False)
    ids = sorted(
        int(r["docid"]) for r in cur.docs.select("docid").collect()
    )
    texts = {d: ls.get_doc(d) for d in ids}
    toks = {d: analyze(t, stem=True) for d, t in texts.items()}
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    n = len(ids)
    assert n == ls.n_survivors

    sh = ShardedSearcher(stored_dir, n_shards=2, stem=True)
    for docid in ids[:3] + ids[-2:]:
        tf = Counter(toks[docid])
        want_kws = [t for _, t in sorted(
            (-round(c * math.log(n / df[t]), 6), t)
            for t, c in tf.items()
        )[:5]]
        assert ls._mlt_keywords(texts[docid], 5) == want_kws

        freq = Counter(want_kws)
        ref = ls.topk(
            " ".join(want_kws), k=11, mode="or",
            analyzer=lambda _t, f=freq: f,
        )
        want = [(d, s) for _, d, s in ref if d != docid][:10]
        got = ls.more_like_this(docid)
        assert got == [
            (r + 1, d, s) for r, (d, s) in enumerate(want)
        ]
        assert all(d != docid for _, d, _ in got)
        assert sh.more_like_this(docid) == got

    with pytest.raises(ValueError, match="stored fields"):
        ls.more_like_this(0)


def test_allowed_for_field_resolves_metadata_filters(spark, stored_dir):
    """Server-side field-filter resolution: the resolved docid set
    equals a Spark recomputation over the index docs tables, composes
    with filtered search exactly as a caller-supplied allowed= list,
    the sharded union is identical, and unknown fields raise."""
    from collections import Counter

    ls = LocalSearcher(stored_dir, stem=True)
    cur = load_segments(spark, stored_dir, cache_meta=False)
    docs = cur.docs.select("docid", "repo").collect()
    repo = Counter(r["repo"] for r in docs).most_common(1)[0][0]
    want = sorted(int(r["docid"]) for r in docs if r["repo"] == repo)
    assert want

    got = ls.allowed_for_field("repo", repo)
    assert sorted(int(x) for x in got) == want

    q = "spark table join"
    ref = ls.topk(q, allowed=want)
    assert ls.topk(q, allowed=got) == ref
    assert all(d in set(want) for _, d, _ in ref)

    sh = ShardedSearcher(stored_dir, n_shards=2, stem=True)
    got_sh = sh.allowed_for_field("repo", repo)
    assert sorted(int(x) for x in got_sh) == want
    assert sh.topk(q, allowed=got_sh) == ref

    with pytest.raises(ValueError, match="unknown stored doc field"):
        ls.allowed_for_field("lang", "en")


def test_sharded_count_sums_exactly(spark, stored_dir):
    """Per-shard hit counts sum to the unsharded total (every live doc
    in exactly one shard's range), both modes."""
    ls = LocalSearcher(stored_dir, stem=True)
    sh = ShardedSearcher(stored_dir, n_shards=2, stem=True)
    for q in ("spark table join", "hash dup"):
        for mode in ("and", "or"):
            assert sh.count(q, mode=mode) == ls.count(q, mode=mode)
    assert ls.count("spark", mode="and") > 0


def test_search_cli_one_shot(spark, stored_dir):
    """The CLI front-end prints the same docids LocalSearcher.search
    returns, with a count line, through the real subprocess surface."""
    import re
    import subprocess
    import sys

    q = "spark table"
    ls = LocalSearcher(stored_dir, stem=True)
    want = [d for _, d, _ in ls.search(q, k=10)]
    p = subprocess.run(
        [sys.executable, "tools/search_cli.py", "--index", stored_dir,
         q],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert f"count: {ls.count(q)}" in p.stdout
    got = [int(m) for m in re.findall(r"doc (\d+)", p.stdout)]
    assert got == want
