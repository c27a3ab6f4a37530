"""Maintenance soak (VERDICT r3 #7): cycles of append / upsert /
delete_where / tiered merge / expunge / backup-restore on one index,
asserting fsck-clean AND serving rank-identity vs a monolithic rebuild
of the expected live set after EVERY cycle.  The individual invariants
are pinned one-by-one in tests/test_segments.py; this pins their
COMPOSITION under churn — what a 100-TB operator actually runs.

Scaled for CI (4 waves x ~300 docs, 3 cycles); set
SPARK_GRAFT_SOAK_DOCS to grow it (the tools/maintain_index_job flow
at 10^5 docs uses the same legs).  Contents are made globally unique
(a per-row soak token) so the expected live set is pure bookkeeping —
exact/near-dup edge semantics have their own tests.
"""

import math
import os

import pytest
from pyspark.sql import functions as F

from searchengine_spark.corpus import QUERIES, synth_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.segments import (
    append_segment,
    delete_where,
    expunge_deletes,
    fsck_index,
    init_segmented,
    load_segments,
    maybe_merge,
    upsert_segment,
)
from searchengine_spark.index.shards import load_index, write_index
from searchengine_spark.query.scoring import score_queries_ondisk

N_DOCS = int(os.environ.get("SPARK_GRAFT_SOAK_DOCS", "1200"))
N_WAVES = 4
BUILD = dict(compute_quality=False, near_dup=False, stem=True)


def _rows():
    rows = []
    for i, r in enumerate(synth_corpus(max(N_DOCS, 400))):
        r = dict(r)
        r["content"] = (r["content"] + f" soak{i}").strip()
        rows.append(r)
    return rows


def _key(r):
    return (r["repo"], r["path"], r["commit"])


def _rank_by_url(res, docs):
    urls = {d["docid"]: d["url"] for d in docs.select("docid", "url").collect()}
    out = {}
    for r in res.collect():
        out[(r["qid"], r["rank"])] = (urls[r["docid"]], r["score"])
    return out


def _assert_rank_identity_tie_aware(ra, rb, cycle):
    """Rank identity modulo score ties: the docid tie-break differs
    between the churned index (append-order ids, upsert holes) and
    the lexical monolithic rebuild, so docs with EQUAL scores may
    permute within a score class.  Require: same (qid, rank) keys,
    per-key equal scores, and per-(qid, rounded-score) equal URL
    multisets."""
    assert set(ra) == set(rb) and ra, f"cycle {cycle}"
    by_cls_a, by_cls_b, qmin = {}, {}, {}
    for (qid, rank), (url, s) in ra.items():
        sb = rb[(qid, rank)][1]
        assert math.isclose(s, sb, rel_tol=1e-9), (qid, rank, cycle)
        c = round(s, 9)
        by_cls_a.setdefault((qid, c), set()).add(url)
        qmin[qid] = min(qmin.get(qid, c), c)
    for (qid, rank), (url, s) in rb.items():
        by_cls_b.setdefault((qid, round(s, 9)), set()).add(url)
    assert set(by_cls_a) == set(by_cls_b), f"score classes, cycle {cycle}"
    for key, urls_a in by_cls_a.items():
        qid, c = key
        if c == qmin[qid]:
            # the k-boundary class: a tie straddling the cut keeps a
            # docid-dependent SUBSET on each side — only the count is
            # portable across id orders
            assert len(urls_a) == len(by_cls_b[key]), (key, cycle)
        else:
            assert urls_a == by_cls_b[key], (key, cycle)


@pytest.mark.slow
def test_maintenance_soak_cycles(spark, tmp_path_factory):
    rows = _rows()
    per = len(rows) // N_WAVES
    waves = [rows[i * per:(i + 1) * per] for i in range(N_WAVES)]
    base = tmp_path_factory.mktemp("soak")
    seg_dir = str(base / "idx")

    truth = {_key(r): r for r in waves[0]}
    init_segmented(
        spark,
        build_tables(spark, spark.createDataFrame(waves[0]), **BUILD),
        seg_dir,
    )

    qs = [(qid, q) for qid, q in QUERIES]
    deleted_repos = []
    for cycle in range(1, N_WAVES):
        wave = waves[cycle]
        # 1. append a fresh wave
        append_segment(
            spark, seg_dir, spark.createDataFrame(wave), **BUILD
        )
        for r in wave:
            truth[_key(r)] = r

        # 2. upsert: edit 20 docs from an earlier wave (content change
        # -> old doc tombstoned, new content appended)
        editable = [
            r for r in waves[cycle - 1]
            if _key(r) in truth and truth[_key(r)]["repo"]
            not in deleted_repos
        ][:20]
        edits = []
        for r in editable:
            e = dict(truth[_key(r)])
            e["content"] = e["content"] + f" edited{cycle}"
            edits.append(e)
        if edits:
            upsert_segment(
                spark, seg_dir, spark.createDataFrame(edits), **BUILD
            )
            for e in edits:
                truth[_key(e)] = e

        # 3. policy delete: forget one still-live repo
        repos = sorted({
            r["repo"] for r in truth.values()
            if r["repo"] not in deleted_repos
        })
        victim = repos[cycle % len(repos)]
        n_victim = sum(
            1 for r in truth.values() if r["repo"] == victim
        )
        assert delete_where(
            spark, seg_dir, f"repo = '{victim}'"
        ) == n_victim
        deleted_repos.append(victim)
        truth = {
            k: r for k, r in truth.items() if r["repo"] != victim
        }

        # 4. maintenance: tiered merge + expunge
        maybe_merge(spark, seg_dir, merge_factor=2)
        expunge_deletes(spark, seg_dir, max_del_frac=0.2)

        # 5. audit: the raw bytes still satisfy every stored invariant
        assert fsck_index(spark, seg_dir).count() == 0, (
            f"fsck violations after cycle {cycle}"
        )

        # 6. serving state == monolithic rebuild of the live set
        seg = load_segments(spark, seg_dir)
        mono_dir = str(base / f"mono{cycle}")
        write_index(
            spark,
            build_tables(
                spark,
                spark.createDataFrame(sorted(
                    truth.values(), key=_key
                )),
                **BUILD,
            ),
            mono_dir,
        )
        mono = load_index(spark, mono_dir)
        assert seg.stats["n_survivors"] == mono.stats["n_survivors"]
        assert math.isclose(
            seg.stats["avgdl"], mono.stats["avgdl"], rel_tol=1e-12
        )
        st = {r["term"]: (r["df"], r["cf"])
              for r in seg.termdict.collect()}
        mt = {r["term"]: (r["df"], r["cf"])
              for r in mono.termdict.collect()}
        assert st == mt, f"termdict drift after cycle {cycle}"
        ra = _rank_by_url(
            score_queries_ondisk(spark, qs, seg, k=10), seg.docs
        )
        rb = _rank_by_url(
            score_queries_ondisk(spark, qs, mono, k=10), mono.docs
        )
        _assert_rank_identity_tie_aware(ra, rb, cycle)

    # 7. backup / restore round-trip at the end of the churn
    from searchengine_spark.index.backup import (
        backup_index,
        restore_index,
        verify_backup,
    )

    bdir = str(base / "bak")
    backup_index(seg_dir, bdir)
    assert verify_backup(bdir)["ok"]
    rdir = str(base / "restored")
    restore_index(bdir, rdir)
    a = _rank_by_url(
        score_queries_ondisk(
            spark, qs, load_segments(spark, seg_dir), k=10
        ),
        load_segments(spark, seg_dir).docs,
    )
    b = _rank_by_url(
        score_queries_ondisk(
            spark, qs, load_segments(spark, rdir), k=10
        ),
        load_segments(spark, rdir).docs,
    )
    assert a == b and a
