"""Conjunctive block-max top-k over the on-disk index (WAND pruning).

The reference's query path fetches each term's full postings list and
intersects docid sets in Python (lib/queryproc.py:16-42, lib/reader.py:
229-259).  The north rule extends this with block-max WAND pruning over
the compressed index.  Catalyst has no WAND operator, so the pruned
traversal runs inside a cogrouped ``applyInPandas`` (SURVEY.md §2.4 J1):

  1. driver: analyze + prune the query batch, look up per-term idf and
     block counts in the term dictionary (broadcast-scale);
  2. blocks of the query terms are read with shard pruning (bucket dirs
     + parquet term stats) — never the whole index;
  3. docid space is cut into ranges; blocks are assigned to the ranges
     they overlap (a block spans >1 range only when a salt stripe
     crosses a range boundary); docs (docid → dl) are cut the same way;
  4. per (range): pure-Python conjunctive block-max intersection
     (`bmw_range`, unit-testable) scores candidates with exact BM25 and
     skips blocks/candidates via skip pointers + block-max bounds;
  5. per-range local top-k → global per-qid top-k window.

Rank order (score desc, docid asc) and the BM25 scores are exactly those
of the exhaustive scorer — pruning is lossless, asserted by
tests/test_wand.py equivalence against both the exhaustive path and the
DuckDB oracle (driver `wand_topk` entry).
"""

from __future__ import annotations

import bisect
import heapq
import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..index.shards import IndexShards, buckets_of
from ..index.varbyte import decode_block
from ..params import BM25_B, BM25_K1
from .prune import analyze_query

RESULT_SCHEMA = "qid int, docid long, score double"

DOCS_PER_RANGE = 65536


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_weight(tf: int, dl: int, avgdl: float) -> float:
    return (
        tf * (BM25_K1 + 1.0)
        / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
    )


def bmw_range(term_blocks, dl, avgdl, k, lo=None, hi=None):
    """Conjunctive block-max intersection over one docid range.

    :param term_blocks: list (rarest first) of per-term dicts
        ``{"idf": float, "blocks": [(docid_first, docid_last, max_weight,
        payload), ...]}`` with blocks sorted by docid_first;
    :param dl: dict docid → doc length (total_tokens);
    :param lo/hi: optional docid clip (inclusive) for range boundaries;
    :return: (top list of (score, docid) best-first, n_blocks_decoded).

    Exact-score guarantee: pruning only ever skips (a) docids that
    cannot contain every query term (skip pointers) and (b) candidates
    whose optimistic upper bound — accumulated exact score plus the sum
    of remaining terms' block-max contributions at that docid — is below
    the current k-th score.  Survivors get exact BM25 sums.
    """
    decoded = 0
    if not term_blocks:
        return [], decoded

    # candidates from the rarest term (conjunctive: every result has it)
    first = term_blocks[0]
    cands = {}  # docid -> accumulated exact score
    for d1, d2, _mw, payload in first["blocks"]:
        if (hi is not None and d1 > hi) or (lo is not None and d2 < lo):
            continue
        docids, tfs, _pos = decode_block(bytes(payload))
        decoded += 1
        for docid, tf in zip(docids, tfs):
            if (lo is None or docid >= lo) and (hi is None or docid <= hi):
                cands[docid] = first["idf"] * bm25_weight(
                    tf, dl[docid], avgdl
                )
    if not cands:
        return [], decoded

    # remaining-terms optimistic bound per docid uses each term's
    # block-max at that docid (block-max WAND upper bound)
    heap = []  # min-heap of (score, -docid) for top-k threshold

    def threshold():
        return heap[0][0] if len(heap) >= k else float("-inf")

    rest = term_blocks[1:]
    order = sorted(cands)
    for ti, tb in enumerate(rest):
        blocks = tb["blocks"]
        starts = [b[0] for b in blocks]
        # optimistic tail bound: for terms after this one, their global
        # max block contribution (cheap, admissible)
        tail_ub = sum(
            t["idf"] * max((b[2] for b in t["blocks"]), default=0.0)
            for t in rest[ti + 1 :]
        )
        nxt = {}
        cache = {}
        for docid in order:
            i = bisect.bisect_right(starts, docid) - 1
            if i < 0:
                continue  # docid before this term's first block → no match
            d1, d2, mw, payload = blocks[i]
            if docid > d2:
                continue  # falls in a gap between blocks → no match
            ub = cands[docid] + tb["idf"] * mw + tail_ub
            if ub < threshold():
                # block-max pruned: strictly below the k-th score, so it
                # can never reach the top-k (equality must survive for
                # the docid-asc tie-break)
                continue
            if i not in cache:
                ids, tfs, _pos = decode_block(bytes(payload))
                decoded += 1
                cache[i] = dict(zip(ids, tfs))
            tf = cache[i].get(docid)
            if tf is None:
                continue  # inside block span but term absent for doc
            s = cands[docid] + tb["idf"] * bm25_weight(
                tf, dl[docid], avgdl
            )
            nxt[docid] = s
            if ti == len(rest) - 1:
                item = (s, -docid)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
        cands = nxt
        order = sorted(cands)
        if not cands:
            return [], decoded

    if not rest:  # single-term query: top-k straight from candidates
        for docid, s in cands.items():
            item = (s, -docid)
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    out = sorted(((s, -nd) for s, nd in heap),
                 key=lambda t: (-t[0], t[1]))
    return [(s, d) for s, d in out], decoded


def plan_terms(spark, shards: IndexShards, queries, analyzer=analyze_query):
    """Driver-side planning: per-qid pruned terms with idf + df.

    Returns (plans, all_terms) where plans[qid] = [(term, idf, df), ...]
    rarest-first; qids whose terms are not all present are dropped
    (conjunctive semantics: a missing term ⇒ empty result — unknown-term
    *pruning* for the blended engine lives in prune.py; the BM25 top-k
    contract here matches the oracle's strict AND).

    ``analyzer`` maps query text → {term: tf}; the default is the
    engine's stemmed analyzer, the flat (unstemmed) index passes its own.
    """
    termset = set()
    analyzed = {}
    for qid, text in queries:
        freq = analyzer(text)
        analyzed[qid] = sorted(freq)
        termset.update(freq)
    if not termset:
        return {}, []
    dfmap = {
        r["term"]: r["df"]
        for r in shards.termdict.filter(
            F.col("term").isin(list(termset))
        ).select("term", "df").collect()
    }
    n_docs = shards.stats["n_survivors"]
    plans = {}
    needed = set()
    for qid, terms in analyzed.items():
        if not terms or any(t not in dfmap for t in terms):
            continue
        plan = sorted(
            ((t, bm25_idf(n_docs, dfmap[t]), dfmap[t]) for t in terms),
            key=lambda x: (x[2], x[0]),
        )
        plans[qid] = plan
        needed.update(t for t, _, _ in plan)
    return plans, sorted(needed)


def wand_topk(
    spark: SparkSession,
    shards: IndexShards,
    queries,
    k: int = 10,
    docs_per_range: int = DOCS_PER_RANGE,
    analyzer=analyze_query,
) -> DataFrame:
    """Batch conjunctive BM25 top-k with block-max pruning.

    Returns (qid, rank, docid, score) — rank-identical to the exhaustive
    conjunctive BM25 scorer.
    """
    plans, needed = plan_terms(spark, shards, queries, analyzer=analyzer)
    empty = spark.createDataFrame(
        [], "qid int, rank int, docid long, score double"
    )
    if not plans:
        return empty

    n_docs_total = shards.stats["n_total"]
    n_ranges = max(1, -(-n_docs_total // docs_per_range))
    avgdl = shards.stats["avgdl"] or 1.0

    buckets = buckets_of(spark, needed)
    blocks = shards.blocks.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(needed)
    ).select("term", "docid_first", "docid_last", "max_weight", "payload")
    # a block joins every range its [first,last] span overlaps
    rng = F.sequence(
        ((F.col("docid_first") - 1) / docs_per_range).cast("long"),
        ((F.col("docid_last") - 1) / docs_per_range).cast("long"),
    )
    blocks = blocks.withColumn("range_id", F.explode(rng))

    docs = shards.docs.select(
        "docid",
        "total_tokens",
        ((F.col("docid") - 1) / docs_per_range).cast("long").alias(
            "range_id"
        ),
    )

    plans_b = spark.sparkContext.broadcast(
        {qid: [(t, i) for t, i, _ in plan] for qid, plan in plans.items()}
    )
    kk = k
    dpr = docs_per_range

    def run_range(keys, left, right):
        (range_id,) = keys
        lo = int(range_id) * dpr + 1
        hi = lo + dpr - 1
        dl = dict(zip(right["docid"], right["total_tokens"]))
        by_term = {}
        for t, d1, d2, mw, payload in zip(
            left["term"], left["docid_first"], left["docid_last"],
            left["max_weight"], left["payload"],
        ):
            by_term.setdefault(t, []).append(
                (int(d1), int(d2), float(mw), payload)
            )
        for blist in by_term.values():
            blist.sort(key=lambda b: b[0])
        rows = {"qid": [], "docid": [], "score": []}
        for qid, plan in plans_b.value.items():
            if any(t not in by_term for t, _ in plan):
                continue  # some term absent in this range → no AND match
            tbs = [
                {"idf": idf, "blocks": by_term[t]} for t, idf in plan
            ]
            top, _ = bmw_range(tbs, dl, avgdl, kk, lo=lo, hi=hi)
            for s, d in top:
                rows["qid"].append(qid)
                rows["docid"].append(d)
                rows["score"].append(s)
        return pd.DataFrame(rows)

    local = (
        blocks.groupby("range_id")
        .cogroup(docs.groupby("range_id"))
        .applyInPandas(run_range, schema=RESULT_SCHEMA)
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )


def exhaustive_topk(
    spark: SparkSession,
    shards: IndexShards,
    queries,
    k: int = 10,
    analyzer=analyze_query,
) -> DataFrame:
    """Reference semantics without pruning: decode → join → agg → top-k.

    The A/B partner of :func:`wand_topk` (SURVEY.md §7 step 4) and the
    shape the DuckDB oracle checks directly.
    """
    from ..index.shards import fetch_postings

    plans, needed = plan_terms(spark, shards, queries, analyzer=analyzer)
    if not plans:
        return spark.createDataFrame(
            [], "qid int, rank int, docid long, score double"
        )
    qrows = [
        (qid, t, idf, len(plan))
        for qid, plan in plans.items()
        for t, idf, _ in plan
    ]
    qterms = spark.createDataFrame(
        qrows, "qid int, term string, idf double, nterms int"
    )
    postings = fetch_postings(shards, needed)
    hits = postings.join(F.broadcast(qterms), "term").join(
        shards.docs.select("docid", "total_tokens"), "docid"
    )
    avgdl = shards.stats["avgdl"] or 1.0
    w8 = (
        F.col("tf").cast("double") * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.lit(avgdl)
            )
        )
    )
    scored = (
        hits.withColumn("contrib", F.col("idf") * w8)
        .groupBy("qid", "docid")
        .agg(
            F.sum("contrib").alias("score"),
            F.count("*").alias("nmatch"),
            F.first("nterms").alias("nterms"),
        )
        .filter(F.col("nmatch") == F.col("nterms"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
