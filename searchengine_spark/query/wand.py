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

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..index.shards import IndexShards, buckets_of
from ..index.varbyte import decode_block_np, decode_payloads_np
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


def _dl_arrays(dl):
    """dl as (sorted docid array, parallel length array); accepts the
    dict form used by unit tests."""
    if isinstance(dl, tuple):
        return dl
    ids = np.fromiter(dl.keys(), dtype=np.int64, count=len(dl))
    lens = np.fromiter(dl.values(), dtype=np.float64, count=len(dl))
    o = np.argsort(ids, kind="stable")
    return ids[o], lens[o]


def _blk_decode(blk, with_imp=False):
    """(ids, tfs[, imps]) of one block — payload bytes, or a
    pre-decoded (ids, tfs[, imps]) tuple (LocalSearcher's decoded LRU,
    the reference's cache-decoded-postings design,
    lib/reader.py:229-259; the 3-tuple form is the importance-payload
    flavor)."""
    p = blk[3]
    if isinstance(p, tuple):
        if with_imp:
            if len(p) != 3:
                raise ValueError(
                    "pre-decoded blocks carry no importance"
                )
            return p
        return p[0], p[1]
    if with_imp:
        ids, tfs, _, _, imps = decode_block_np(
            bytes(p), want_positions=False, with_importance=True
        )
        return ids, tfs, imps
    ids, tfs, _, _ = decode_block_np(bytes(p), want_positions=False)
    return ids, tfs


def _blks_decode(blks, with_imp=False):
    """Concatenated (ids, tfs[, imps]) over blocks (bulk path)."""
    if blks and isinstance(blks[0][3], tuple):
        if with_imp:
            if len(blks[0][3]) != 3:
                raise ValueError(
                    "pre-decoded blocks carry no importance"
                )
            return (
                np.concatenate([b[3][0] for b in blks]),
                np.concatenate([b[3][1] for b in blks]),
                np.concatenate([b[3][2] for b in blks]),
            )
        return (
            np.concatenate([b[3][0] for b in blks]),
            np.concatenate([b[3][1] for b in blks]),
        )
    if with_imp:
        _, ids, tfs, _, _, imps = decode_payloads_np(
            [bytes(b[3]) for b in blks], want_positions=False,
            with_importance=True,
        )
        return ids, tfs, imps
    _, ids, tfs, _, _ = decode_payloads_np(
        [bytes(b[3]) for b in blks], want_positions=False
    )
    return ids, tfs


def _imp_table():
    """params.IMPORTANCE as a float64 lookup array (BM25F kernels)."""
    from ..params import IMPORTANCE

    return np.asarray(IMPORTANCE, dtype=np.float64)


def _imp_mult(table, imps):
    """Per-posting multiplier; out-of-table priorities fall back to
    the untagged multiplier — params.importance_mult_col's rule."""
    idx = np.where((imps >= 0) & (imps < table.size), imps, 0)
    return table[idx]


def _dl_member(dl_ids, ids):
    """Boolean mask: which decoded docids exist in the docs table.

    Postings are not rewritten when a doc is tombstoned (segment
    compaction, index/segments.py) — the docs table is the source of
    truth for liveness, exactly like the exhaustive scorer's inner join
    against docs.  Without this mask a tombstoned docid would be scored
    with a neighbor's doc length (or crash searchsorted at the array
    end)."""
    if dl_ids.size == 0:
        return np.zeros(ids.size, dtype=bool)
    pos = np.minimum(np.searchsorted(dl_ids, ids), dl_ids.size - 1)
    return dl_ids[pos] == ids


def _topk_merge(top_s, top_d, s, d, k):
    """Merge candidate (score, docid) vectors into the running top-k,
    tie-break (score desc, docid asc)."""
    all_s = np.concatenate([top_s, s])
    all_d = np.concatenate([top_d, d])
    if all_s.size > k:
        order = np.lexsort((all_d, -all_s))[:k]
        return all_s[order], all_d[order]
    order = np.lexsort((all_d, -all_s))
    return all_s[order], all_d[order]


def bmw_range(term_blocks, dl, avgdl, k, lo=None, hi=None,
              imp_table=None):
    """Conjunctive block-max intersection over one docid range
    (numpy-vectorized kernel).

    :param term_blocks: list (rarest first) of per-term dicts
        ``{"idf": float, "blocks": [(docid_first, docid_last, max_weight,
        payload), ...]}`` with blocks sorted by docid_first;
    :param dl: dict docid → doc length, or a pre-built
        ``(sorted_docids, lengths)`` array pair;
    :param lo/hi: optional docid clip (inclusive) for range boundaries;
    :param imp_table: BM25F mode (importance-payload indexes): the
        params.IMPORTANCE lookup array — per-posting weights scale by
        table[important].  Lossless with the same argument, because
        importance-payload blocks store IMPORTANCE-SCALED maxima
        (write_index bounds idf·tf_part·mult by idf·max_weight);
    :return: (top list of (score, docid) best-first, n_blocks_decoded).

    Exact-score guarantee: pruning only ever skips (a) docids that
    cannot contain every query term (skip pointers: a candidate outside
    every block span of some term), and (b) on the last term, whole
    blocks in which every member candidate's optimistic upper bound —
    accumulated exact score + idf·block_max — is strictly below the
    running k-th score.  Survivors get exact BM25 sums, accumulated
    rarest-term-first (a fixed, deterministic order).
    """
    decoded = 0
    if not term_blocks:
        return [], decoded
    dl_ids, dl_lens = _dl_arrays(dl)
    k1, b = BM25_K1, BM25_B
    wimp = imp_table is not None

    def weights(tfs, docids, imps=None):
        dlv = dl_lens[np.searchsorted(dl_ids, docids)]
        tff = tfs.astype(np.float64)
        w = tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dlv / avgdl))
        if imps is not None:
            w = w * _imp_mult(imp_table, imps)
        return w

    # candidates from the rarest term (conjunctive: every result has it),
    # bulk-decoded in one vectorized pass; block spans are disjoint and
    # ascending, so the concatenated docids arrive sorted
    first = term_blocks[0]
    fblocks = [
        blk
        for blk in first["blocks"]
        if not ((hi is not None and blk[0] > hi)
                or (lo is not None and blk[1] < lo))
    ]
    if not fblocks:
        return [], decoded
    dec = _blks_decode(fblocks, with_imp=wimp)
    cand_ids, cand_tfs = dec[0], dec[1]
    cand_imps = dec[2] if wimp else None
    decoded += len(fblocks)
    m = _dl_member(dl_ids, cand_ids)
    if lo is not None:
        m &= cand_ids >= lo
    if hi is not None:
        m &= cand_ids <= hi
    cand_ids, cand_tfs = cand_ids[m], cand_tfs[m]
    if wimp:
        cand_imps = cand_imps[m]
    if cand_ids.size == 0:
        return [], decoded
    cand_scores = first["idf"] * weights(cand_tfs, cand_ids, cand_imps)

    top_s = np.empty(0, dtype=np.float64)
    top_d = np.empty(0, dtype=np.int64)
    rest = term_blocks[1:]
    for ti, tb in enumerate(rest):
        blocks = tb["blocks"]
        idf = tb["idf"]
        starts = np.fromiter((blk[0] for blk in blocks), np.int64,
                             count=len(blocks))
        ends = np.fromiter((blk[1] for blk in blocks), np.int64,
                           count=len(blocks))
        # skip pointers: candidates outside every block span → no match
        bi = np.searchsorted(starts, cand_ids, side="right") - 1
        in_span = (bi >= 0) & (cand_ids <= ends[np.maximum(bi, 0)])
        cand_ids = cand_ids[in_span]
        cand_scores = cand_scores[in_span]
        bi = bi[in_span]
        if cand_ids.size == 0:
            return [], decoded
        last = ti == len(rest) - 1
        if not last:
            # every needed block will be decoded anyway (no threshold
            # exists before the last term — the scalar algorithm's heap
            # only fills there) → one bulk decode, one searchsorted
            need = np.unique(bi)
            dec = _blks_decode([blocks[i] for i in need], with_imp=wimp)
            ids_b, tfs_b = dec[0], dec[1]
            decoded += len(need)
            pos = np.minimum(np.searchsorted(ids_b, cand_ids),
                             ids_b.size - 1)
            present = ids_b[pos] == cand_ids
            if not present.any():
                return [], decoded
            cand_ids = cand_ids[present]
            cand_scores = cand_scores[present] + idf * weights(
                tfs_b[pos[present]], cand_ids,
                dec[2][pos[present]] if wimp else None,
            )
            continue
        # last term: per needed block in ascending docid order, so the
        # top-k threshold tightens as candidates stream through and
        # later blocks can be skipped without decoding
        cut = np.flatnonzero(np.diff(bi)) + 1
        seg_starts = np.concatenate([[0], cut])
        seg_ends = np.concatenate([cut, [bi.size]])
        for s0, s1 in zip(seg_starts, seg_ends):
            blk = blocks[bi[s0]]
            ids_m = cand_ids[s0:s1]
            sc_m = cand_scores[s0:s1]
            if top_s.size >= k:
                # block-max prune: strictly below the k-th score can
                # never reach the top-k (equality survives for the
                # docid-asc tie-break)
                thr = top_s[k - 1]
                keep = sc_m + idf * blk[2] >= thr
                if not keep.any():
                    continue
                ids_m, sc_m = ids_m[keep], sc_m[keep]
            dec = _blk_decode(blk, with_imp=wimp)
            ids_b, tfs_b = dec[0], dec[1]
            decoded += 1
            pos = np.minimum(np.searchsorted(ids_b, ids_m),
                             ids_b.size - 1)
            present = ids_b[pos] == ids_m
            if not present.any():
                continue
            ids_p = ids_m[present]
            s_p = sc_m[present] + idf * weights(
                tfs_b[pos[present]], ids_p,
                dec[2][pos[present]] if wimp else None,
            )
            top_s, top_d = _topk_merge(top_s, top_d, s_p, ids_p, k)
        break

    if not rest:  # single-term query: top-k straight from candidates
        top_s, top_d = _topk_merge(top_s, top_d, cand_scores, cand_ids, k)

    return [(float(s), int(d)) for s, d in zip(top_s, top_d)], decoded


def bmw_or_range(term_blocks, dl, avgdl, k, lo=None, hi=None,
                 imp_table=None):
    """DISJUNCTIVE (OR-mode) block-max top-k over one docid range — the
    classic WAND semantics the reference never had: score = Σ over the
    query terms a doc contains; no conjunctive filter.

    Pruning strategy (lossless, fully vectorized):
      1. seed: exact-score the term with the largest idf·block_max
         (bulk decode); the k-th best PARTIAL score is a valid lower
         bound on the final k-th score (a subset sum ≤ the total);
      2. upper-bound step function: every block contributes
         ±idf·block_max events at [docid_first, docid_last+1); the
         event-sweep prefix sum gives UB(d) ≥ true score for every
         docid WITHOUT decoding anything;
      3. only blocks overlapping an interval with UB ≥ threshold are
         decoded (prefix-sum-of-survivors range test);
      4. exact aggregation: concat (docid, idf·weight) over decoded
         terms → sort → add.reduceat → top-k (score desc, docid asc).

    A pruned doc has UB < thr ≤ k-th exact score, so it cannot be in
    the top-k (equality survives, preserving the docid tie-break).
    :return: (top list of (score, docid) best-first, n_blocks_decoded).
    """
    decoded = 0
    if not term_blocks:
        return [], decoded
    dl_ids, dl_lens = _dl_arrays(dl)
    k1, b = BM25_K1, BM25_B
    wimp = imp_table is not None

    def weights(tfs, docids, imps=None):
        dlv = dl_lens[np.searchsorted(dl_ids, docids)]
        tff = tfs.astype(np.float64)
        w = tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dlv / avgdl))
        if imps is not None:
            w = w * _imp_mult(imp_table, imps)
        return w

    def clipped_blocks(tb):
        return [
            blk for blk in tb["blocks"]
            if not ((hi is not None and blk[0] > hi)
                    or (lo is not None and blk[1] < lo))
        ]

    def clip_mask(ids):
        # range clip AND docs-table liveness (tombstoned docids decode
        # from blocks but must never score — see _dl_member)
        m = _dl_member(dl_ids, ids)
        if lo is not None:
            m &= ids >= lo
        if hi is not None:
            m &= ids <= hi
        return m

    per_term = [(tb["idf"], clipped_blocks(tb)) for tb in term_blocks]
    per_term = [(idf, bl) for idf, bl in per_term if bl]
    if not per_term:
        return [], decoded

    # 1. seed term = largest potential single contribution
    seed_i = max(
        range(len(per_term)),
        key=lambda i: per_term[i][0] * max(b2[2] for b2 in per_term[i][1]),
    )
    seed_idf, seed_blocks = per_term[seed_i]
    dec = _blks_decode(seed_blocks, with_imp=wimp)
    s_ids, s_tfs = dec[0], dec[1]
    decoded += len(seed_blocks)
    m = clip_mask(s_ids)
    s_ids, s_tfs = s_ids[m], s_tfs[m]
    s_imps = dec[2][m] if wimp else None
    seed_contrib = (
        seed_idf * weights(s_tfs, s_ids, s_imps) if s_ids.size
        else np.empty(0, np.float64)
    )
    thr = -np.inf
    if seed_contrib.size >= k:
        thr = np.partition(
            seed_contrib, seed_contrib.size - k
        )[seed_contrib.size - k]

    # 2. event-sweep UB(d): non-seed terms contribute block-span events
    # (columnar maxima, no decode); the seed term is already decoded, so
    # it contributes EXACT point events at its actual docids — a sparse
    # high-idf seed block would otherwise smear its max over the whole
    # span and keep every overlapping block alive
    rest_terms = [
        (idf, bl) for ti, (idf, bl) in enumerate(per_term) if ti != seed_i
    ]
    d1 = np.concatenate(
        [[b2[0] for b2 in bl] for _, bl in rest_terms] or [[]]
    ).astype(np.int64)
    d2 = np.concatenate(
        [[b2[1] for b2 in bl] for _, bl in rest_terms] or [[]]
    ).astype(np.int64)
    ubs = np.concatenate(
        [[idf * b2[2] for b2 in bl] for idf, bl in rest_terms] or [[]]
    ).astype(np.float64)
    pts = np.concatenate([d1, s_ids, d2 + 1, s_ids + 1])
    dv = np.concatenate([ubs, seed_contrib, -ubs, -seed_contrib])
    order = np.argsort(pts, kind="stable")
    pts_s, cum = pts[order], np.cumsum(dv[order])
    uniq = np.unique(pts_s)
    level = cum[np.searchsorted(pts_s, uniq, side="right") - 1]
    # 3. survivor intervals → which blocks must be decoded
    surv = (level >= thr).astype(np.int64)
    psum = np.concatenate([[0], np.cumsum(surv)])
    i1 = np.searchsorted(uniq, d1, side="right") - 1
    i2 = np.searchsorted(uniq, d2, side="right") - 1
    need = (psum[i2 + 1] - psum[np.maximum(i1, 0)]) > 0

    # 4. decode needed blocks, aggregate exactly
    id_ch, c_ch = [], []
    if s_ids.size:
        id_ch.append(s_ids)
        c_ch.append(seed_contrib)
    off = 0
    for idf, bl in rest_terms:
        nb = len(bl)
        sel = need[off : off + nb]
        off += nb
        needed_blocks = [b2 for b2, want in zip(bl, sel) if want]
        if not needed_blocks:
            continue
        dec = _blks_decode(needed_blocks, with_imp=wimp)
        ids, tfs = dec[0], dec[1]
        decoded += len(needed_blocks)
        m = clip_mask(ids)
        ids, tfs = ids[m], tfs[m]
        if ids.size:
            id_ch.append(ids)
            c_ch.append(
                idf * weights(tfs, ids, dec[2][m] if wimp else None)
            )
    if not id_ch:
        return [], decoded
    ids_all = np.concatenate(id_ch)
    c_all = np.concatenate(c_ch)
    order = np.argsort(ids_all, kind="stable")
    ids_s, c_s = ids_all[order], c_all[order]
    starts = np.flatnonzero(
        np.concatenate([[True], ids_s[1:] != ids_s[:-1]])
    )
    docids = ids_s[starts]
    scores = np.add.reduceat(c_s, starts)
    top_s, top_d = _topk_merge(
        np.empty(0, np.float64), np.empty(0, np.int64), scores, docids, k
    )
    return [(float(s), int(d)) for s, d in zip(top_s, top_d)], decoded


class BlockCache:
    """LRU of persisted block-row DataFrames keyed by term set — the
    Spark-native analogue of the reference's LRU(256) postings cache
    (lib/reader.py:229-259, behavior spec only).

    A repeated (or subset) query batch skips the parquet bucket scan
    entirely: the filtered block rows are persisted in the executors'
    block managers on first use, and later batches run their term
    filter over the in-memory rows.  Entries evict least-recently-used
    with an explicit unpersist, so executor memory is bounded by
    ``capacity`` × (blocks of one batch's terms).

    Cached rows are stored RANGE-EXPLODED and hash-partitioned on
    ``range_id`` with the same partition count as the persisted docs
    projection (``docs_df``), so a warm batch's cogroup reads both
    sides straight from executor memory with ZERO wide exchanges —
    the index shuffles once per term set, then serves every later
    batch.  That is the repeated-batch serving pattern at cluster
    scale: the shuffle cost is per working set, not per batch.

    The cache also memoizes the termdict rows the planner needs
    (``df_of``), including NEGATIVE lookups — the reference keeps its
    whole term dictionary in RAM; here a warm batch plans with zero
    Spark jobs while absent terms never re-trigger a scan."""

    def __init__(self, capacity: int = 32):
        from collections import OrderedDict

        self.capacity = capacity
        self._entries = OrderedDict()  # frozenset(terms) -> persisted DF
        self._shards_key = None
        self._dpr = None
        self._docs = None       # persisted (docid, total_tokens, range_id)
        self._dfmap = {}        # term -> df (None = absent from termdict)
        self._nparts = None

    @staticmethod
    def _persist_partitioned(df: DataFrame) -> DataFrame:
        """Persist ``df`` with its hash partitioning VISIBLE to
        consuming plans.  With the Spark 4 default
        ``canChangeCachedPlanOutputPartitioning=true``, AQE runs inside
        the cached fragment and the InMemoryRelation reports
        UnknownPartitioning — EnsureRequirements then re-shuffles the
        cached rows on every warm batch, defeating the point of
        co-partitioning them.  The conf matters only while the cached
        plan is CREATED (measured: flipping it back afterwards keeps
        the partitioning visible), so it is flipped just around the
        persist — AQE stays fully live for every other plan, including
        the whole build path."""
        conf = df.sparkSession.conf
        key = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        prev = conf.get(key)
        conf.set(key, "false")
        try:
            return df.persist()
        finally:
            conf.set(key, prev)

    def _sync(self, shards: IndexShards, docs_per_range: int) -> None:
        """Entries are valid only for the shards handle they were built
        from: a reload after append/compact/merge produces a NEW handle
        (different blocks lineage, possibly rescaled max_weight), and
        serving stale persisted rows would miss new segments or break
        the block-max bound — so a handle change flushes everything.
        A docs_per_range change invalidates the exploded range ids but
        NOT the termdict memo."""
        skey = (id(shards.blocks), shards.stats.get("n_survivors"),
                shards.stats.get("avgdl"))
        if skey != self._shards_key:
            self.clear()
            self._shards_key = skey
        if docs_per_range != self._dpr:
            self._flush_frames()
            self._dpr = docs_per_range
            self._nparts = int(
                shards.blocks.sparkSession.conf.get(
                    "spark.sql.shuffle.partitions"
                )
            )

    def get(self, shards: IndexShards, terms,
            docs_per_range: int = DOCS_PER_RANGE) -> DataFrame:
        """Range-exploded block rows covering ``terms`` (possibly a
        superset — callers keep their own term filter on top), hash-
        partitioned on range_id and persisted."""
        self._sync(shards, docs_per_range)
        key = frozenset(terms)
        hit = None
        if key in self._entries:
            hit = key
        else:
            for k2 in reversed(self._entries):
                if key <= k2:
                    hit = k2
                    break
        if hit is not None:
            self._entries.move_to_end(hit)
            return self._entries[hit]
        buckets = buckets_of(shards.blocks.sparkSession, sorted(key))
        rng = F.sequence(
            ((F.col("docid_first") - 1) / docs_per_range).cast("long"),
            ((F.col("docid_last") - 1) / docs_per_range).cast("long"),
        )
        df = (
            shards.blocks.filter(
                F.col("bucket").isin(buckets)
                & F.col("term").isin(sorted(key))
            )
            .select("term", "docid_first", "docid_last", "max_weight",
                    "payload")
            .withColumn("range_id", F.explode(rng))
            .repartition(self._nparts, "range_id")
        )
        df = self._persist_partitioned(df)
        self._entries[key] = df
        if len(self._entries) > self.capacity:
            _, old = self._entries.popitem(last=False)
            old.unpersist()
        return df

    def docs_df(self, shards: IndexShards,
                docs_per_range: int = DOCS_PER_RANGE) -> DataFrame:
        """The live-docs (docid, total_tokens, range_id) projection,
        hash-partitioned on range_id with the same partition count as
        the block entries (co-partitioned cogroup inputs) and persisted
        once per shards handle."""
        self._sync(shards, docs_per_range)
        if self._docs is None:
            self._docs = (
                shards.docs.select(
                    "docid",
                    "total_tokens",
                    ((F.col("docid") - 1) / docs_per_range).cast(
                        "long"
                    ).alias("range_id"),
                )
                .repartition(self._nparts, "range_id")
            )
            self._docs = self._persist_partitioned(self._docs)
        return self._docs

    def df_of(self, shards: IndexShards, terms) -> dict:
        """term → document frequency for ``terms`` present in the
        termdict, collecting only terms never looked up before (absent
        terms are memoized as None and never re-collected)."""
        self._sync(shards, self._dpr if self._dpr is not None
                   else DOCS_PER_RANGE)
        missing = [t for t in terms if t not in self._dfmap]
        if missing:
            found = {
                r["term"]: r["df"]
                for r in shards.termdict.filter(
                    F.col("term").isin(missing)
                ).select("term", "df").collect()
            }
            for t in missing:
                self._dfmap[t] = found.get(t)
        return {t: self._dfmap[t] for t in terms
                if self._dfmap[t] is not None}

    def _flush_frames(self):
        while self._entries:
            _, old = self._entries.popitem()
            old.unpersist()
        if self._docs is not None:
            self._docs.unpersist()
            self._docs = None

    def clear(self):
        self._flush_frames()
        self._dfmap = {}
        self._dpr = None


def plan_terms(spark, shards: IndexShards, queries, analyzer=analyze_query,
               require_all=True, cache: "BlockCache | None" = None):
    """Driver-side planning: per-qid pruned terms with idf + df.

    Returns (plans, all_terms) where plans[qid] = [(term, idf, df), ...]
    rarest-first.  ``require_all=True`` (conjunctive): qids with any
    absent term are dropped (a missing term ⇒ empty AND result — the
    BM25 top-k contract matches the oracle's strict AND).
    ``require_all=False`` (disjunctive): absent terms are dropped from
    the plan; the qid survives while ≥1 term exists.

    ``analyzer`` maps query text → {term: tf}; the default is the
    engine's stemmed analyzer, the flat (unstemmed) index passes its own.
    ``cache``: optional BlockCache — term df lookups are served from its
    driver-side termdict memo (zero Spark jobs on a warm batch).
    """
    termset = set()
    analyzed = {}
    for qid, text in queries:
        freq = analyzer(text)
        analyzed[qid] = sorted(freq)
        termset.update(freq)
    if not termset:
        return {}, []
    if cache is not None:
        dfmap = cache.df_of(shards, sorted(termset))
    else:
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
        if require_all:
            if not terms or any(t not in dfmap for t in terms):
                continue
        else:
            terms = [t for t in terms if t in dfmap]
            if not terms:
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
    mode: str = "and",
    cache: BlockCache | None = None,
    allowed_docs: DataFrame | None = None,
    importance: bool = False,
) -> DataFrame:
    """Batch BM25 top-k with block-max pruning.

    ``importance=True`` (BM25F, importance-payload indexes only):
    per-posting weights scale by the decoded field priority's
    params.IMPORTANCE multiplier; pruning stays lossless because such
    indexes store importance-SCALED block maxima (write_index).

    ``mode="and"`` (default): conjunctive — rank-identical to the
    exhaustive conjunctive BM25 scorer (reference semantics).
    ``mode="or"``: disjunctive — classic WAND; score sums the terms a
    doc contains, served by the event-sweep kernel (bmw_or_range).
    ``cache``: optional BlockCache — repeated-batch workloads serve
    block rows from executor memory instead of re-scanning parquet.
    ``allowed_docs``: optional DataFrame with a ``docid`` column —
    filtered search: only these docs are ELIGIBLE as results, while
    BM25 stats (idf/avgdl/N) stay corpus-global, the standard
    filtered-query semantics (a filter narrows eligibility, it does
    not re-weight the collection).  The filter rides the existing
    liveness mechanism: kernels mask every decoded candidate against
    the per-range ``dl`` membership set (the tombstone mask), so an
    inner join on the docs projection is the entire implementation —
    a docid-width shuffle at worst, and block-max bounds stay safe
    upper bounds over the shrunken candidate set (lossless pruning).
    Returns (qid, rank, docid, score).
    """
    plans, needed = plan_terms(
        spark, shards, queries, analyzer=analyzer,
        require_all=(mode == "and"), cache=cache,
    )
    empty = spark.createDataFrame(
        [], "qid int, rank int, docid long, score double"
    )
    if not plans:
        return empty

    n_docs_total = shards.stats["n_total"]
    n_ranges = max(1, -(-n_docs_total // docs_per_range))
    avgdl = shards.stats["avgdl"] or 1.0

    if cache is not None:
        # cached rows are already range-exploded and co-partitioned on
        # range_id with docs_df — the warm batch's cogroup reads both
        # sides from executor memory with no wide exchange
        base = cache.get(shards, needed, docs_per_range)  # superset ok
        blocks = base.filter(F.col("term").isin(needed))
    else:
        buckets = buckets_of(spark, needed)
        blocks = shards.blocks.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(needed)
        ).select(
            "term", "docid_first", "docid_last", "max_weight", "payload"
        )
        # a block joins every range its [first,last] span overlaps
        rng = F.sequence(
            ((F.col("docid_first") - 1) / docs_per_range).cast("long"),
            ((F.col("docid_last") - 1) / docs_per_range).cast("long"),
        )
        blocks = blocks.withColumn("range_id", F.explode(rng))

    if allowed_docs is not None:
        docs = shards.docs.join(
            allowed_docs.select("docid"), "docid"
        ).select(
            "docid",
            "total_tokens",
            ((F.col("docid") - 1) / docs_per_range).cast("long").alias(
                "range_id"
            ),
        )
    elif cache is not None:
        docs = cache.docs_df(shards, docs_per_range)
    else:
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
    conjunctive = mode == "and"
    if importance and not shards.stats.get("importance_payload"):
        raise ValueError(
            "importance=True needs an importance-payload index"
            " (write_index(store_importance=True))"
        )
    if not importance and shards.stats.get("importance_payload"):
        # field-blind WAND over an importance-payload index would be
        # silently LOSSY: stored block maxima are importance-SCALED and
        # multipliers < 1 exist (IMPORTANCE[0] = 0.8), so a plain-BM25
        # bound can undershoot a posting's true weight and prune a block
        # holding a top-k doc.  serve_local never offers this combination
        # for the same reason — mirror it loudly (exhaustive_topk remains
        # the field-blind scorer over this flavor: no bounds, no loss).
        raise ValueError(
            "importance=False over an importance-payload index is lossy"
            " (block maxima are importance-scaled); pass importance=True"
            " or use exhaustive_topk"
        )
    imp_t = _imp_table() if importance else None

    def run_range(keys, left, right):
        (range_id,) = keys
        lo = int(range_id) * dpr + 1
        hi = lo + dpr - 1
        if len(right) == 0:
            return pd.DataFrame({"qid": [], "docid": [], "score": []})
        dl_ids = right["docid"].to_numpy(np.int64)
        dl_lens = right["total_tokens"].to_numpy(np.float64)
        o = np.argsort(dl_ids, kind="stable")
        dl = (dl_ids[o], dl_lens[o])
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
            if conjunctive:
                if any(t not in by_term for t, _ in plan):
                    continue  # term absent in range → no AND match
                tbs = [
                    {"idf": idf, "blocks": by_term[t]} for t, idf in plan
                ]
                top, _ = bmw_range(tbs, dl, avgdl, kk, lo=lo, hi=hi,
                                   imp_table=imp_t)
            else:
                tbs = [
                    {"idf": idf, "blocks": by_term[t]}
                    for t, idf in plan
                    if t in by_term
                ]
                top, _ = bmw_or_range(tbs, dl, avgdl, kk, lo=lo, hi=hi,
                                      imp_table=imp_t)
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
    mode: str = "and",
    allowed_docs: DataFrame | None = None,
    importance: bool = False,
) -> DataFrame:
    """Reference semantics without pruning: decode → join → agg → top-k.

    The A/B partner of :func:`wand_topk` (SURVEY.md §7 step 4) and the
    shape the DuckDB oracle checks directly.  ``mode="or"`` drops the
    conjunctive nmatch filter (disjunctive scoring).  ``allowed_docs``
    restricts eligibility with corpus-global stats, same contract as
    wand_topk's — here it simply narrows the docs inner join.
    ``importance=True``: BM25F over an importance-payload index (the
    losslessness partner of wand_topk(importance=True)).
    """
    from ..index.shards import fetch_postings

    plans, needed = plan_terms(
        spark, shards, queries, analyzer=analyzer,
        require_all=(mode == "and"),
    )
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
    live = shards.docs
    if allowed_docs is not None:
        live = live.join(allowed_docs.select("docid"), "docid")
    postings = fetch_postings(shards, needed, with_importance=importance)
    hits = postings.join(F.broadcast(qterms), "term").join(
        live.select("docid", "total_tokens"), "docid"
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
    if importance:
        from ..params import importance_mult_col

        w8 = w8 * importance_mult_col(F.col("important"))
    scored = (
        hits.withColumn("contrib", F.col("idf") * w8)
        .groupBy("qid", "docid")
        .agg(
            F.sum("contrib").alias("score"),
            F.count("*").alias("nmatch"),
            F.first("nterms").alias("nterms"),
        )
    )
    if mode == "and":
        scored = scored.filter(F.col("nmatch") == F.col("nterms"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )
