"""Millisecond ANN serving from the persisted IVF index — no Spark.

The vector-side companion of query/serve_local.LocalSearcher: the SAME
index directory build_ivf_index/append_ivf/compact_ivf maintain (cells
parquet partitioned by centroid id + centroids.parquet + the
ivf_segments.json manifest) read directly with pyarrow and scored in
numpy — value-identical to ops.vectors.ivf_topk_ondisk (asserted in
tests/test_serve_ivf.py), at single-digit-millisecond warm latency.

Identity is engineered, not hoped for:
 - probe selection reuses the exact driver-side sequential-fold cosine
   (ops.vectors._fold_dot semantics) over the k-row centroid table;
 - candidate cosines replicate Catalyst's ``aggregate`` left fold by
   accumulating dimension-by-dimension in float64 across the candidate
   matrix (each vector sees the identical IEEE operation sequence);
 - the round-to-5 matches Spark's HALF_UP-on-shortest-decimal rule via
   Decimal(repr(x)) quantization (numpy's half-even would disagree on
   exact .000005 boundaries).

Residency envelope: centroids (k×dim float64) and the tombstone id set
live in RAM; cell payloads are fetched per probe behind a count-capped
LRU (cells are ~n/k vectors each — the natural fetch unit).  Replicas
watch the manifest (``maybe_refresh``) exactly like LocalSearcher
watches the index commit stamp, so appends/deletes/compactions become
visible without restarting the process.

Replica contract vs compaction GC: compact_ivf defers deleting the
dirs it replaces until the NEXT compaction (the manifest's ``gc``
list), so a replica holding the previous manifest keeps serving
correct answers for a full compaction interval — ``maybe_refresh`` at
least once between compactions and you never read a deleted dir.
``refresh`` additionally retries once through a mid-read manifest
flip, so even a pathologically stale replica recovers instead of
crashing.
"""

from __future__ import annotations

import json
import math
import os
from collections import OrderedDict
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

_Q5 = Decimal("0.00001")
_Q6 = Decimal("0.000001")


def _round5(x: float) -> float:
    """Spark F.round(col, 5) parity: HALF_UP over the shortest decimal
    representation of the double (BigDecimal.valueOf semantics)."""
    return float(Decimal(repr(float(x))).quantize(_Q5, ROUND_HALF_UP))


def _round6(x: float) -> float:
    """F.round(col, 6) parity — the PQ encode-distance rounding."""
    return float(Decimal(repr(float(x))).quantize(_Q6, ROUND_HALF_UP))


def _fold_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


class LocalANN:
    """Spark-free reader/scorer over a persisted IVF index dir."""

    def __init__(self, index_dir: str, nprobe: int = 3,
                 cell_cache_size: int = 512,
                 cells: set | None = None):
        self.index_dir = index_dir
        self.nprobe = nprobe
        self._cache: OrderedDict = OrderedDict()
        self._cache_size = cell_cache_size
        # cells= restricts SCANNING to a cid subset (a cell-partition
        # shard: ShardedANN) — probe selection stays GLOBAL (every
        # replica holds the tiny centroid table), so per-vector scores
        # are identical to an unsharded replica and only the cell LRU
        # (the O(corpus) RAM) restricts to the subset
        self._cells = None if cells is None else {int(c) for c in cells}
        self._stamp = None
        self.refresh()

    # -- state loading ---------------------------------------------------

    def _manifest(self) -> dict:
        m = {"base": "cells", "generations": [], "tombstones": [],
             "batches": [], "gc": []}
        mp = os.path.join(self.index_dir, "ivf_segments.json")
        if os.path.exists(mp):
            with open(mp) as f:
                m.update(json.load(f))
        return m

    def _commit_stamp(self):
        """(mtime_ns, size) of the manifest, falling back to the
        centroids _SUCCESS marker for a freshly-built index that has
        never been appended to."""
        for p in (
            os.path.join(self.index_dir, "ivf_segments.json"),
            os.path.join(self.index_dir, "centroids.parquet", "_SUCCESS"),
        ):
            if os.path.exists(p):
                st = os.stat(p)
                return (p, st.st_mtime_ns, st.st_size)
        raise FileNotFoundError(
            f"no complete IVF index at {self.index_dir}"
        )

    def refresh(self) -> None:
        try:
            self._refresh_once()
        except FileNotFoundError:
            # a compaction GC'd a dir between our manifest read and the
            # dir read — the freshly-committed manifest is complete, so
            # one retry against it succeeds
            self._refresh_once()

    def _refresh_once(self) -> None:
        import pyarrow.parquet as pq

        self._stamp = self._commit_stamp()
        m = self._manifest()
        self.gens = [m["base"]] + m["generations"]

        cent = pq.read_table(
            os.path.join(self.index_dir, "centroids.parquet"),
            columns=["cid", "cv"],
        )
        rows = sorted(
            zip(cent["cid"].to_pylist(), cent["cv"].to_pylist())
        )
        self.cent = {cid: cv for cid, cv in rows}

        tomb = set()
        for t in m["tombstones"]:
            tt = pq.read_table(
                os.path.join(self.index_dir, t), columns=["vec_id"]
            )
            tomb.update(tt["vec_id"].to_pylist())
        self.tombstones = tomb
        self._cache.clear()

        # PQ serving mode: available iff the codebook sidecar exists
        # (ops/vectors.attach_pq_codebook); codes are encoded on cell
        # fetch and cached instead of the float matrix — 8 B of codes
        # vs dim×8 B per vector in replica RAM
        self.pq_cb = None
        self._pq_cache: OrderedDict = OrderedDict()
        cb_path = os.path.join(self.index_dir, "pq_codebook.parquet")
        if os.path.isdir(cb_path):
            t = pq.read_table(cb_path, columns=["m", "c", "cv"])
            rows = sorted(zip(t["m"].to_pylist(), t["c"].to_pylist(),
                              t["cv"].to_pylist()))
            n_m = max(r[0] for r in rows) + 1
            n_c = max(r[1] for r in rows) + 1
            self.pq_cb = [[None] * n_c for _ in range(n_m)]
            for m_, c_, cv in rows:
                self.pq_cb[m_][c_] = [float(x) for x in cv]

    def maybe_refresh(self) -> bool:
        """Reload iff a maintenance commit landed since the last load."""
        stamp = self._commit_stamp()
        if stamp != self._stamp:
            self.refresh()
            return True
        return False

    # -- cell fetch -------------------------------------------------------

    def _cell(self, gen: str, cid: int):
        """(vec_ids int64[n], emb float64[n, dim]) of one cell, LRU'd.
        Empty cells (cid absent from a generation) return (None, None)."""
        key = (gen, cid)
        if key in self._cache:
            self._cache.move_to_end(key)
            return self._cache[key]
        val = self._read_cell(gen, cid)
        self._cache[key] = val
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return val

    def _read_cell(self, gen: str, cid: int):
        """Uncached cell read (the PQ encoder uses this directly so the
        float matrix stays transient)."""
        import pyarrow.parquet as pq

        path = os.path.join(self.index_dir, gen, f"cid={cid}")
        if not os.path.isdir(path):
            val = (None, None)
        else:
            t = pq.read_table(path, columns=["vec_id", "embedding"])
            ids = t["vec_id"].to_numpy()
            col = t["embedding"].combine_chunks()
            n = len(col)
            off = col.offsets.to_numpy()
            widths = np.diff(off)
            flat = col.values.to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if n and (widths == widths[0]).all():
                emb = flat.reshape(n, widths[0])
            else:  # ragged (never written by this engine, but safe)
                emb = np.array(col.to_pylist(), dtype=np.float64)
            val = (ids.astype(np.int64), emb)
        return val

    def _cell_codes(self, gen: str, cid: int):
        """(vec_ids int64[n], codes uint8[n, M]) of one cell — encoded
        on first fetch against the attached codebook and LRU'd.  The
        float matrix is transient: the steady-state cache holds 1 byte
        per subspace per vector.

        Encode parity with ops/vectors._pq_encode is engineered: the
        squared-L2 terms accumulate dimension-by-dimension (Catalyst's
        left-fold IEEE order), combine as (xx - 2·xc) + cc, round via
        the HALF_UP 6-decimal rule, and argmin takes the first (lowest
        code) minimum."""
        key = (gen, cid)
        if key in self._pq_cache:
            self._pq_cache.move_to_end(key)
            return self._pq_cache[key]
        ids, emb = self._read_cell(gen, cid)
        if ids is None:
            val = (None, None)
        else:
            n = len(ids)
            n_m = len(self.pq_cb)
            sub = emb.shape[1] // n_m
            codes = np.empty((n, n_m), dtype=np.uint8)
            for m in range(n_m):
                X = emb[:, m * sub:(m + 1) * sub]
                xx = np.zeros(n)
                for j in range(sub):
                    xx += X[:, j] * X[:, j]
                dmat = np.empty((n, len(self.pq_cb[m])))
                for c, cv in enumerate(self.pq_cb[m]):
                    xc = np.zeros(n)
                    for j in range(sub):
                        xc += X[:, j] * cv[j]
                    cc = _fold_dot(cv, cv)
                    dmat[:, c] = (xx - 2.0 * xc) + cc
                for i in range(n):
                    codes[i, m] = int(np.argmin(
                        [_round6(d) for d in dmat[i]]
                    ))
            val = (ids, codes)
        self._pq_cache[key] = val
        if len(self._pq_cache) > self._cache_size:
            self._pq_cache.popitem(last=False)
        return val

    # -- query ------------------------------------------------------------

    def topk(self, query_vec, k: int = 10, exclude_vec_id=None,
             allowed=None):
        """[(vec_id, cosine)] — value-identical to ivf_topk_ondisk.

        ``allowed``: optional vec_id collection — metadata-filtered
        ANN on the serving tier, eligibility-only like the batch
        ann_filtered_topk (probes are chosen by query geometry alone;
        the mask rides the same slot as tombstones, so survivor
        cosines equal unfiltered scores exactly)."""
        qv = [float(x) for x in query_vec]
        qn = math.sqrt(_fold_dot(qv, qv))
        ranked = sorted(
            (
                (cid, _fold_dot(qv, cv)
                 / (math.sqrt(_fold_dot(cv, cv)) * qn))
                for cid, cv in self.cent.items()
            ),
            key=lambda cq: (-cq[1], cq[0]),
        )
        probes = [cid for cid, _ in ranked[: self.nprobe]]

        qarr = np.asarray(qv, dtype=np.float64)
        out_ids, out_cos = [], []
        for gen in self.gens:
            for cid in probes:
                if self._cells is not None and cid not in self._cells:
                    continue
                ids, emb = self._cell(gen, cid)
                if ids is None or not len(ids):
                    continue
                # Catalyst aggregate-fold parity: accumulate dim by dim
                # so every vector sees the same IEEE operation order as
                # the Spark left fold
                dot = np.zeros(len(ids))
                nrm = np.zeros(len(ids))
                for j in range(emb.shape[1]):
                    col = emb[:, j]
                    dot += col * qarr[j]
                    nrm += col * col
                cos = dot / (np.sqrt(nrm) * qn)
                out_ids.append(ids)
                out_cos.append(cos)
        if not out_ids:
            return []
        ids = np.concatenate(out_ids)
        cos = np.concatenate(out_cos)
        mask = np.ones(len(ids), dtype=bool)
        if self.tombstones:
            mask &= ~np.isin(
                ids, np.fromiter(self.tombstones, dtype=np.int64)
            )
        if exclude_vec_id is not None:
            mask &= ids != int(exclude_vec_id)
        if allowed is not None:
            mask &= np.isin(
                ids, np.fromiter(allowed, dtype=np.int64)
            )
        ids, cos = ids[mask], cos[mask]
        rcos = np.array([_round5(c) for c in cos])
        order = np.lexsort((ids, -rcos))[:k]
        return [(int(ids[i]), float(rcos[i])) for i in order]

    def pq_topk(self, query_vec, k: int = 10, exclude_vec_id=None,
                rerank: int = 32, allowed=None):
        """[(vec_id, cosine)] — the IVF-PQ serving path, value-identical
        to ops.vectors.ivf_pq_topk_ondisk: candidates ADC-scored from
        the cached codes (quantized cosine via the per-query lookup
        table, round-5), the top-``rerank`` shortlist rescored with the
        exact cosine (only those full vectors are read, via a vec_id
        predicate on the probed cells).  ``allowed`` masks candidates
        BEFORE the shortlist cut (so a filtered query still fills its
        shortlist with eligible vectors), same contract as topk."""
        if self.pq_cb is None:
            raise ValueError(
                "no PQ codebook attached to this index "
                "(ops.vectors.attach_pq_codebook)"
            )
        qv = [float(x) for x in query_vec]
        qn = math.sqrt(_fold_dot(qv, qv))
        ranked = sorted(
            (
                (cid, _fold_dot(qv, cv)
                 / (math.sqrt(_fold_dot(cv, cv)) * qn))
                for cid, cv in self.cent.items()
            ),
            key=lambda cq: (-cq[1], cq[0]),
        )
        probes = [cid for cid, _ in ranked[: self.nprobe]]
        ids, rsc = self._adc_scores(
            qv, qn, probes, exclude_vec_id, allowed=allowed
        )
        if ids is None:
            return []
        order = np.lexsort((ids, -rsc))[:rerank]
        short = set(int(ids[i]) for i in order)
        r_ids, r_cos = self._exact_rescore(qv, qn, probes, short)
        rcos = np.array([_round5(c) for c in r_cos])
        order = np.lexsort((r_ids, -rcos))[:k]
        return [(int(r_ids[i]), float(rcos[i])) for i in order]

    def _adc_scores(self, qv, qn, probes, exclude_vec_id=None,
                    allowed=None):
        """ADC phase of pq_topk over THIS replica's cells: (ids,
        round-5 quantized cosines) post tombstone/exclude/allowed
        mask, or (None, None) when nothing matches."""
        n_m = len(self.pq_cb)
        n_c = len(self.pq_cb[0])
        sub = len(self.pq_cb[0][0])
        dq = np.empty((n_m, n_c))
        cc = np.empty((n_m, n_c))
        for m in range(n_m):
            qm = qv[m * sub:(m + 1) * sub]
            for c in range(n_c):
                dq[m, c] = _fold_dot(qm, self.pq_cb[m][c])
                cc[m, c] = _fold_dot(self.pq_cb[m][c], self.pq_cb[m][c])

        out_ids, out_sc = [], []
        for gen in self.gens:
            for cid in probes:
                if self._cells is not None and cid not in self._cells:
                    continue
                ids, codes = self._cell_codes(gen, cid)
                if ids is None or not len(ids):
                    continue
                # m-ascending accumulation = Spark's sequential fold
                numer = np.zeros(len(ids))
                denom = np.zeros(len(ids))
                for m in range(n_m):
                    numer += dq[m][codes[:, m]]
                    denom += cc[m][codes[:, m]]
                out_ids.append(ids)
                out_sc.append(numer / (qn * np.sqrt(denom)))
        if not out_ids:
            return None, None
        ids = np.concatenate(out_ids)
        sc = np.concatenate(out_sc)
        mask = np.ones(len(ids), dtype=bool)
        if self.tombstones:
            mask &= ~np.isin(
                ids, np.fromiter(self.tombstones, dtype=np.int64)
            )
        if exclude_vec_id is not None:
            mask &= ids != int(exclude_vec_id)
        if allowed is not None:
            mask &= np.isin(
                ids, np.fromiter(allowed, dtype=np.int64)
            )
        ids, sc = ids[mask], sc[mask]
        return ids, np.array([_round5(x) for x in sc])

    def _exact_rescore(self, qv, qn, probes, short):
        """Exact-rerank phase: read ONLY the shortlist rows back from
        this replica's probed cells (predicate pushdown on vec_id),
        score with the fold-parity exact cosine; (ids, cosines)."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        qarr = np.asarray(qv, dtype=np.float64)
        r_ids, r_cos = [], []
        want = pc.field("vec_id").isin(list(short))
        for gen in self.gens:
            for cid in probes:
                if self._cells is not None and cid not in self._cells:
                    continue
                path = os.path.join(self.index_dir, gen, f"cid={cid}")
                if not os.path.isdir(path):
                    continue
                t = pq.read_table(
                    path, columns=["vec_id", "embedding"], filters=want
                )
                if not t.num_rows:
                    continue
                rids = t["vec_id"].to_numpy().astype(np.int64)
                col = t["embedding"].combine_chunks()
                emb = np.array(col.to_pylist(), dtype=np.float64)
                dot = np.zeros(len(rids))
                nrm = np.zeros(len(rids))
                for j in range(emb.shape[1]):
                    cj = emb[:, j]
                    dot += cj * qarr[j]
                    nrm += cj * cj
                r_ids.append(rids)
                r_cos.append(dot / (np.sqrt(nrm) * qn))
        if not r_ids:
            return np.empty(0, np.int64), np.empty(0)
        return np.concatenate(r_ids), np.concatenate(r_cos)


class ShardedANN:
    """Cell-partitioned ANN serving over ONE IVF dir — the vector
    twin of serve_local.ShardedSearcher: past one replica's RAM
    envelope, cells (the O(corpus) state: vectors or PQ codes) split
    round-robin across shard replicas while the tiny centroid table
    and tombstone set stay global in every shard.

    Losslessness: probe selection is a pure function of the global
    centroids (identical in every shard), cells partition the vectors
    disjointly, and a vector's cosine depends only on itself and the
    query — so the exact path merges per-shard top-k by (cosine desc,
    vec_id asc) losslessly.  The PQ path is TWO-PHASE at the router:
    per-shard ADC scores pool into ONE global top-``rerank`` shortlist
    (a shard-local shortlist could let extra reranked candidates
    intrude), then each shard exact-rescores the shortlist rows it
    owns — value-identical to an unsharded LocalANN.pq_topk
    (asserted in tests/test_serve_ivf.py).

    In production each shard is its own replica process fed the same
    parquet off shared storage; here they are in-process objects —
    the state partitioning, not the transport, is the demonstration.
    """

    def __init__(self, index_dir: str, n_shards: int, nprobe: int = 3,
                 cell_cache_size: int = 512):
        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        self.index_dir = index_dir
        self.nprobe = nprobe
        self._cache_size = cell_cache_size
        self._n_shards = n_shards
        self._build()

    def _build(self) -> None:
        first = LocalANN(self.index_dir, nprobe=self.nprobe,
                         cell_cache_size=self._cache_size)
        cids = sorted(first.cent)
        n = min(self._n_shards, max(1, len(cids)))
        owned = [set(cids[i::n]) for i in range(n)]
        first._cells = owned[0]
        first._cache.clear()  # may hold cells shard 0 no longer owns
        self.shards = [first] + [
            LocalANN(self.index_dir, nprobe=self.nprobe,
                     cell_cache_size=self._cache_size, cells=owned[i])
            for i in range(1, n)
        ]
        self._stamp = first._stamp

    def maybe_refresh(self) -> bool:
        """Re-partition on any maintenance commit: a rebuild can change
        the centroid SET, so ownership is recomputed from scratch."""
        if self.shards[0]._commit_stamp() != self._stamp:
            self._build()
            return True
        return False

    def topk(self, query_vec, k: int = 10, exclude_vec_id=None,
             allowed=None):
        cands = []
        for sh in self.shards:
            cands.extend(
                sh.topk(query_vec, k=k, exclude_vec_id=exclude_vec_id,
                        allowed=allowed)
            )
        cands.sort(key=lambda vc: (-vc[1], vc[0]))
        return cands[:k]

    def pq_topk(self, query_vec, k: int = 10, exclude_vec_id=None,
                rerank: int = 32, allowed=None):
        qv = [float(x) for x in query_vec]
        qn = math.sqrt(_fold_dot(qv, qv))
        sh0 = self.shards[0]
        ranked = sorted(
            (
                (cid, _fold_dot(qv, cv)
                 / (math.sqrt(_fold_dot(cv, cv)) * qn))
                for cid, cv in sh0.cent.items()
            ),
            key=lambda cq: (-cq[1], cq[0]),
        )
        probes = [cid for cid, _ in ranked[:self.nprobe]]
        all_ids, all_rsc = [], []
        for sh in self.shards:
            if sh.pq_cb is None:
                raise ValueError(
                    "no PQ codebook attached to this index "
                    "(ops.vectors.attach_pq_codebook)"
                )
            ids, rsc = sh._adc_scores(
                qv, qn, probes, exclude_vec_id, allowed=allowed
            )
            if ids is not None and len(ids):
                all_ids.append(ids)
                all_rsc.append(rsc)
        if not all_ids:
            return []
        ids = np.concatenate(all_ids)
        rsc = np.concatenate(all_rsc)
        order = np.lexsort((ids, -rsc))[:rerank]
        short = set(int(ids[i]) for i in order)
        r_ids, r_cos = [], []
        for sh in self.shards:
            rid, rco = sh._exact_rescore(qv, qn, probes, short)
            if len(rid):
                r_ids.append(rid)
                r_cos.append(rco)
        rid = np.concatenate(r_ids)
        rco = np.concatenate(r_cos)
        rcos = np.array([_round5(c) for c in rco])
        order = np.lexsort((rid, -rcos))[:k]
        return [(int(rid[i]), float(rcos[i])) for i in order]
