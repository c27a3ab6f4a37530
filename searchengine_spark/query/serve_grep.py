"""Spark-free substring serving over the persisted trigram shard.

The ms-latency tier of the Zoekt story (index/trigram.py builds the
shard, substring_topk_ondisk serves it from Spark): pyarrow reads the
query's trigram cells with the SAME bucket pruning the Spark path
plans (index/xxhash64.term_bucket — parity-tested vs F.xxhash64),
intersects coverage in numpy, and verifies the few candidates against
the documents parquet by exact containment — serve_local.py's
build/batch/ms three-tier pattern, applied to grep.

Value-identical to the Spark path by construction (same pruning rule,
same verify, same (n desc, doc_id asc) order — pinned in
tests/test_ops.py).
"""

import json
import os

import numpy as np

from ..index.xxhash64 import term_bucket


class LocalGrep:
    """Millisecond substring search over one trigram shard.

    ``docs_parquet`` is the same (doc_id, text, ...) parquet the shard
    was built from — the index stores no text, so verification reads
    the candidates' rows from the source table (pushdown on doc_id)."""

    def __init__(self, index_dir: str, docs_parquet: str,
                 doc_range=None):
        """``doc_range=(lo, hi)`` (half-open) restricts this replica to
        a docid range — the ShardedGrep state partition: candidate and
        verify reads both carry the range predicate, so parquet
        row-group stats prune when cells/docs are docid-clustered (the
        build writes them in docid order).  ``hi=None`` leaves the
        upper bound OPEN — the last shard's form, so ids appended
        after construction still route somewhere (the ShardedGrep
        merge == unsharded contract under growth)."""
        self._index_dir = index_dir
        self._docs = docs_parquet
        self._range = (
            (int(doc_range[0]),
             None if doc_range[1] is None else int(doc_range[1]))
            if doc_range is not None else None
        )
        self._load()

    def _load(self):
        mpath = os.path.join(self._index_dir, "trigram_index.json")
        if not os.path.exists(mpath):
            raise ValueError(
                f"no committed trigram index at {self._index_dir}"
            )
        with open(mpath) as f:
            manifest = json.load(f)
        self.n_buckets = int(manifest["n_buckets"])
        self._gens = manifest.get("generations", ["cells"])
        self._tomb_gens = manifest.get("tombstones", [])
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        # one UNION dataset over all generations (append_trigram keeps
        # each doc_id in exactly one, so coverage counts stay exact);
        # pyarrow unions dataset OBJECTS, not directory paths
        parts = [
            pads.dataset(
                os.path.join(self._index_dir, g), partitioning="hive"
            )
            for g in self._gens
        ]
        self._cells = parts[0] if len(parts) == 1 else pads.dataset(parts)
        # tombstone mask (delete_trigram sidecar): dead docs' cell rows
        # are physically present until a rebuild — every query masks
        # them, the serve_local _dl/tombstone contract on the grep tier
        if self._tomb_gens:
            self._tombs = np.unique(np.concatenate([
                pq.read_table(
                    os.path.join(self._index_dir, g),
                    columns=["doc_id"],
                ).column("doc_id").to_numpy()
                for g in self._tomb_gens
            ]))
        else:
            self._tombs = np.empty(0, np.int64)

    def maybe_refresh(self) -> bool:
        """Reload when an append committed a new generation list OR a
        delete committed new tombstones — the LocalSearcher/LocalANN
        maintenance contract."""
        mpath = os.path.join(self._index_dir, "trigram_index.json")
        with open(mpath) as f:
            m = json.load(f)
        if (m.get("generations", ["cells"]) != self._gens
                or m.get("tombstones", []) != self._tomb_gens):
            self._load()
            return True
        return False

    def search(self, q: str, k: int = 20):
        """[(doc_id, n_occurrences)] — n desc, doc_id asc, top k."""
        ql = q.lower()
        if len(ql) < 3:
            raise ValueError("substring search needs len(q) >= 3")
        need = sorted({ql[i:i + 3] for i in range(len(ql) - 2)})
        cand = self._candidates(need)
        if cand.size == 0:
            return []
        return self._verify(cand, lambda t: t.count(ql), k)

    def grep(self, pattern: str, k: int = 20):
        """Regex search — ops/textops.regex_search's rule on the ms
        tier: candidates pruned by the per-branch trigram plan
        (regex_anchor_sets — top-level alternation = union of branch
        coverage sets; any branch without a >= 3-char guaranteed run
        → full scan over all docs, correct but unpruned), verified
        with Python ``re`` (leftmost non-overlapping count, identical
        to regexp_count for the supported subset).
        [(doc_id, n_matches)] — n desc, doc_id asc, top k."""
        import re

        from ..ops.textops import regex_anchor_sets

        pl = pattern.lower()
        need_sets = regex_anchor_sets(pl)
        cand = None
        if need_sets:
            cand = np.unique(np.concatenate(
                [self._candidates(s) for s in need_sets]
            ))
            if cand.size == 0:
                return []
        rx = re.compile(pl)
        return self._verify(cand, lambda t: len(rx.findall(t)), k)

    def _candidates(self, need):
        """docids whose trigram rows cover ALL of ``need`` (bucket- and
        trigram-pruned cell read; rows are per-doc distinct, so
        coverage == row count)."""
        import pyarrow.dataset as pads

        tbs = sorted({term_bucket(t, self.n_buckets) for t in need})
        flt = (pads.field("tb").isin(tbs)
               & pads.field("tg").isin(need))
        if self._range is not None:
            lo, hi = self._range
            flt = flt & (pads.field("doc_id") >= lo)
            if hi is not None:
                flt = flt & (pads.field("doc_id") < hi)
        t = self._cells.to_table(filter=flt, columns=["doc_id"])
        ids = t.column("doc_id").to_numpy()
        if ids.size == 0:
            return np.empty(0, np.int64)
        # (tg, doc_id) rows are distinct per doc by construction, so a
        # doc covering all |need| trigrams appears exactly |need| times
        uniq, counts = np.unique(ids, return_counts=True)
        cov = uniq[counts == len(need)]
        if self._tombs.size:
            cov = cov[~np.isin(cov, self._tombs)]
        return cov

    def _verify(self, cand, count_fn, k):
        """Exact-match counting over the candidates' text rows (cand
        None = unpruned full scan); (doc_id, n) n desc / doc_id asc."""
        import pyarrow.dataset as pads

        ds = pads.dataset(self._docs)
        flt = None
        if self._range is not None:
            lo, hi = self._range
            flt = pads.field("doc_id") >= lo
            if hi is not None:
                flt = flt & (pads.field("doc_id") < hi)
        if cand is not None:
            c = pads.field("doc_id").isin(cand.tolist())
            flt = c if flt is None else (flt & c)
        dt = ds.to_table(filter=flt, columns=["doc_id", "text"])
        doc_ids = dt.column("doc_id").to_numpy()
        # the unpruned full-scan path (cand None) bypasses _candidates'
        # tombstone mask — mask here so no surface serves a dead doc
        live = (
            ~np.isin(doc_ids, self._tombs)
            if (cand is None and self._tombs.size)
            else None
        )
        out = []
        for i, (d, text) in enumerate(zip(
            doc_ids.tolist(), dt.column("text").to_pylist()
        )):
            if live is not None and not live[i]:
                continue
            n = count_fn(text.lower()) if text is not None else 0
            if n:
                out.append((int(d), n))
        out.sort(key=lambda dn: (-dn[1], dn[0]))
        return out[:k]


class ShardedGrep:
    """Docid-range-sharded grep serving over ONE trigram shard dir —
    the substring/regex twin of serve_local.ShardedSearcher and
    serve_ivf.ShardedANN: each replica is a LocalGrep restricted to a
    contiguous docid range, so the O(corpus) serving reads (cell rows
    and verify text) split across replicas while the planner state
    (manifest, bucket rule) is global and identical in every shard.

    Losslessness is trivial: ranges partition the docid space
    disjointly, a doc's occurrence/match count depends only on its own
    text, and the router merges per-shard results by
    (n desc, doc_id asc) — exactly LocalGrep's order — so the merged
    top-k equals an unsharded LocalGrep's (pinned in tests/test_ops.py).

    In production each shard is its own replica process over shared
    storage and the ranges come from table statistics; here the
    bounds are read once from the docs parquet and the shards are
    in-process objects — the state partitioning, not the transport,
    is the demonstration (the ShardedSearcher contract).
    """

    def __init__(self, index_dir: str, docs_parquet: str,
                 n_shards: int):
        import pyarrow.dataset as pads

        if n_shards < 1:
            raise ValueError("n_shards must be >= 1")
        ids = pads.dataset(docs_parquet).to_table(
            columns=["doc_id"]
        ).column("doc_id").to_numpy()
        if ids.size == 0:
            raise ValueError("empty docs table")
        lo, hi = int(ids.min()), int(ids.max()) + 1
        step = max(1, -(-(hi - lo) // n_shards))
        self._shards = []
        for s in range(n_shards):
            a = lo + s * step
            b = hi if s == n_shards - 1 else min(hi, a + step)
            if a >= hi:
                break
            # the LAST shard's upper bound stays OPEN: docs appended
            # after construction get ids >= hi, and a frozen bound
            # would silently exclude them from every replica — an open
            # tail keeps the router lossless under growth (ranges
            # still partition the id space disjointly)
            rng = (a, None) if b == hi else (a, b)
            self._shards.append(
                LocalGrep(index_dir, docs_parquet, doc_range=rng)
            )

    @staticmethod
    def _merge(parts, k):
        out = [r for p in parts for r in p]
        out.sort(key=lambda dn: (-dn[1], dn[0]))
        return out[:k]

    def search(self, q: str, k: int = 20):
        return self._merge([s.search(q, k=k) for s in self._shards], k)

    def grep(self, pattern: str, k: int = 20):
        return self._merge(
            [s.grep(pattern, k=k) for s in self._shards], k
        )

    def maybe_refresh(self) -> bool:
        return any([s.maybe_refresh() for s in self._shards])
