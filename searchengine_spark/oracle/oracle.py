"""Single-node oracle — the executable spec (SURVEY.md §5.2, §7).

Pure-Python re-implementation of the pinned semantics.  The Spark engine
must be rank-identical to this module on the 20-query fixture set (scores
to 1e-6 rel, ranks exact, ties broken score desc / docid asc).

Pinned semantics and their reference citations:
 - docid: dense 1-based ``row_number() over (order by repo, path, commit)``
   — replaces the reference's file-walk order (makeindex.py:108); skipped
   docs still consume an id (makeindex.py:105-110).
 - empty filter: content.strip()=='' docs are dropped but keep their id
   (makeindex.py:116-122).
 - exact dedup: sha256(content) — input_hint pins sha256 (reference used a
   from-scratch CRC32+length, lib/duphash.py:80-92); keep lowest docid.
 - near-dup: 32-bit simhash over UNSTEMMED token counts (makeindex.py:201
   computes simhash before stemming at :221), Hamming<=3
   (lib/duphash.py:137-141).  Deterministic local-min rule: a doc is kept
   iff its docid <= every similar doc's docid (replaces the reference's
   order-dependent 200-doc sliding window, makeindex.py:72-78 — divergence
   documented in SURVEY.md P11).
 - total_tokens (doc length): count of DISTINCT stemmed terms
   (makeindex.py:223-224 quirk — len of the count dict, not sum).
 - scorer: BM25 (north rule), k1=1.2, b=0.75;
   idf = ln((N - df + 0.5)/(df + 0.5) + 1), df = corpus document
   frequency from the term dictionary; N = survivor count; dl/avgdl from
   total_tokens.  Blend structure follows the reference exactly
   (lib/queryproc.py:45-162, lib/params.py): per-doc BM25 sum and
   query-cosine are L2-normalized across candidates, gated at cosine>0.4,
   0.73/0.27 relevance blend, 0.59/0.23/0.18 PR/hub/auth quality blend,
   0.61/0.39 net blend.
 - query pruning: unknown alnum terms count toward prune; abort when
   pruned > 2*valid (lib/queryproc.py:186-219); stopword heap readmits
   k=floor(log2(n_stopwords)) least-df stopwords when stopwords >= 0.4 *
   unique valid terms (lib/queryproc.py:193-233).
 - PageRank: un-normalized teleport (1-d), contributions pr[u]/outdeg(u),
   damping .85, <=25 iters, tol 1e-6, universe = ALL docids including
   dropped ones (lib/pagerank.py:8-51, compute.py:27).
 - HITS: the reference's out-link variant — BOTH hub and auth accumulate
   over out-links (lib/hits.py:34-37), L2 normalized per iteration,
   <=25 iters, tol 1e-6.
"""

import hashlib
import math
import re
from collections import defaultdict

from ..params import (
    AUTH_FACTOR,
    BM25_B,
    BM25_K1,
    COSINE_FACTOR,
    COSINE_GATE,
    HITS_MAX_ITER,
    HITS_TOL,
    HUB_FACTOR,
    NET_RELEVANCE_FACTOR,
    PR_DAMPING,
    PR_FACTOR,
    PR_MAX_ITER,
    PR_TOL,
    QUALITY_FACTOR,
    TFIDF_FACTOR,
)
from ..query.prune import analyze_query, prune_query_terms
from ..text.analyze import analyze_counts
from ..text.simhash import is_similar, simhash32
from ..text.tokenizer import tokenize

IMPORT_RE = re.compile(r"^import\s+(\S+):(\S+)\s*$", re.MULTILINE)


class OracleIndex:
    def __init__(self):
        self.docs = {}          # docid -> dict(url, total_tokens, ...)
        self.postings = {}      # term -> {docid: (tf, positions)}
        self.n_total = 0
        self.n_survivors = 0
        self.avgdl = 0.0
        self.pr = {}
        self.hub = {}
        self.auth = {}
        self.edges = set()

    # ---- query path ----
    def df(self, term):
        return len(self.postings.get(term, {}))

    def process_query(self, query, k=10):
        frequencies = analyze_query(query)
        frequencies = prune_query_terms(frequencies, self.df)
        if not frequencies:  # None (aborted) or empty after pruning
            return []

        qterms = sorted(frequencies)
        # conjunctive intersection (lib/queryproc.py:16-42)
        cand = None
        for t in qterms:
            ds = set(self.postings[t])
            cand = ds if cand is None else cand & ds
        if not cand:
            return []
        cand = sorted(cand)

        N = self.n_survivors
        idf = {
            t: math.log((N - self.df(t) + 0.5) / (self.df(t) + 0.5) + 1.0)
            for t in qterms
        }

        doc_w = {}      # docid -> {term: bm25}
        for d in cand:
            dl = self.docs[d]["total_tokens"]
            w = {}
            for t in qterms:
                tf = self.postings[t][d][0]
                denom = tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / self.avgdl)
                w[t] = idf[t] * tf * (BM25_K1 + 1) / denom
            doc_w[d] = w
        doc_sum = {d: sum(w.values()) for d, w in doc_w.items()}

        qlen = sum(frequencies.values())
        q_w = {t: (frequencies[t] / qlen) * idf[t] for t in qterms}
        q_norm = math.sqrt(sum(x * x for x in q_w.values()))

        cosine = {}
        for d in cand:
            dot = sum(doc_w[d][t] * q_w[t] for t in qterms)
            d_norm = math.sqrt(sum(x * x for x in doc_w[d].values()))
            cosine[d] = dot / (d_norm * q_norm)

        sum_norm = math.sqrt(sum(x * x for x in doc_sum.values()))
        cos_norm = math.sqrt(sum(x * x for x in cosine.values()))

        pr_norm = math.sqrt(sum(self.pr.get(d, 0.0) ** 2 for d in cand))
        hub_norm = math.sqrt(sum(self.hub.get(d, 0.0) ** 2 for d in cand))
        auth_norm = math.sqrt(sum(self.auth.get(d, 0.0) ** 2 for d in cand))

        out = []
        for d in cand:
            nsum = doc_sum[d] / sum_norm if sum_norm else 0.0
            ncos = cosine[d] / cos_norm if cos_norm else 0.0
            rel = (
                TFIDF_FACTOR * nsum + COSINE_FACTOR * ncos
                if cosine[d] > COSINE_GATE
                else 0.0
            )
            npr = self.pr.get(d, 0.0) / pr_norm if pr_norm else 0.0
            nhub = self.hub.get(d, 0.0) / hub_norm if hub_norm else 0.0
            nauth = self.auth.get(d, 0.0) / auth_norm if auth_norm else 0.0
            qual = PR_FACTOR * npr + HUB_FACTOR * nhub + AUTH_FACTOR * nauth
            score = NET_RELEVANCE_FACTOR * rel + QUALITY_FACTOR * qual
            out.append((d, score))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]


def build_oracle(rows):
    """Build an OracleIndex from corpus row dicts."""
    oi = OracleIndex()
    ordered = sorted(rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    oi.n_total = len(ordered)

    # docid assignment + empty filter
    alive = []  # (docid, row)
    for i, r in enumerate(ordered, 1):
        if r["content"].strip():
            alive.append((i, r))

    # exact dedup: keep lowest docid per sha256
    best = {}
    for docid, r in alive:
        h = hashlib.sha256(r["content"].encode("utf-8")).hexdigest()
        if h not in best or docid < best[h][0]:
            best[h] = (docid, r)
    alive = sorted(best.values(), key=lambda x: x[0])

    # near-dup: local-min simhash rule (exhaustive, deterministic)
    fps = []
    for docid, r in alive:
        wc = defaultdict(int)
        for t in tokenize(r["content"]):
            wc[t] += 1
        fps.append((docid, simhash32(wc)))
    dropped = set()
    for i, (d1, f1) in enumerate(fps):
        for d2, f2 in fps[:i]:
            if is_similar(f1, f2):
                dropped.add(d1)
                break
    survivors = [(d, r) for d, r in alive if d not in dropped]

    # postings + docinfo
    memo = {}
    key_to_docid = {}
    for docid, r in survivors:
        counts = analyze_counts(r["content"], stem=True, _memo=memo)
        oi.docs[docid] = {
            "url": f"{r['repo']}/{r['path']}@{r['commit']}",
            "repo": r["repo"],
            "path": r["path"],
            "commit": r["commit"],
            "total_tokens": len(counts),
        }
        key_to_docid[(r["repo"], r["path"])] = docid
        for term, (tf, positions) in counts.items():
            oi.postings.setdefault(term, {})[docid] = (tf, positions)
    oi.n_survivors = len(survivors)
    oi.avgdl = (
        sum(d["total_tokens"] for d in oi.docs.values()) / oi.n_survivors
        if oi.n_survivors
        else 0.0
    )

    # edges: import extraction, resolved against surviving (repo, path)
    for docid, r in survivors:
        for repo, path in IMPORT_RE.findall(r["content"]):
            tgt = key_to_docid.get((repo, path))
            if tgt is not None and tgt != docid:
                oi.edges.add((docid, tgt))

    _pagerank(oi)
    _hits(oi)
    return oi


def _pagerank(oi):
    universe = list(range(1, oi.n_total + 1))
    n = len(universe)
    if n == 0:
        return
    pr = {d: 1.0 / n for d in universe}
    out = defaultdict(set)
    inl = defaultdict(set)
    for s, t in oi.edges:
        out[s].add(t)
        inl[t].add(s)
    for _ in range(PR_MAX_ITER):
        new = {}
        for d in universe:
            s = sum(pr[u] / len(out[u]) for u in inl[d])
            new[d] = (1 - PR_DAMPING) + PR_DAMPING * s
        if all(abs(new[d] - pr[d]) < PR_TOL for d in universe):
            pr = new
            break
        pr = new
    oi.pr = pr


def _hits(oi):
    universe = list(range(1, oi.n_total + 1))
    hub = {d: 1.0 for d in universe}
    auth = {d: 1.0 for d in universe}
    out = defaultdict(set)
    for s, t in oi.edges:
        out[s].add(t)
    for _ in range(HITS_MAX_ITER):
        nh = {d: sum(auth.get(v, 0.0) for v in out[d]) for d in universe}
        na = {d: sum(hub.get(v, 0.0) for v in out[d]) for d in universe}
        hn = math.sqrt(sum(x * x for x in nh.values()))
        if hn > 0:
            nh = {d: x / hn for d, x in nh.items()}
        an = math.sqrt(sum(x * x for x in na.values()))
        if an > 0:
            na = {d: x / an for d, x in na.items()}
        if all(abs(nh[d] - hub[d]) < HITS_TOL for d in universe) and all(
            abs(na[d] - auth[d]) < HITS_TOL for d in universe
        ):
            hub, auth = nh, na
            break
        hub, auth = nh, na
    oi.hub = hub
    oi.auth = auth
