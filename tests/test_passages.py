"""Passage family (ops/passages.py): chunking arithmetic, passage-level
BM25, and best-window snippet rules vs pure-Python recomputations."""

import math
import re

from pyspark.sql import functions as F

from searchengine_spark.ops.passages import (
    CHUNK_STRIDE,
    CHUNK_W,
    PASSAGE_TERMS,
    SNIPPET_TERMS,
    SNIPPET_W,
    chunk_docs,
    chunk_tokens,
    highlight_topk,
    passage_topk,
    window_snippets,
)
from searchengine_spark.params import BM25_B, BM25_K1

SF = "/root/testdata/sf0.001"


def _texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }


def _tok(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _py_chunks(tokens, w=CHUNK_W, s=CHUNK_STRIDE):
    """chunk_id -> token window, per the pinned rule: windows start at
    1-based pos 1+c*s while that start position exists."""
    out = {}
    c = 0
    while c * s < len(tokens):
        out[c] = tokens[c * s: c * s + w]
        c += 1
    return out


def test_chunk_docs_matches_python(spark):
    texts = _texts(spark)
    want = {}
    for d, text in texts.items():
        for c, win in _py_chunks(_tok(text)).items():
            want[(d, c)] = (1 + c * CHUNK_STRIDE, len(win), " ".join(win))
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["start_pos"], r["n_tokens"], r["chunk_text"],
        )
        for r in chunk_docs(spark, SF).collect()
    }
    assert got == want


def test_chunk_tokens_bounded_expansion_no_join(spark):
    """Scale shape: the membership explode multiplies token rows by at
    most ceil(w/stride), and the plan is join-free (pure map-side
    explode — the only shuffle downstream is the chunk agg)."""
    ct = chunk_tokens(spark, SF)
    n_tok = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.size(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(r"[a-z0-9]+"), 0
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    factor = math.ceil(CHUNK_W / CHUNK_STRIDE)
    assert ct.count() <= n_tok * factor
    plan = ct._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def _py_passage_scores(texts, terms, w=CHUNK_W, s=CHUNK_STRIDE):
    """(doc_id, chunk_id) -> rounded conjunctive passage BM25."""
    chunks = {}
    for d, text in texts.items():
        for c, win in _py_chunks(_tok(text), w, s).items():
            chunks[(d, c)] = win
    n = len(chunks)
    dls = {k: len(set(v)) for k, v in chunks.items()}
    avgdl = sum(dls.values()) / n
    df = {
        t: sum(1 for v in chunks.values() if t in v) for t in terms
    }
    out = {}
    for key, win in chunks.items():
        if not all(t in win for t in terms):
            continue
        sc = 0.0
        for t in terms:
            tf = win.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            sc += (
                idf * tf * (BM25_K1 + 1)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[key] / avgdl))
            )
        out[key] = round(sc, 6)
    return out


def test_passage_topk_matches_python(spark):
    want_all = _py_passage_scores(_texts(spark), PASSAGE_TERMS)
    want = sorted(
        ((s, d, c) for (d, c), s in want_all.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    got = [
        (r["score"], r["doc_id"], r["chunk_id"])
        for r in passage_topk(spark, SF).collect()
    ]
    assert got == [(s, d, c) for s, d, c in want]
    # start_pos rides the pinned arithmetic
    for r in passage_topk(spark, SF).collect():
        assert r["start_pos"] == 1 + r["chunk_id"] * CHUNK_STRIDE


def _py_doc_scores(texts, terms):
    """Document-level conjunctive BM25 on the quirky distinct-term dl —
    the _bm25_scored contract."""
    toks = {d: _tok(t) for d, t in texts.items()}
    dls = {d: len(set(v)) for d, v in toks.items() if v}
    n = len(dls)
    avgdl = sum(dls.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        if not v or not all(t in v for t in terms):
            continue
        sc = 0.0
        for t in terms:
            tf = v.count(t)
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            sc += (
                idf * tf * (BM25_K1 + 1)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[d] / avgdl))
            )
        out[d] = round(sc, 6)
    return out


def test_window_snippets_match_python(spark):
    texts = _texts(spark)
    terms, w, k = SNIPPET_TERMS, SNIPPET_W, 10
    scores = _py_doc_scores(texts, terms)
    top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
    want = {}
    for d, sc in top:
        toks = _tok(texts[d])
        matches = [
            (i + 1, t) for i, t in enumerate(toks) if t in terms
        ]
        cand = []
        for p, _ in matches:
            inwin = [(q, t) for q, t in matches if p <= q < p + w]
            cand.append(
                (-len({t for _, t in inwin}), -len(inwin), p)
            )
        nt, nm, p = min(cand)
        snippet = " ".join(toks[p - 1: p - 1 + w])
        want[d] = (sc, p, -nt, -nm, snippet)
    got = {
        r["doc_id"]: (
            r["score"], r["win_start"], r["n_terms"], r["n_matches"],
            r["snippet"],
        )
        for r in window_snippets(spark, SF).collect()
    }
    assert got == want


def test_highlight_topk_match_python(spark):
    """Rendered-text snippets equal a regex-match-offset recomputation:
    the engines' seps/toks slice arithmetic must land on exactly the
    char spans re.finditer reports for the window's first and last
    tokens (separators and original casing preserved in the slice)."""
    texts = _texts(spark)
    terms, w, k = SNIPPET_TERMS, SNIPPET_W, 10
    scores = _py_doc_scores(texts, terms)
    top = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:k]
    pat = re.compile(r"[a-z0-9]+")
    want = {}
    for d, sc in top:
        lt = texts[d].lower()
        ms = list(pat.finditer(lt))
        toks = [m.group(0) for m in ms]
        matches = [(i + 1, t) for i, t in enumerate(toks) if t in terms]
        cand = []
        for p, _ in matches:
            inwin = [(q, t) for q, t in matches if p <= q < p + w]
            cand.append((-len({t for _, t in inwin}), -len(inwin), p))
        nt, nm, p = min(cand)
        e = min(p + w - 1, len(toks))
        src = texts[d] if len(lt) == len(texts[d]) else lt
        want[d] = (sc, p, -nt, -nm, src[ms[p - 1].start(): ms[e - 1].end()])
    got = {
        r["doc_id"]: (
            r["score"], r["win_start"], r["n_terms"], r["n_matches"],
            r["snippet"],
        )
        for r in highlight_topk(spark, SF).collect()
    }
    assert got == want


def test_dup_chunks_match_python(spark):
    """Duplicated-chunk detection equals a Python recomputation:
    canonical = smallest (doc_id, chunk_id) per repeated chunk text."""
    import hashlib
    from collections import defaultdict

    from searchengine_spark.ops.passages import dup_chunks

    texts = _texts(spark)
    by_fp = defaultdict(list)
    for d, text in texts.items():
        for c, win in _py_chunks(_tok(text)).items():
            fp = hashlib.md5(" ".join(win).encode()).hexdigest()
            by_fp[fp].append((d, c))
    want = {
        fp: (min(locs), len(locs))
        for fp, locs in by_fp.items() if len(locs) > 1
    }
    got = {
        r["fp"]: ((r["doc_id"], r["chunk_id"]), r["n_copies"])
        for r in dup_chunks(spark, SF).collect()
    }
    assert got == want
    assert want  # planted dups guarantee repeated chunks exist


def test_char_span_arithmetic_property():
    """Hypothesis: the DuckDB slice arithmetic the highlight oracle
    uses (shared via _char_span_exprs) lands on exactly re.finditer's
    char span for ANY k-th token of ANY printable-ascii string —
    leading/trailing separators, punctuation-only gaps, tokens at both
    boundaries."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchengine_spark.ops.passages import _char_span_exprs

    c_start, c_end = _char_span_exprs()
    con = duckdb.connect()
    q = f"""
        SELECT ({c_start})::BIGINT, ({c_end})::BIGINT FROM (
          SELECT regexp_extract_all(lower($t), '[a-z0-9]+') AS toks,
                 regexp_split_to_array(lower($t), '[a-z0-9]+') AS seps,
                 $k::BIGINT AS s, $e::BIGINT AS e)
    """

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        ),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=0, max_value=5),
    )
    def check(text, k, span):
        ms = list(re.finditer(r"[a-z0-9]+", text.lower()))
        if k > len(ms):
            return
        e = min(k + span, len(ms))
        got = con.execute(q, {"t": text, "k": k, "e": e}).fetchone()
        # 1-based inclusive char span of tokens k..e
        want = (ms[k - 1].start() + 1, ms[e - 1].end())
        assert got == want, (text, k, e, got, want)

    check()
