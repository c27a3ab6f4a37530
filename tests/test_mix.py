"""Curation/mixing ops (ops/mix.py): pure-Python recomputation oracles
plus the determinism/composition properties the driver's SQL compare
can't see (value-level Spark-vs-DuckDB runs in the driver contract).
"""

import hashlib
import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.mix import (
    DECON_EVAL_MOD,
    DECON_NGRAM,
    SAMPLE_RATES,
    _rate_threshold_hex,
    corpus_mixture,
    decontaminate,
    stratified_sample,
    unigram_logprob,
)

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[a-z0-9]+")


@pytest.fixture(scope="module")
def docs_pd(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "text")
        .toPandas()
    )


def _shingles(text, n):
    toks = _TOK.findall(text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_decontaminate_matches_python(spark, docs_pd):
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate(spark, SF).collect()
    }
    ev = set()
    for _, r in docs_pd.iterrows():
        if r["doc_id"] % DECON_EVAL_MOD == 0:
            ev |= _shingles(r["text"], DECON_NGRAM)
    expect = {}
    for _, r in docs_pd.iterrows():
        if r["doc_id"] % DECON_EVAL_MOD == 0:
            continue
        k = len(_shingles(r["text"], DECON_NGRAM) & ev)
        if k:
            expect[r["doc_id"]] = k
    assert got == expect
    assert expect, "fixture must exercise a non-empty contamination set"


def test_stratified_sample_matches_python_and_is_monotone(spark, docs_pd):
    got = {
        r["doc_id"]: (r["lang"], r["sample_key"])
        for r in stratified_sample(spark, SF).collect()
    }
    expect = {}
    for _, r in docs_pd.iterrows():
        rate = SAMPLE_RATES.get(r["lang"])
        if rate is None:
            continue
        key = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        thr = _rate_threshold_hex(rate)
        if thr and key <= thr:
            expect[r["doc_id"]] = (r["lang"], key)
    assert got == expect

    # monotone composition: halving every rate yields a subset
    halved = {lang: rate / 2 for lang, rate in SAMPLE_RATES.items()}
    small = {
        r["doc_id"] for r in stratified_sample(spark, SF, rates=halved).collect()
    }
    assert small <= set(got)

    # rate 0 drops the language entirely; absent langs are dropped
    none_en = dict(SAMPLE_RATES, en=0.0)
    out = stratified_sample(spark, SF, rates=none_en)
    assert out.filter(F.col("lang") == "en").count() == 0


def test_corpus_mixture_matches_python(spark, docs_pd):
    rows = {r["lang"]: r for r in corpus_mixture(spark, SF).collect()}
    counts = Counter()
    toks = Counter()
    for _, r in docs_pd.iterrows():
        counts[r["lang"]] += 1
        toks[r["lang"]] += len(_TOK.findall(r["text"].lower()))
    total = sum(toks.values())
    nl = len(counts)
    assert set(rows) == set(counts)
    for lang, r in rows.items():
        assert r["n_docs"] == counts[lang]
        assert r["n_tokens"] == toks[lang]
        assert r["token_share"] == round(toks[lang] / total, 6)
        assert r["epochs"] == round((1.0 / nl) / (toks[lang] / total), 6)
    # the mixture identity: share · epochs = target share for every lang
    for r in rows.values():
        assert abs(r["token_share"] * r["epochs"] - 1.0 / nl) < 1e-4


def test_temperature_mixture_matches_python(spark, docs_pd):
    """alpha-sampling recomputed in Python with the exact fold order
    (lang-sorted sequential sum), plus the semantic properties: weights
    form a flatter distribution than shares, rates normalize to max 1,
    and the highest-share language is the most downsampled."""
    from searchengine_spark.ops.mix import (
        MIX_TEMP_ALPHA,
        temperature_mixture,
    )

    rows = {
        r["lang"]: r for r in temperature_mixture(spark, SF).collect()
    }
    toks = Counter()
    for _, r in docs_pd.iterrows():
        toks[r["lang"]] += len(_TOK.findall(r["text"].lower()))
    total = float(sum(toks.values()))
    share = {lang: n / total for lang, n in toks.items()}
    p = {lang: math.pow(s, MIX_TEMP_ALPHA) for lang, s in share.items()}
    sump = 0.0
    for lang in sorted(p):           # the pinned sequential fold order
        sump += p[lang]
    weight = {lang: v / sump for lang, v in p.items()}
    boost = {lang: weight[lang] / share[lang] for lang in share}
    mx = max(boost.values())

    assert set(rows) == set(toks)
    for lang, r in rows.items():
        assert r["n_tokens"] == toks[lang]
        assert r["share"] == round(share[lang], 6)
        assert r["weight"] == round(weight[lang], 6)
        assert r["rate"] == round(boost[lang] / mx, 6)
    assert max(r["rate"] for r in rows.values()) == 1.0
    # temperature flattening: weights are strictly between share and
    # uniform for every non-uniform language
    nl = len(rows)
    for lang, r in rows.items():
        if abs(share[lang] - 1.0 / nl) > 1e-9:
            lo, hi = sorted((share[lang], 1.0 / nl))
            assert lo < weight[lang] < hi
    top = max(share, key=share.get)
    assert rows[top]["rate"] == min(r["rate"] for r in rows.values())


def test_temperature_sample_matches_python(spark, docs_pd):
    """The composed application: rates recomputed as in the mixture
    test, threshold = lpad(hex(floor(rate·2^32))), keep iff rate >= 1
    or md5-prefix < threshold — recomputed doc-by-doc in Python; the
    most-boosted language keeps every doc."""
    from searchengine_spark.ops.mix import (
        MIX_TEMP_ALPHA,
        temperature_sample,
    )

    toks = Counter()
    for _, r in docs_pd.iterrows():
        toks[r["lang"]] += len(_TOK.findall(r["text"].lower()))
    total = float(sum(toks.values()))
    share = {lang: n / total for lang, n in toks.items()}
    p = {lang: math.pow(s, MIX_TEMP_ALPHA) for lang, s in share.items()}
    sump = 0.0
    for lang in sorted(p):
        sump += p[lang]
    boost = {lang: (p[lang] / sump) / share[lang] for lang in share}
    mx = max(boost.values())
    rate = {lang: round(b / mx, 6) for lang, b in boost.items()}

    def keeps(doc_id, lang):
        if rate[lang] >= 1.0:
            return True
        thr = format(int(rate[lang] * 4294967296.0), "x").rjust(8, "0")
        key = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        return key < thr

    want = {
        int(r["doc_id"])
        for _, r in docs_pd.iterrows()
        if keeps(r["doc_id"], r["lang"])
    }
    got = {
        int(r["doc_id"])
        for r in temperature_sample(spark, SF).collect()
    }
    assert got == want
    top = max(rate, key=rate.get)
    n_top = sum(1 for _, r in docs_pd.iterrows() if r["lang"] == top)
    kept_top = sum(
        1 for _, r in docs_pd.iterrows()
        if r["lang"] == top and int(r["doc_id"]) in got
    )
    assert kept_top == n_top      # rate 1.0 keeps everything
    assert len(got) < len(docs_pd)  # some language was downsampled


def test_unigram_logprob_matches_python(spark, docs_pd):
    got = {
        r["doc_id"]: (r["n_tokens"], r["nll"])
        for r in unigram_logprob(spark, SF).collect()
    }
    tfs = {
        r["doc_id"]: Counter(_TOK.findall(r["text"].lower()))
        for _, r in docs_pd.iterrows()
    }
    cf = Counter()
    for c in tfs.values():
        cf.update(c)
    total = sum(cf.values())
    for doc_id, c in tfs.items():
        n = sum(c.values())
        nll = -sum(tf * math.log(cf[t] / total) for t, tf in c.items()) / n
        assert got[doc_id][0] == n
        assert abs(got[doc_id][1] - round(nll, 6)) <= 1e-6


def test_corpus_split_matches_python_and_is_stable(spark, docs_pd):
    from searchengine_spark.ops.mix import SPLIT_FRACS, corpus_split

    got = {
        r["doc_id"]: (r["split"], r["split_key"])
        for r in corpus_split(spark, SF).collect()
    }
    thr_test = _rate_threshold_hex(SPLIT_FRACS["test"])
    thr_val = _rate_threshold_hex(SPLIT_FRACS["test"] + SPLIT_FRACS["val"])
    expect = {}
    for _, r in docs_pd.iterrows():
        key = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        split = (
            "test" if key <= thr_test
            else "val" if key <= thr_val
            else "train"
        )
        expect[r["doc_id"]] = (split, key)
    assert got == expect
    assert len(got) == len(docs_pd)  # total: every doc gets a split
    assert {s for s, _ in got.values()} == {"train", "val", "test"}

    # cumulative thresholds: growing val NEVER moves a doc between
    # test and train — the test set is a stable prefix
    grown = corpus_split(
        spark, SF,
        fracs={"test": SPLIT_FRACS["test"], "val": SPLIT_FRACS["val"] * 2},
    )
    grown_m = {r["doc_id"]: r["split"] for r in grown.collect()}
    for doc_id, (split, _) in got.items():
        if split == "test":
            assert grown_m[doc_id] == "test"
        elif split == "val":
            assert grown_m[doc_id] == "val"
        else:
            assert grown_m[doc_id] in ("val", "train")


def test_bigram_logprob_matches_python(spark, docs_pd):
    from searchengine_spark.ops.mix import BIGRAM_LAMBDA, bigram_logprob

    got = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in bigram_logprob(spark, SF).collect()
    }
    seqs = {
        r["doc_id"]: _TOK.findall(r["text"].lower())
        for _, r in docs_pd.iterrows()
    }
    c2 = Counter()
    cu = Counter()
    for toks in seqs.values():
        cu.update(toks)
        c2.update(zip(toks, toks[1:]))
    c1 = Counter()
    for (a, _b), n in c2.items():
        c1[a] += n
    total = sum(cu.values())
    lam = BIGRAM_LAMBDA
    expect_ids = {d for d, toks in seqs.items() if len(toks) >= 2}
    assert set(got) == expect_ids
    for doc_id in expect_ids:
        toks = seqs[doc_id]
        ps = [
            lam * c2[(a, b)] / c1[a] + (1.0 - lam) * cu[b] / total
            for a, b in zip(toks, toks[1:])
        ]
        nll = -sum(math.log(p) for p in ps) / len(ps)
        assert got[doc_id][0] == len(ps)
        assert abs(got[doc_id][1] - round(nll, 6)) <= 1e-6
    # order sensitivity: the bigram LM sees implausible order that the
    # unigram proxy cannot — a reversed doc keeps its unigram nll but
    # (generically) changes its bigram nll.  Verified structurally:
    # some doc's reversed bigram set differs from its forward set.
    some = next(d for d in expect_ids if len(seqs[d]) >= 10)
    fwd = set(zip(seqs[some], seqs[some][1:]))
    rev = set(zip(seqs[some][::-1], seqs[some][::-1][1:]))
    assert fwd != rev


def test_collocations_match_python(spark, docs_pd):
    """Adjacent-bigram PMI vs a Counter recompute: marginals and
    Npairs over the FULL pair stream, min_count floors candidates
    only, pmi = ln(c2·N/(cl·cr)) rounded 6, rank (pmi desc, lhs, rhs).
    """
    from searchengine_spark.ops.mix import (
        COLLOC_MIN_COUNT,
        COLLOC_TOPN,
        collocations,
    )

    got = [
        (r["lhs"], r["rhs"], r["n"], r["pmi"])
        for r in collocations(spark, SF).collect()
    ]
    c2 = Counter()
    for _, row in docs_pd.iterrows():
        toks = _TOK.findall(row["text"].lower())
        c2.update(zip(toks, toks[1:]))
    cl = Counter()
    cr = Counter()
    for (a, b), n in c2.items():
        cl[a] += n
        cr[b] += n
    npairs = float(sum(c2.values()))
    cand = [
        (a, b, n, round(math.log(n * npairs / (cl[a] * cr[b])), 6))
        for (a, b), n in c2.items()
        if n >= COLLOC_MIN_COUNT
    ]
    cand.sort(key=lambda x: (-x[3], x[0], x[1]))
    want = cand[:COLLOC_TOPN]
    assert [(a, b, n) for a, b, n, _ in got] == [
        (a, b, n) for a, b, n, _ in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) <= 1e-6, (g, w)
    # a collocation by construction: high-PMI pairs beat a frequent
    # pair of independently common tokens (sanity of the signal, not
    # of exact values)
    assert all(n >= COLLOC_MIN_COUNT for _, _, n, _ in got)


def test_source_caps_match_python_and_are_monotone(spark):
    """Per-source contribution caps vs a Python recompute of the hash
    rank, plus the curation properties: every source is capped, the
    kept set is a prefix of the per-source hash order (so halving the
    cap yields a subset with identical ranks)."""
    from searchengine_spark.ops.mix import SOURCE_CAP, source_caps

    src_pd = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .toPandas()
    )
    got = {
        r["doc_id"]: (r["source"], r["src_rank"])
        for r in source_caps(spark, SF).collect()
    }
    by_src = {}
    for _, r in src_pd.iterrows():
        key = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
        by_src.setdefault(r["source"], []).append((key, r["doc_id"]))
    expect = {}
    for src, rows in by_src.items():
        rows.sort()
        for rank, (_, d) in enumerate(rows, start=1):
            if rank <= SOURCE_CAP:
                expect[d] = (src, rank)
    assert got == expect
    # non-vacuous: some source actually hit its cap on this fixture
    full = [s for s, rows in by_src.items() if len(rows) > SOURCE_CAP]
    assert full, "fixture must have a source exceeding the cap"
    counts = Counter(s for s, _ in got.values())
    assert all(n <= SOURCE_CAP for n in counts.values())
    for s in full:
        assert counts[s] == SOURCE_CAP

    # monotone: halving the cap keeps a prefix with unchanged ranks
    half = {
        r["doc_id"]: (r["source"], r["src_rank"])
        for r in source_caps(spark, SF, cap=SOURCE_CAP // 2).collect()
    }
    assert set(half) <= set(got)
    for d, v in half.items():
        assert got[d] == v


def test_training_shuffle_is_a_seeded_permutation(spark):
    """Epoch shuffle vs a Python recompute of the seeded-hash order,
    plus the training-loader properties: pos is exactly 1..N, the
    order is partition-count invariant, and a different seed yields a
    genuinely different permutation."""
    from searchengine_spark.ops.mix import training_shuffle

    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    got = {
        r["doc_id"]: (r["shuffle_key"], r["pos"])
        for r in training_shuffle(spark, SF).collect()
    }
    keyed = sorted(
        (hashlib.md5(f"ep0:{d}".encode()).hexdigest(), d) for d in ids
    )
    expect = {
        d: (k, pos) for pos, (k, d) in enumerate(keyed, start=1)
    }
    assert got == expect
    assert sorted(p for _, p in got.values()) == list(
        range(1, len(ids) + 1)
    )

    # partition-count invariance: the rank must not depend on layout
    docs8 = (
        spark.read.parquet(f"{SF}/documents.parquet").repartition(8)
    )
    docs8.createOrReplaceTempView("_ts_docs8")
    from searchengine_spark.ops import mix as _mix

    orig = _mix.documents
    try:
        _mix.documents = lambda sp, sf: sp.table("_ts_docs8")
        again = {
            r["doc_id"]: (r["shuffle_key"], r["pos"])
            for r in training_shuffle(spark, SF).collect()
        }
    finally:
        _mix.documents = orig
    assert again == got

    # a fresh epoch seed permutes: at least one doc moves position
    ep1 = {
        r["doc_id"]: r["pos"]
        for r in training_shuffle(spark, SF, seed="ep1").collect()
    }
    assert any(ep1[d] != got[d][1] for d in ep1)


def test_perplexity_buckets_match_python(spark, docs_pd):
    """CCNet terciles vs a sequential recompute: per-lang rank over
    (rounded nll, doc_id) cut by the exact SQL-ntile size rule (the
    first n % k buckets take one extra row)."""
    from searchengine_spark.ops.mix import (
        BIGRAM_LAMBDA,
        PPL_BUCKETS,
        perplexity_buckets,
    )

    got = [
        (r["doc_id"], r["lang"], r["nll"], r["bucket"])
        for r in perplexity_buckets(spark, SF).collect()
    ]
    seqs = {
        r["doc_id"]: (r["lang"], _TOK.findall(r["text"].lower()))
        for _, r in docs_pd.iterrows()
    }
    c2 = Counter()
    cu = Counter()
    for _, toks in seqs.values():
        cu.update(toks)
        c2.update(zip(toks, toks[1:]))
    c1 = Counter()
    for (a, _b), n in c2.items():
        c1[a] += n
    total = sum(cu.values())
    lam = BIGRAM_LAMBDA
    nlls = {}
    for d, (lg, toks) in seqs.items():
        if len(toks) < 2:
            continue
        ps = [
            lam * c2[(a, b)] / c1[a] + (1.0 - lam) * cu[b] / total
            for a, b in zip(toks, toks[1:])
        ]
        nlls[d] = (lg, round(-sum(math.log(p) for p in ps) / len(ps), 6))
    by_lang = {}
    for d, (lg, nll) in nlls.items():
        by_lang.setdefault(lg, []).append((nll, d))
    want = {}
    for lg, rows in by_lang.items():
        rows.sort()
        n, k = len(rows), PPL_BUCKETS
        base, rem = divmod(n, k)
        for i, (nll, d) in enumerate(rows, start=1):
            if i <= (base + 1) * rem:
                b = math.ceil(i / (base + 1))
            else:
                b = rem + math.ceil((i - (base + 1) * rem) / base)
            want[d] = (lg, nll, b)
    assert {d: (lg, b) for d, lg, _, b in got} == {
        d: (lg, b) for d, (lg, _, b) in want.items()
    }
    for d, lg, nll, b in got:
        assert abs(nll - want[d][1]) <= 1e-6
    # every lang fills every bucket on this fixture (non-vacuous cut)
    langs = {lg for _, lg, _, _ in got}
    for lg in langs:
        assert {b for _, l2, _, b in got if l2 == lg} == set(
            range(1, PPL_BUCKETS + 1)
        )


def test_kmv_distinct_matches_python(spark, docs_pd):
    """KMV sketch equals a hashlib recomputation: k-th smallest DISTINCT
    32-bit md5-prefix hash of the per-lang bigram set, estimate
    (k-1)*2^32/kth round-6; n_exact is the true distinct-bigram count.
    Also pins that the estimate lands within 3 standard errors
    (~k^-0.5) of truth — the sketch must actually estimate."""
    from searchengine_spark.ops.mix import KMV_K, kmv_distinct

    pairs = set()
    for r in docs_pd.itertuples():
        toks = _TOK.findall(r.text.lower())
        for a, b in zip(toks, toks[1:]):
            pairs.add((r.lang, a, b))
    langs = sorted({p[0] for p in pairs})
    want = {}
    for lang in langs:
        mine = [(a, b) for (lg, a, b) in pairs if lg == lang]
        hs = sorted({
            int(hashlib.md5(f"{lang}:{a}:{b}".encode()).hexdigest()[:8], 16)
            for a, b in mine
        })
        kth = hs[KMV_K - 1]
        want[lang] = (
            len(mine), kth, round((KMV_K - 1) * 4294967296.0 / kth, 6),
        )
    got = {
        r["lang"]: (r["n_exact"], r["kth"], r["n_est"])
        for r in kmv_distinct(spark, SF).collect()
    }
    assert got == want
    for lang, (n_exact, _, n_est) in want.items():
        assert abs(n_est - n_exact) / n_exact < 3.0 / math.sqrt(KMV_K)


def test_weighted_sample_matches_python(spark, docs_pd):
    """Derandomized A-ES sample equals a hashlib/math recomputation
    (rank desc over round-6 ln(u)/w, doc_id tie-break), and the sample
    is actually weight-biased: mean sampled doc length exceeds the
    corpus mean (prop-to-size must oversample long docs)."""
    from searchengine_spark.ops.mix import WS_N, weighted_sample

    rows = []
    for r in docs_pd.itertuples():
        w = len(r.text)  # n_chars column equals len(text) in testdata
        u32 = int(
            hashlib.md5(f"ws:{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        skey = round(math.log((u32 + 1) / 4294967296.0) / w, 6)
        rows.append((r.doc_id, w, skey))
    rows.sort(key=lambda t: (-t[2], t[0]))
    want = [
        (d, w, sk, i + 1) for i, (d, w, sk) in enumerate(rows[:WS_N])
    ]
    got = [
        (r["doc_id"], r["w"], r["skey"], r["pos"])
        for r in weighted_sample(spark, SF).collect()
    ]
    assert got == want
    mean_all = sum(w for _, w, _ in rows) / len(rows)
    mean_smp = sum(w for _, w, _, _ in want) / len(want)
    assert mean_smp > mean_all


def test_kmv_u32_sql_property():
    """Hypothesis: the shared digit-arithmetic SQL snippet equals
    int(md5(s)[:8], 16) for arbitrary strings (incl. non-ascii —
    both engines hash the utf-8 bytes)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from searchengine_spark.ops.mix import kmv_u32_sql

    con = duckdb.connect()
    q = f"SELECT {kmv_u32_sql('s')} FROM (SELECT $s::VARCHAR AS s)"

    @settings(max_examples=150, deadline=None)
    @given(st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
        max_size=30,
    ))
    def check(sval):
        got = con.execute(q, {"s": sval}).fetchone()[0]
        want = int(
            hashlib.md5(sval.encode("utf-8")).hexdigest()[:8], 16
        )
        assert got == want, (sval, got, want)

    check()


def test_cms_heavy_hitters_planted_collisions(spark, tmp_path):
    """CMS semantics on a planted corpus with a TINY sketch (w=4, so
    collisions are forced): estimates equal a hashlib recomputation of
    the same d x w counter array, n_est >= n_exact everywhere
    (one-sided error), selection is by ESTIMATE (a light term inflated
    by collisions may surface — no false negatives by construction),
    and at least one surfaced term carries a nonzero collision err."""
    import pandas as pd

    from searchengine_spark.ops.mix import cms_heavy_hitters

    # 6 distinct terms with skewed counts; w=4 forces bucket sharing
    words = {"alpha": 30, "beta": 20, "gamma": 6, "delta": 5,
             "eps": 2, "zeta": 1}
    text = " ".join(" ".join([w] * n) for w, n in words.items())
    pdf = pd.DataFrame(
        [{"doc_id": 1, "text": text, "lang": "en", "source": "s",
          "n_chars": len(text)}]
    )
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    d, w, phi_den = 2, 2, 8   # threshold = ceil(64/8) = 8
    got = {
        r["term"]: (r["n_est"], r["n_exact"], r["err"])
        for r in cms_heavy_hitters(
            spark, str(tmp_path), d=d, w=w, phi_den=phi_den
        ).collect()
    }

    # pure-Python recomputation of the identical sketch
    counters = [[0] * w for _ in range(d)]
    def bucket(r, t):
        return int(
            hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16
        ) % w
    for t, n in words.items():
        for r in range(d):
            counters[r][bucket(r, t)] += n
    total = sum(words.values())
    thr = -(-total // phi_den)
    want = {}
    for t, n in words.items():
        est = min(counters[r][bucket(r, t)] for r in range(d))
        assert est >= n                      # one-sided error
        if est >= thr:
            want[t] = (est, n, est - n)
    assert got == want
    assert set(words) & set(got)             # nonempty selection
    assert any(err > 0 for _, _, err in got.values()), (
        "w=4 over 6 terms must produce at least one collision"
    )


def test_contamination_report_matches_python(spark, docs_pd):
    """Eval-side contamination audit: per compromised eval doc, the
    (distinct train docs, leaked shingles, total shingles, fraction)
    tuple must equal a brute-force python recomputation (the cap is a
    no-op at this corpus size, same as decontaminate's test)."""
    from searchengine_spark.ops.mix import contamination_report

    got = {
        r["doc_id"]: (r["n_train_docs"], r["n_leaked"],
                      r["n_shingles"], r["leak_frac"])
        for r in contamination_report(spark, SF).collect()
    }
    ev_sh = {}
    tr_sh = {}
    for _, r in docs_pd.iterrows():
        s = _shingles(r["text"], DECON_NGRAM)
        if r["doc_id"] % DECON_EVAL_MOD == 0:
            if s:
                ev_sh[r["doc_id"]] = s
        elif s:
            tr_sh[r["doc_id"]] = s
    expect = {}
    for ed, es in ev_sh.items():
        tdocs = {td for td, ts in tr_sh.items() if es & ts}
        leaked = {sh for ts in tr_sh.values() for sh in (es & ts)}
        if tdocs:
            expect[ed] = (
                len(tdocs), len(leaked), len(es),
                round(len(leaked) / len(es), 6),
            )
    assert got == expect
    assert expect, "fixture must exercise a non-empty report"


def test_decon_cap_has_no_broadcast_hint(spark):
    """The hot-shingle cap must ride a keyed-aggregate equi-join, not
    a hard-coded broadcast of the >cap set (at a 10^9-doc train side
    that set is unbounded — VERDICT r4 #8).  AQE may still broadcast
    adaptively at runtime; what the plan must NOT carry is the
    explicit hint."""
    from searchengine_spark.ops.mix import (
        contamination_report,
        decontaminate,
    )

    for df in (decontaminate(spark, SF), contamination_report(spark, SF)):
        analyzed = df._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, analyzed[:2000]
        assert "UnresolvedHint" not in analyzed, analyzed[:2000]
