"""PII detection/redaction (ops/scrub.py): pure-Python `re`
recomputation oracles (the patterns live in the Java/RE2/Python-
identical subset) plus the scrub invariants the driver's SQL value
compare can't state: the clean text has zero residual matches, the
clean branch is byte-identical to the input, and the summary is the
exact rollup of the per-doc counts.
"""

import hashlib
import re
from collections import Counter

import pytest

from searchengine_spark.ops.scrub import (
    PII_EMAIL_RE,
    PII_INJECT_MOD,
    PII_IP_RE,
    PII_NUM_RE,
    pii_counts,
    pii_scrub,
    pii_summary,
)

SF = "/root/testdata/sf0.001"

_E = re.compile(PII_EMAIL_RE)
_I = re.compile(PII_IP_RE)
_N = re.compile(PII_NUM_RE)


def _branch(doc_id):
    return ord(hashlib.md5(str(doc_id).encode()).hexdigest()[0]) % (
        PII_INJECT_MOD
    )


def _inject(doc_id, text):
    m = _branch(doc_id)
    if m == 0:
        return f"{text} contact user{doc_id}@example.com asap"
    if m == 1:
        return f"{text} seen from 10.{doc_id % 256}.0.{doc_id % 100} today"
    if m == 2:
        return f"{text} ref 4111111111{doc_id % 1000} end"
    return text


@pytest.fixture(scope="module")
def docs_pd(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .toPandas()
    )


def test_pii_counts_match_python(spark, docs_pd):
    got = {
        r["doc_id"]: (r["n_email"], r["n_ip"], r["n_num"])
        for r in pii_counts(spark, SF).collect()
    }
    expect = {}
    for _, r in docs_pd.iterrows():
        t = _inject(r["doc_id"], r["text"])
        expect[r["doc_id"]] = (
            len(_E.findall(t)), len(_I.findall(t)), len(_N.findall(t))
        )
    assert got == expect
    # the injection is non-vacuous AND the clean branch stays clean:
    # docs in branch 3 carry no natural PII in the synthetic corpus
    for _, r in docs_pd.iterrows():
        e, i, n = got[r["doc_id"]]
        if _branch(r["doc_id"]) == 3:
            assert (e, i, n) == (0, 0, 0)
        else:
            assert e + i + n >= 1


def test_pii_scrub_redacts_everything(spark, docs_pd):
    rows = {
        r["doc_id"]: (r["n_redactions"], r["clean_text"])
        for r in pii_scrub(spark, SF).collect()
    }
    for _, r in docs_pd.iterrows():
        t = _inject(r["doc_id"], r["text"])
        n_red, clean = rows[r["doc_id"]]
        # count on the PRE-scrub text
        assert n_red == (
            len(_E.findall(t)) + len(_I.findall(t)) + len(_N.findall(t))
        )
        # the pinned order EMAIL -> IP -> NUM, recomputed in Python
        want = _N.sub("<NUM>", _I.sub("<IP>", _E.sub("<EMAIL>", t)))
        assert clean == want
        # scrub completeness: nothing PII-shaped survives
        assert not _E.search(clean)
        assert not _I.search(clean)
        assert not _N.search(clean)
        # the clean branch is the identity
        if _branch(r["doc_id"]) == 3:
            assert clean == r["text"]


def test_pii_summary_is_the_exact_rollup(spark, docs_pd):
    got = {
        r["source"]: (
            r["n_docs"], r["docs_with_pii"],
            r["n_email"], r["n_ip"], r["n_num"],
        )
        for r in pii_summary(spark, SF).collect()
    }
    ndocs = Counter()
    dirty = Counter()
    e = Counter()
    i = Counter()
    n = Counter()
    for _, r in docs_pd.iterrows():
        t = _inject(r["doc_id"], r["text"])
        ce, ci, cn = len(_E.findall(t)), len(_I.findall(t)), len(_N.findall(t))
        ndocs[r["source"]] += 1
        dirty[r["source"]] += 1 if ce + ci + cn > 0 else 0
        e[r["source"]] += ce
        i[r["source"]] += ci
        n[r["source"]] += cn
    expect = {
        s: (ndocs[s], dirty[s], e[s], i[s], n[s]) for s in ndocs
    }
    assert got == expect
    # the report is useful: every feed has dirty docs, and the corpus
    # has clean ones (a small feed may have no clean-branch docs)
    assert all(dw > 0 for _, dw, *_rest in got.values())
    assert sum(dw for _, dw, *_r in got.values()) < sum(
        nd for nd, *_r in got.values()
    )
