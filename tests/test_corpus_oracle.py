"""Corpus synthesizer + oracle behavior tests (FIXTURES.md planted cases)."""

import hashlib

from searchengine_spark.corpus import QUERIES, synth_corpus
from searchengine_spark.oracle import build_oracle


def test_corpus_deterministic(corpus_rows):
    again = synth_corpus(len(corpus_rows))
    assert corpus_rows == again


def test_planted_cases(corpus_rows):
    # whitespace-only docs
    for i in range(20, 25):
        assert corpus_rows[i]["content"].strip() == ""
    # exact duplicates
    for a, b in [(30, 31), (32, 33), (34, 35), (36, 37), (38, 39)]:
        assert corpus_rows[a]["content"] == corpus_rows[b]["content"]
        assert (corpus_rows[a]["repo"], corpus_rows[a]["path"]) != (
            corpus_rows[b]["repo"],
            corpus_rows[b]["path"],
        )
    # code literal fixture
    assert 'print("Hello world!")' in corpus_rows[65]["content"]
    # rare term
    assert "mondego" in corpus_rows[60]["content"]


def test_oracle_filters(oracle, corpus_rows):
    n = len(corpus_rows)
    assert oracle.n_total == n
    # at least 15 docs dropped (5 empty + 5 exact + >=5 near-dup)
    assert oracle.n_survivors <= n - 15
    assert len(oracle.postings) > 1000
    assert oracle.avgdl > 0


def test_oracle_abort_query(oracle):
    # unknown-majority query must abort (lib/queryproc.py:219)
    assert oracle.process_query("zzzqx vvkwq qqqpt parser") == []


def test_oracle_empty_inputs(oracle):
    assert oracle.process_query("") == []
    assert oracle.process_query("!!! ...") == []


def test_oracle_queries_nonempty(oracle):
    for qid, q in QUERIES:
        res = oracle.process_query(q)
        if qid == 3:
            assert res == []
        else:
            assert len(res) > 0, (qid, q)
            # ranked descending, ties by docid
            scores = [s for _, s in res]
            assert scores == sorted(scores, reverse=True)


def test_oracle_link_fixtures(oracle):
    # hub doc (synth index 10) has many out-edges; authority (11) many in
    hub = _docid_for(oracle, 10)
    auth = _docid_for(oracle, 11)
    outs = sum(1 for s, t in oracle.edges if s == hub)
    ins = sum(1 for s, t in oracle.edges if t == auth)
    assert outs >= 10
    assert ins >= 10


def _docid_for(oracle, synth_index):
    """Find the oracle docid whose path is f{synth_index}.*"""
    for d, info in oracle.docs.items():
        if info["path"].split("/")[-1].split(".")[0] == f"f{synth_index}":
            return d
    raise AssertionError(f"doc {synth_index} not found among survivors")


def test_sha256_invariant_python(corpus_rows):
    # input_hint per-row invariant at the python layer
    for r in corpus_rows[:50]:
        expect = hashlib.sha256(r["content"].encode("utf-8")).hexdigest()
        assert len(expect) == 64
