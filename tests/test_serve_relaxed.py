"""Serving-tier query relaxation: LocalSearcher.relaxed_topk must be
rank- and score-identical to ops/search.relaxed_topk over the same
corpus (unstemmed flat index, docids translated through the stored
urls)."""

import re

import pytest

from searchengine_spark.corpus.ingest import documents_as_corpus
from searchengine_spark.index import build_tables
from searchengine_spark.index.shards import write_index
from searchengine_spark.ops.search import RELAX_K, RELAX_TERMS, relaxed_topk
from searchengine_spark.query.serve_local import LocalSearcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def flat_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("relax") / "idx")
    corpus = documents_as_corpus(spark, SF)
    write_index(
        spark,
        build_tables(
            spark, corpus, compute_quality=False, stem=False,
            near_dup=False,
        ),
        d,
    )
    return d


def test_serving_relaxed_matches_batch(spark, flat_index):
    ls = LocalSearcher(flat_index, stem=False)
    got = ls.relaxed_topk(" ".join(RELAX_TERMS), k=RELAX_K)
    assert len(got) == RELAX_K

    # translate serving docids -> the documents table's doc_id via the
    # stored urls ('<source>/doc/<doc_id>@<sha40>')
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(os.path.join(flat_index, "docs"),
                      columns=["docid", "url"])
    to_doc = {
        int(d): int(re.search(r"/doc/(\d+)@", u).group(1))
        for d, u in zip(t.column("docid").to_pylist(),
                        t.column("url").to_pylist())
    }

    batch = relaxed_topk(spark, SF).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in batch] == [
        (rank, to_doc[d], round(s, 6)) for rank, d, s in got
    ]
    # the fallback tier is exercised: batch rows 1..n_full are full
    n_full = sum(r["is_full"] for r in batch)
    assert 0 < n_full < RELAX_K
