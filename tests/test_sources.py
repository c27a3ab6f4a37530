"""Source adapters (corpus/ingest.py): JSONL and CSV corpora must map
onto the exact corpus shape table_as_corpus defines — identical keys,
identical content-addressed commits — so the whole engine downstream
(dedup, docids, scoring) answers identically whatever the format."""

import csv
import json
import os

import pytest

from searchengine_spark.corpus.ingest import (
    csv_as_corpus,
    jsonl_as_corpus,
    table_as_corpus,
)

ROWS = [
    (1, "alpha beta gamma", "web", "en"),
    (2, "beta gamma delta epsilon", "web", "en"),
    (3, 'quoted "text" with, commas\nand a newline', "wiki", "de"),
    (4, "alpha beta gamma", "wiki", "en"),   # cross-source near-copy
]


@pytest.fixture(scope="module")
def src_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("sources")
    jp = str(d / "docs.jsonl")
    with open(jp, "w") as f:
        for i, t, s, lg in ROWS:
            f.write(json.dumps(
                {"id": i, "text": t, "site": s, "lang": lg}
            ) + "\n")
    cp = str(d / "docs.csv")
    with open(cp, "w", newline="") as f:
        w = csv.writer(f, quoting=csv.QUOTE_ALL)
        w.writerow(["id", "text", "site", "lang"])
        for i, t, s, lg in ROWS:
            w.writerow([i, t, s, lg])
    return jp, cp


def _canon(df):
    return sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in df.collect()
    )


def test_jsonl_and_csv_match_table_adapter(spark, src_paths):
    jp, cp = src_paths
    want_df = spark.createDataFrame(
        ROWS, "id long, text string, site string, lang string"
    )
    want = _canon(table_as_corpus(
        want_df, "id", "text", source_col="site", lang_col="lang"
    ))
    got_j = _canon(jsonl_as_corpus(
        spark, jp, source_col="site", lang_col="lang"
    ))
    got_c = _canon(csv_as_corpus(
        spark, cp, source_col="site", lang_col="lang"
    ))
    assert got_j == want
    assert got_c == want          # incl. the quoted/newline row
    # keys: path carries the id, commit is the content-addressed sha40
    paths = {p for _r, p, _c, _l, _t in want}
    assert paths == {f"doc/{i}" for i, *_ in ROWS}
    assert all(len(c) == 40 for _r, _p, c, _l, _t in want)


def test_adapted_corpus_builds_and_serves(spark, src_paths):
    """End-to-end through the engine: the JSONL corpus builds flat
    tables and answers a conjunctive query with the expected docs."""
    from searchengine_spark.index import build_tables
    from searchengine_spark.query.scoring import score_queries

    jp, _ = src_paths
    corpus = jsonl_as_corpus(spark, jp, source_col="site",
                             lang_col="lang")
    tables = build_tables(
        spark, corpus, compute_quality=False, stem=False,
        near_dup=False,
    )
    res = score_queries(
        spark, [(1, "beta gamma")], tables, k=10, stem=False
    ).collect()
    urls = {
        r["docid"]: r["url"]
        for r in tables.docs.select("docid", "url").collect()
    }
    hit_ids = {
        int(urls[r["docid"]].split("/doc/")[1].split("@")[0])
        for r in res
    }
    # doc 3 lacks both terms; doc 4 is an EXACT content duplicate of
    # doc 1 (different source), so sha256 dedup keeps only the lower
    # docid — format adapters feed the same dedup machinery
    assert hit_ids == {1, 2}
    surviving = {
        int(u.split("/doc/")[1].split("@")[0]) for u in urls.values()
    }
    assert 4 not in surviving and surviving == {1, 2, 3}
