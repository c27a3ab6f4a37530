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


def test_warc_parse_roundtrip_and_tolerance():
    """Pure parser properties: encode → parse is the identity for
    every payload (including CRLFCRLF-bearing bytes — Content-Length
    is authoritative); garbage between records is skipped; a record
    whose declared length overruns the chunk drops (truncated tail);
    chunk synthesis is byte-deterministic."""
    from searchengine_spark.corpus.warc import (
        encode_warc_record,
        parse_warc_bytes,
        write_warc_dir,
    )

    payloads = [
        b"plain ascii",
        b"",                                   # empty body
        b"embedded \r\n\r\n WARC/1.0\r\n x",   # parser traps inside
        "unicode é中".encode(),
    ]
    recs = [
        encode_warc_record(f"http://h/p{i}", p)
        for i, p in enumerate(payloads)
    ]
    blob = b"leading garbage\r\n" + recs[0] + b"junk" + recs[1]
    blob += recs[2] + recs[3]
    got = list(parse_warc_bytes(blob))
    assert [p for _h, p in got] == payloads
    assert [h["WARC-Target-URI"] for h, _p in got] == [
        f"http://h/p{i}" for i in range(4)
    ]
    assert all(h["WARC-Type"] == "response" for h, _p in got)
    # truncated tail: cut the last record mid-payload
    cut = blob[:-(len(payloads[3]) // 2 + 4)]
    assert [p for _h, p in parse_warc_bytes(cut)] == payloads[:3]

    import tempfile

    rows = [(f"http://h/p{i}", p) for i, p in enumerate(payloads)]
    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2:
        write_warc_dir(rows, d1, n_files=2)
        write_warc_dir(list(reversed(rows)), d2, n_files=2)
        for f in sorted(os.listdir(d1)):
            with open(os.path.join(d1, f), "rb") as a, \
                    open(os.path.join(d2, f), "rb") as b:
                assert a.read() == b.read()  # row-order invariant


def test_warc_adapter_feeds_the_corpus_shape(spark, tmp_path_factory):
    """read_warc parses multi-chunk dirs executor-side (plan is scan →
    mapInPandas, no shuffle) and warc_as_corpus lands on the exact
    corpus shape with non-response records dropped."""
    from searchengine_spark.corpus.warc import (
        encode_warc_record,
        read_warc,
        warc_as_corpus,
        write_warc_dir,
    )

    d = str(tmp_path_factory.mktemp("warc"))
    rows = [
        (f"http://site{i % 3}.example/page/{i}",
         f"alpha beta doc {i} gamma".encode())
        for i in range(20)
    ]
    write_warc_dir(rows, d, n_files=3)
    # splice a non-response record into one chunk
    with open(os.path.join(d, "chunk-00000.warc"), "ab") as f:
        f.write(encode_warc_record(
            "http://site0.example/robots.txt", b"ignored",
            rec_type="request",
        ))

    recs = read_warc(spark, os.path.join(d, "*.warc"))
    plan = recs._jdf.queryExecution().toString().lower()
    assert "exchange" not in plan  # scan → parse, shuffle-free
    got = {
        r["url"]: (r["rec_type"], r["n_bytes"], bytes(r["payload"]))
        for r in recs.collect()
    }
    assert len(got) == len(rows) + 1
    for url, payload in rows:
        assert got[url] == ("response", len(payload), payload)
    assert got["http://site0.example/robots.txt"][0] == "request"
    assert {r["warc_file"] for r in recs.collect()} == {
        f"chunk-{i:05d}.warc" for i in range(3)
    }

    corpus = warc_as_corpus(spark, os.path.join(d, "*.warc"))
    canon = _canon(corpus)
    assert len(canon) == len(rows)  # the request record dropped
    for repo, path, commit, lang, content in canon:
        assert repo.startswith("site") and repo.endswith(".example")
        assert path.startswith("/page/")
        assert len(commit) == 40 and lang == ""
    assert {c for _r, _p, _c, _l, c in canon} == {
        p.decode() for _u, p in rows
    }


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
