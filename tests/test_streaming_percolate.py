"""Streaming percolator (streaming/percolate.py): alerts across
micro-batches must equal the batch operator (ops/search.percolate)
over the same documents, and an availableNow restart with no new
files must append nothing (exactly-once per input file).
"""

import os

import pyarrow.parquet as pq
import pytest

from searchengine_spark.ops.search import percolate
from searchengine_spark.streaming.percolate import percolate_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


def _write_chunks(dirpath, table, n_chunks):
    os.makedirs(dirpath, exist_ok=True)
    n = table.num_rows
    step = (n + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        pq.write_table(
            table.slice(i * step, step),
            os.path.join(dirpath, f"chunk{i}.parquet"),
        )


def test_stream_alerts_match_batch_percolate(spark, docs_table, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs_table, 3)

    percolate_stream(spark, src, out, ckpt)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = [
        (r["qid"], r["doc_id"]) for r in percolate(spark, SF).collect()
    ]
    assert got == want
    assert got, "fixture must fire at least one alert"
    # every standing query alerted at least once at this corpus size
    assert len({q for q, _ in got}) == 5

    # replay safety: a restart with no new files appends nothing
    percolate_stream(spark, src, out, ckpt)
    again = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got

    # a late-arriving chunk alerts incrementally (only the new doc)
    extra = docs_table.slice(0, 1).to_pylist()[0]
    late_id = max(d for _, d in got) + 10_000
    import pyarrow as pa

    late = pa.Table.from_pylist([{**extra, "doc_id": late_id}])
    pq.write_table(late, os.path.join(src, "late.parquet"))
    percolate_stream(spark, src, out, ckpt)
    final = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    new_rows = sorted(set(final) - set(got))
    base_doc = extra["doc_id"]
    assert new_rows == sorted(
        (q, late_id) for q, d in got if d == base_doc
    )


def test_rich_stream_alerts_match_batch(spark, docs_table, tmp_path):
    """The rich gate (bare/phrase/-not) equals ops/search.
    percolate_rich over the same docs, and replays append nothing."""
    from searchengine_spark.ops.search import percolate_rich
    from searchengine_spark.streaming.percolate import (
        percolate_rich_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs_table, 3)

    percolate_rich_stream(spark, src, out, ckpt)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = [
        (r["qid"], r["doc_id"])
        for r in percolate_rich(spark, SF).collect()
    ]
    assert got == want
    assert len({q for q, _ in got}) == 5  # every rich query fires

    percolate_rich_stream(spark, src, out, ckpt)
    again = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got


def test_inverted_query_index_scale_shape():
    """The ES-percolator design contract: at 10^4 standing queries,
    matching one doc (a) returns EXACTLY what the naive all-queries
    containment loop returns, and (b) touches only the posting
    entries of the doc's own terms — work proportional to matched
    terms, not |queries|."""
    import random

    from searchengine_spark.streaming.percolate import (
        InvertedQueryIndex,
    )

    rng = random.Random(7)
    nq = 10_000
    # mostly-rare vocabulary: each query draws 2-4 terms from a wide
    # term space, plus a planted cluster sharing the probe doc's terms
    queries = [
        tuple(
            f"t{rng.randrange(50_000)}"
            for _ in range(rng.randrange(2, 5))
        )
        for _ in range(nq - 20)
    ]
    doc_toks = [f"probe{i}" for i in range(12)]
    for i in range(20):  # planted: 10 full subsets (alert), 10 partial
        if i < 10:
            queries.append(tuple(rng.sample(doc_toks, 3)))
        else:
            queries.append(tuple(rng.sample(doc_toks, 2)) + ("zmiss",))
    idx = InvertedQueryIndex(queries)

    naive = [
        qi for qi, q in enumerate(queries)
        if frozenset(q) <= set(doc_toks)
    ]
    assert sorted(idx.match(doc_toks)) == naive
    assert len(naive) == 10
    # the work bound: only the planted 20 queries' postings are
    # touched (<= 60 entries), never the 10^4-query list
    assert idx.touched(doc_toks) <= 60

    # a doc over the wide vocabulary: identity holds there too
    wide = [f"t{rng.randrange(50_000)}" for _ in range(30)]
    naive_w = [
        qi for qi, q in enumerate(queries)
        if frozenset(q) <= set(wide)
    ]
    assert sorted(idx.match(wide)) == naive_w
    assert idx.touched(wide) < nq / 10


def test_rich_parser_gate_rejects_non_subset():
    """The rich percolator accepts bare/phrase/-not ONLY; the gate
    must actually fire for OR groups / wildcards / boosts / filters
    (a .get('groups') typo once made the OR check vacuous)."""
    import pytest

    from searchengine_spark.ops.search import _parse_perc_rich

    assert _parse_perc_rich(['spark "merge join" -dup'])
    for bad in ("spark a|b", "spark sc*", "spark a^2",
                "spark lang:en", "-a -b"):
        with pytest.raises(ValueError):
            _parse_perc_rich([bad])


def test_or_stream_alerts_match_batch(spark, docs_table, tmp_path):
    """The OR-capable gate (bare/phrase/-not/a|b slots) equals
    ops/search.percolate_or over the same docs, and replays append
    nothing."""
    from searchengine_spark.ops.search import percolate_or
    from searchengine_spark.streaming.percolate import (
        percolate_or_stream,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    _write_chunks(src, docs_table, 3)

    percolate_or_stream(spark, src, out, ckpt)
    got = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    want = [
        (r["qid"], r["doc_id"])
        for r in percolate_or(spark, SF).collect()
    ]
    assert got == want
    assert len({q for q, _ in got}) == 4  # every OR query fires

    percolate_or_stream(spark, src, out, ckpt)
    again = sorted(
        (r["qid"], r["doc_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert again == got


def test_slot_query_index_matches_naive_and_bounds_work():
    """SlotQueryIndex vs the naive every-query slot loop on random
    slot structures (incl. shared members across queries), slot
    dedup (two members of one slot count once), the conjunctive
    degeneration, and the posting-entry work bound."""
    import random

    from searchengine_spark.streaming.percolate import (
        InvertedQueryIndex,
        SlotQueryIndex,
    )

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(300)]
    queries = []
    for _ in range(500):
        slots = []
        for _ in range(rng.randint(1, 4)):
            k = rng.randint(1, 3)
            slots.append(tuple(rng.sample(vocab, k)))
        queries.append(tuple(slots))
    idx = SlotQueryIndex(queries)

    def naive(tokens):
        ts = set(tokens)
        return [
            qi for qi, slots in enumerate(queries)
            if all(any(m in ts for m in slot) for slot in slots)
        ]

    for _ in range(50):
        doc = rng.sample(vocab, rng.randint(1, 40))
        assert idx.match(doc) == naive(doc)

    # slot dedup: both members present still needs the OTHER slot
    idx2 = SlotQueryIndex([(("a", "b"), ("c",))])
    assert idx2.match(["a", "b"]) == []       # slot 0 twice != slot 1
    assert idx2.match(["a", "c"]) == [0]
    assert idx2.match(["b", "c", "a"]) == [0]

    # conjunctive degeneration: singleton slots == InvertedQueryIndex
    conj = [tuple(rng.sample(vocab, rng.randint(1, 4)))
            for _ in range(200)]
    a = SlotQueryIndex([tuple((t,) for t in q) for q in conj])
    b = InvertedQueryIndex([frozenset(q) for q in conj])
    for _ in range(30):
        doc = rng.sample(vocab, rng.randint(1, 30))
        assert a.match(doc) == b.match(doc)

    # work bound: matching touches only the doc's terms' postings
    doc = rng.sample(vocab, 10)
    bound = sum(len(idx.postings.get(t, ())) for t in set(doc))
    assert idx.touched(doc) == bound


def test_parse_perc_or_gate():
    """percolate_or's subset: OR groups now ACCEPTED; filters,
    wildcards, and boosts still raise; negated groups fold into
    -nots (parser-level De Morgan)."""
    import pytest

    from searchengine_spark.ops.search import _parse_perc_or

    parsed = _parse_perc_or(['spark part|stream "merge join" -dup'])
    qi, slots, phs, nots = parsed[0]
    assert ("part", "stream") in slots
    assert phs == ["merge join"] and nots == ["dup"]
    parsed2 = _parse_perc_or(["spark -fast|slow"])
    assert parsed2[0][3] == ["fast", "slow"]
    for bad in ("spark lang:en", "spark sc*", "spark a^2", "-a -b"):
        with pytest.raises(ValueError):
            _parse_perc_or([bad])
