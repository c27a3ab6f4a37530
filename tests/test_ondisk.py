"""On-disk index: varbyte codec, shard round-trip, resume (SURVEY.md §5)."""

import glob
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from searchengine_spark.index.varbyte import (
    decode_block,
    decode_deltas,
    encode_block,
    encode_deltas,
    vb_decode,
    vb_encode,
)
from searchengine_spark.index.shards import (
    RESUME_GROUPS,
    Manifest,
    fetch_postings,
    load_index,
    write_index,
)
from searchengine_spark.params import POSTING_BLOCK


# -- codec (pure python, property-based) -----------------------------------

@given(st.lists(st.integers(min_value=0, max_value=2**62)))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    data = vb_encode(values)
    got, off = vb_decode(data)
    assert got == values
    assert off == len(data)


@given(st.lists(st.integers(min_value=1, max_value=2**40), min_size=1,
                unique=True).map(sorted))
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(values):
    data = encode_deltas(values)
    got, _ = decode_deltas(data, len(values))
    assert got == values


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2**40),           # docid
        st.integers(min_value=1, max_value=10_000),          # tf
        st.lists(st.integers(min_value=1, max_value=10**6),  # positions
                 max_size=8, unique=True).map(sorted),
    ),
    min_size=1, max_size=200,
    unique_by=lambda t: t[0],
).map(lambda rows: sorted(rows, key=lambda t: t[0]))


@given(posting_lists)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(rows):
    docids = [r[0] for r in rows]
    tfs = [r[1] for r in rows]
    poss = [r[2] for r in rows]
    payload = encode_block(docids, tfs, poss)
    d, t, p = decode_block(payload)
    assert (d, t, p) == (docids, tfs, poss)


def test_block_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_block([5, 3], [1, 1], [[1], [1]])


@given(st.lists(st.integers(min_value=0, max_value=2**62)))
@settings(max_examples=200, deadline=None)
def test_vectorized_decode_matches_streaming(values):
    """vb_decode_all (numpy kernel) vs vb_decode (independent
    byte-at-a-time implementation) on the same stream."""
    from searchengine_spark.index.varbyte import vb_decode_all

    data = vb_encode(values)
    assert vb_decode_all(data).tolist() == values


@given(posting_lists)
@settings(max_examples=100, deadline=None)
def test_vectorized_block_decode_matches_reference(rows):
    from searchengine_spark.index.varbyte import decode_block_py

    docids = [r[0] for r in rows]
    tfs = [r[1] for r in rows]
    poss = [r[2] for r in rows]
    payload = encode_block(docids, tfs, poss)
    assert decode_block(payload) == decode_block_py(payload)


@given(st.lists(st.integers(min_value=0, max_value=2**62)))
@settings(max_examples=200, deadline=None)
def test_vectorized_encode_matches_scalar(values):
    """vb_encode_np (the write-path numpy kernel) must stay
    byte-identical to vb_encode (the scalar reference)."""
    import numpy as np

    from searchengine_spark.index.varbyte import vb_encode_np

    buf, ends = vb_encode_np(np.array(values, dtype=np.int64))
    assert bytes(buf) == vb_encode(values)
    if values:
        assert ends[-1] == len(bytes(buf))


@given(
    st.lists(posting_lists, min_size=1, max_size=5),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=60, deadline=None)
def test_vectorized_payloads_match_encode_block(groups, block_cap):
    """encode_payloads_np on a multi-block partition must reproduce
    encode_block per block byte for byte, for arbitrary block cuts
    (groups × a small POSTING_BLOCK stand-in)."""
    import numpy as np

    from searchengine_spark.index.varbyte import encode_payloads_np

    docids, tfs, npos, flat, starts = [], [], [], [], []
    ref_blocks = []
    base = 0
    for rows in groups:
        # re-key docids so concatenated groups stay strictly increasing
        # within each block (groups model (term, salt) boundaries)
        rows = [(base + i + 1, r[1], r[2]) for i, r in enumerate(rows)]
        base = rows[-1][0]
        for lo in range(0, len(rows), block_cap):
            chunk = rows[lo : lo + block_cap]
            starts.append(len(docids))
            ref_blocks.append(
                encode_block(
                    [r[0] for r in chunk],
                    [r[1] for r in chunk],
                    [r[2] for r in chunk],
                )
            )
            for d, t, p in chunk:
                docids.append(d)
                tfs.append(t)
                npos.append(len(p))
                flat.extend(p)
    got = encode_payloads_np(
        np.array(docids, dtype=np.int64),
        np.array(tfs, dtype=np.int64),
        np.array(npos, dtype=np.int64),
        np.array(flat, dtype=np.int64),
        np.array(starts, dtype=np.int64),
    )
    assert got == ref_blocks


# -- on-disk index (index_dir fixture in conftest.py) ----------------------

def test_manifest_complete(index_dir):
    man = Manifest(os.path.join(index_dir, "_manifest.json"))
    assert man.data["complete"]
    from searchengine_spark.params import N_TERM_BUCKETS

    for g in range(RESUME_GROUPS):
        st_ = man.data["stages"][f"postings_group_{g}"]
        assert st_["status"] == "done"
        # per-partition lineage: group metrics + covered bucket ids
        assert st_["postings"] >= st_["blocks"] > 0
        assert st_["buckets"] == sorted(
            range(g, N_TERM_BUCKETS, RESUME_GROUPS)
        )
        assert 0 < st_["n_buckets_written"] <= len(st_["buckets"])


def test_block_invariants(spark, index_dir):
    sh = load_index(spark, index_dir)
    rows = sh.blocks.select(
        "term", "bucket", "n", "docid_first", "docid_last", "max_weight"
    ).collect()
    per_term = {}
    for r in rows:
        assert 1 <= r["n"] <= POSTING_BLOCK
        assert r["docid_first"] <= r["docid_last"]
        assert r["max_weight"] > 0
        per_term.setdefault(r["term"], []).append(
            (r["docid_first"], r["docid_last"])
        )
    # skip-pointer invariant: per-term block ranges disjoint & ordered
    for spans in per_term.values():
        spans.sort()
        for (a1, a2), (b1, b2) in zip(spans, spans[1:]):
            assert a2 < b1


def test_termdict_matches_tables(spark, index_dir, tables):
    sh = load_index(spark, index_dir)
    got = {
        r["term"]: (r["df"], r["cf"])
        for r in sh.termdict.collect()
    }
    expect = {
        r["term"]: (r["df"], r["cf"])
        for r in tables.postings.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .collect()
    }
    assert got == expect


def test_ondisk_postings_roundtrip(spark, index_dir, tables):
    sh = load_index(spark, index_dir)
    some_terms = [r["term"] for r in sh.termdict.limit(50).collect()]
    got = {
        (r["term"], r["docid"]): (r["tf"], list(r["positions"]))
        for r in fetch_postings(sh, some_terms).collect()
    }
    expect = {
        (r["term"], r["docid"]): (r["tf"], list(r["positions"]))
        for r in tables.postings.filter(
            F.col("term").isin(some_terms)
        ).collect()
    }
    assert got == expect


def test_resume_after_injected_failure(spark, tables, tmp_path_factory,
                                       index_dir):
    d = str(tmp_path_factory.mktemp("resume") / "idx")
    with pytest.raises(RuntimeError, match="injected failure"):
        write_index(spark, tables, d, fail_after_group=2)
    man = Manifest(os.path.join(d, "_manifest.json"))
    assert man.done("postings_group_2")
    assert not man.done("postings_group_3")
    assert not man.data["complete"]

    # groups 0-2 must NOT be rewritten on resume (lineage honored)
    g0_files = sorted(glob.glob(os.path.join(d, "postings", "group=0", "**",
                                             "*.parquet"), recursive=True))
    mtimes_before = [os.path.getmtime(f) for f in g0_files]
    write_index(spark, tables, d)
    assert [os.path.getmtime(f) for f in g0_files] == mtimes_before

    # resumed index is identical to the clean build
    a = load_index(spark, d)
    b = load_index(spark, index_dir)
    key = lambda r: (r["term"], r["docid_first"])  # noqa: E731
    ga = sorted(
        a.blocks.select("term", "docid_first", "docid_last", "n",
                        "cf", "payload").collect(), key=key)
    gb = sorted(
        b.blocks.select("term", "docid_first", "docid_last", "n",
                        "cf", "payload").collect(), key=key)
    assert [tuple(r) for r in ga] == [tuple(r) for r in gb]
    assert a.stats == b.stats


@given(
    st.lists(posting_lists, min_size=1, max_size=5),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=40, deadline=None)
def test_vectorized_importance_payloads_match_encode_block(groups,
                                                          block_cap):
    """The importance-payload variant keeps the byte-identity contract:
    encode_payloads_np(imps=...) == encode_block(..., importants) per
    block, and both scalar and vectorized decoders round-trip the
    trailing important[n] section."""
    import numpy as np

    from searchengine_spark.index.varbyte import (
        decode_block_py,
        decode_payloads_np,
        encode_payloads_np,
    )

    docids, tfs, npos, flat, imps, starts = [], [], [], [], [], []
    ref_blocks, ref_rows = [], []
    base = 0
    for gi, rows in enumerate(groups):
        rows = [(base + i + 1, r[1], r[2]) for i, r in enumerate(rows)]
        base = rows[-1][0]
        for lo in range(0, len(rows), block_cap):
            chunk = rows[lo : lo + block_cap]
            ims = [(d * 7 + gi) % 11 for d, _, _ in chunk]  # incl. >8
            starts.append(len(docids))
            ref_blocks.append(
                encode_block(
                    [r[0] for r in chunk],
                    [r[1] for r in chunk],
                    [r[2] for r in chunk],
                    importants=ims,
                )
            )
            ref_rows.append(([r[0] for r in chunk],
                             [r[1] for r in chunk],
                             [r[2] for r in chunk], ims))
            for (d, t, p), im in zip(chunk, ims):
                docids.append(d)
                tfs.append(t)
                npos.append(len(p))
                flat.extend(p)
                imps.append(im)
    got = encode_payloads_np(
        np.array(docids, dtype=np.int64),
        np.array(tfs, dtype=np.int64),
        np.array(npos, dtype=np.int64),
        np.array(flat, dtype=np.int64),
        np.array(starts, dtype=np.int64),
        imps=np.array(imps, dtype=np.int64),
    )
    assert got == ref_blocks
    for pl, (d, t, p, im) in zip(ref_blocks, ref_rows):
        assert decode_block_py(pl, with_importance=True) == (d, t, p, im)
    n, d_all, t_all, _, _, i_all = decode_payloads_np(
        ref_blocks, with_importance=True
    )
    assert d_all.tolist() == docids
    assert i_all.tolist() == imps
    # the lean (positions-skipping) decode ignores the tail section
    _, d2, t2, _, _ = decode_payloads_np(ref_blocks,
                                         want_positions=False)
    assert d2.tolist() == docids and t2.tolist() == tfs


@given(
    st.lists(posting_lists, min_size=1, max_size=5),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=40, deadline=None)
def test_preencoded_payloads_match_encode_block(groups, block_cap):
    """The shuffle-byte-diet write path (encode_row_positions_np +
    encode_payloads_pre — per-row position sections sliced, never
    re-encoded) must reproduce encode_block byte for byte for
    arbitrary block cuts, with and without the importance section."""
    import numpy as np

    from searchengine_spark.index.varbyte import (
        encode_payloads_pre,
        encode_row_positions_np,
    )

    docids, tfs, npos, flat, imps, starts = [], [], [], [], [], []
    ref_plain, ref_imp = [], []
    base = 0
    for gi, rows in enumerate(groups):
        rows = [(base + i + 1, r[1], r[2]) for i, r in enumerate(rows)]
        base = rows[-1][0]
        for lo in range(0, len(rows), block_cap):
            chunk = rows[lo : lo + block_cap]
            ims = [(d * 5 + gi) % 10 for d, _, _ in chunk]
            starts.append(len(docids))
            ref_plain.append(encode_block(
                [r[0] for r in chunk], [r[1] for r in chunk],
                [r[2] for r in chunk]))
            ref_imp.append(encode_block(
                [r[0] for r in chunk], [r[1] for r in chunk],
                [r[2] for r in chunk], importants=ims))
            for (d, t, p), im in zip(chunk, ims):
                docids.append(d); tfs.append(t)
                npos.append(len(p)); flat.extend(p); imps.append(im)
    np_npos = np.array(npos, dtype=np.int64)
    buf, rend = encode_row_positions_np(
        np_npos, np.array(flat, dtype=np.int64))
    args = (np.array(docids, dtype=np.int64),
            np.array(tfs, dtype=np.int64), np_npos, buf, rend,
            np.array(starts, dtype=np.int64))
    assert encode_payloads_pre(*args) == ref_plain
    assert encode_payloads_pre(
        *args, imps=np.array(imps, dtype=np.int64)) == ref_imp
