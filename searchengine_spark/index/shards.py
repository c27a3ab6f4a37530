"""Sharded on-disk index: compressed posting blocks + term dictionary.

Replaces the reference's first-char ``.bucket``/``.seek`` file pairs
(lib/writer.py:217-247, lib/spec.md:119-160) with a Spark-native layout:

    <index_dir>/
      docs/                 parquet (docid, url, total_tokens, qualities)
      postings/group=G/bucket=B/   parquet block rows
      termdict/             parquet (term, bucket, df, cf, n_blocks,
                                     max_weight)
      _manifest.json        per-partition lineage + metrics (resume state)
      mergeinfo.json        corpus stats (analogue of lib/writer.py:284-291)

Block row = one compressed run of <= POSTING_BLOCK postings of one term:
(term, bucket, n, docid_first, docid_last, cf, max_weight, payload) where
payload is the delta+varbyte binary (varbyte.py) and (docid_first,
docid_last) are the skip pointers — readers and the WAND scorer skip
whole blocks on these columns without decoding, and parquet min/max
stats prune at scan time.  ``max_weight`` is the block-max BM25
*tf-side* bound  max tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)); multiplying
by the term's query-time idf gives the block-max WAND upper bound.

Skew (north rule): stopword-heavy terms have postings lists comparable
to the corpus size.  The encode stage uses *salted repartitioning*: each
term's postings are striped into contiguous docid ranges —
``salt = (docid-1) div ceil(N / stripes)`` with
``stripes = ceil(df / STRIPE_POSTINGS)`` — and shuffled by hash of
``(term, salt)``, so a hot term spreads over ~df/8192 tasks while a rare
term stays in one.  Stripes are a pure function of (df, N, docid):
block layout is byte-identical across cluster sizes and across
crash/resume runs (unlike ``repartitionByRange``, whose sampled
boundaries are not deterministic).  Stripe contiguity preserves the
skip-pointer invariant: blocks of one term have disjoint, ordered docid
ranges even when produced by different tasks.

Resume (north rule): buckets are written in RESUME_GROUPS independent
jobs; ``_manifest.json`` records per-group, per-bucket row/block counts
(lineage + metrics).  A crashed build re-runs only the incomplete groups
(the reference's header-docid resume contract, lib/writer.py:40-57,
makeindex.py:302-323, lifted from "skip files already indexed" to
"skip partitions already committed").

Reference parity notes: the first-char bucketing of the reference is
catastrophically skewed ('s'/'c' dominate) and has the >=128-codepoint
reachability bug (writer.py:222 vs reader.py:237); we bucket by
``pmod(xxhash64(term), N_TERM_BUCKETS)`` on both sides instead.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..params import BM25_B, BM25_K1, N_TERM_BUCKETS, POSTING_BLOCK
from .varbyte import encode_payloads_pre

RESUME_GROUPS = 8

# target postings per stripe of a salted hot term (64 full blocks)
STRIPE_POSTINGS = POSTING_BLOCK * 64

BLOCK_SCHEMA = (
    "term string, bucket int, n int, docid_first long, docid_last long, "
    "cf long, max_weight double, payload binary"
)
# encoder output: bucket is NOT carried through the wide (term, salt)
# shuffle — it re-derives from term (one JVM xxhash64 per BLOCK row,
# rows/128) after encoding; shuffle bytes are the build's scaling
# ceiling on a shared bus, so every droppable column counts
BLOCK_ENC_SCHEMA = (
    "term string, n int, docid_first long, docid_last long, "
    "cf long, max_weight double, payload binary"
)

DECODE_SCHEMA = "term string, docid long, tf int, positions array<int>"
DECODE_SCHEMA_IMP = DECODE_SCHEMA + ", important int"


def term_bucket_col(term_col="term"):
    """Deterministic term → shard bucket (identical at build & query)."""
    return F.pmod(F.xxhash64(F.col(term_col)), F.lit(N_TERM_BUCKETS)).cast(
        "int"
    )


# rows buffered before a chunked encode pass; one (term, salt) group is
# capped at ~STRIPE_POSTINGS rows by the salted striping, so the carry
# between chunks (the trailing partial group) is tiny relative to this
_ENCODE_CHUNK_ROWS = 1 << 18


def _pre_positions(batches):
    """Pre-SHUFFLE position encoding (the write path's shuffle-byte
    diet): replaces the ``positions`` list column with ``npos`` (int32)
    and ``pos_vb`` (binary — the row's varbyte [pos0, delta...]
    section, varbyte.encode_row_positions_np).  Per-row sections are
    block-cut independent, so the block writer later SLICES them
    byte-for-byte instead of re-encoding — and the repartition shuffle
    carries ~1-2 B/position binary instead of int list cells.  Every
    other column passes through unchanged."""
    import numpy as np
    import pyarrow as pa

    from .varbyte import encode_row_positions_np

    for rb in batches:
        if rb.num_rows == 0:
            continue
        pos_idx = rb.schema.get_field_index("positions")
        pos = rb.column(pos_idx)
        off = pos.offsets.to_numpy().astype(np.int64)
        off = off - off[0]
        npos = np.diff(off)
        flat = pos.flatten().to_numpy().astype(np.int64)
        buf, rend = encode_row_positions_np(npos, flat)
        bin_off = np.empty(npos.size + 1, dtype=np.int32)
        bin_off[0] = 0
        bin_off[1:] = rend
        pos_vb = pa.Array.from_buffers(
            pa.binary(), npos.size,
            [None, pa.py_buffer(bin_off.tobytes()),
             pa.py_buffer(buf.tobytes())],
        )
        arrays, names = [], []
        for i in range(rb.num_columns):
            if i == pos_idx:
                continue
            arrays.append(rb.column(i))
            names.append(rb.schema.field(i).name)
        arrays += [pa.array(npos.astype(np.int32), pa.int32()), pos_vb]
        names += ["npos", "pos_vb"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def _encode_blocks(batches):
    """mapInArrow over (term, salt, docid, tf, npos, pos_vb,
    weight) rows sorted by (term, salt, docid) within the partition →
    block rows (bucket re-derives from term AFTER encoding — it never
    rides the wide shuffle).  Positions arrive PRE-ENCODED
    (_pre_positions).
    (`_encode_blocks_imp` is the importance-payload twin: rows carry an
    extra ``important`` column that lands as the payload's trailing
    section — see varbyte.encode_block.)

    Fully vectorized: block boundaries fall at (term, salt) changes and
    every POSTING_BLOCK postings within a group (so layout is
    independent of how groups pack into partitions — the determinism
    the resume test asserts), computed as one numpy pass; payloads come
    from varbyte.encode_payloads_np (one global varbyte encode per
    section + per-block slicing, byte-identical to encode_block — pinned
    by property tests).  The per-posting Python loop this replaced was
    the write phase's dominant cost.

    Memory is bounded: input batches buffer up to _ENCODE_CHUNK_ROWS,
    then every COMPLETE (term, salt) group in the buffer is encoded and
    the trailing partial group carries into the next chunk.  Block cuts
    are group-local, so chunking at group boundaries cannot change the
    layout — and the sort upstream may have spilled, so the worker must
    not assume the whole partition fits in one table.
    """
    import pyarrow as pa

    yield from _encode_stream(batches, with_importance=False)


def _encode_blocks_imp(batches):
    """Importance-payload encode (write_index store_importance=True)."""
    yield from _encode_stream(batches, with_importance=True)


def _encode_stream(batches, with_importance: bool):
    import pyarrow as pa

    buf, nrows = [], 0
    for rb in batches:
        if rb.num_rows == 0:
            continue
        buf.append(pa.Table.from_batches([rb]))
        nrows += rb.num_rows
        if nrows >= _ENCODE_CHUNK_ROWS:
            tbl = pa.concat_tables(buf).combine_chunks()
            head, tail = _split_last_group(tbl)
            if head is not None:
                yield from _encode_table(head, with_importance)
                buf = [tail]
                nrows = tail.num_rows
            # else: one giant group fills the buffer — keep buffering
            # (bounded by the striping cap, this should not happen)
    if nrows:
        yield from _encode_table(
            pa.concat_tables(buf).combine_chunks(), with_importance
        )


def _split_last_group(tbl):
    """(head, tail): head = every complete (term, salt) group, tail =
    the trailing (possibly incomplete) group.  head is None when the
    whole table is a single group."""
    g = _group_flags(tbl)
    import numpy as np

    starts = np.flatnonzero(g)
    if starts.size <= 1:
        return None, tbl
    cut = int(starts[-1])
    return tbl.slice(0, cut), tbl.slice(cut)


def _group_flags(tbl):
    """(term, salt)-change flags over a combined table (row 0 = True)."""
    import numpy as np
    import pyarrow.compute as pc

    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    salt = tbl.column("salt").chunk(0).to_numpy().astype(np.int64)
    tidx = (
        pc.dictionary_encode(tbl.column("term").chunk(0))
        .indices.to_numpy().astype(np.int64)
    )
    g = np.ones(n, dtype=bool)
    if n > 1:
        g[1:] = (tidx[1:] != tidx[:-1]) | (salt[1:] != salt[:-1])
    return g


def _encode_table(tbl, with_importance: bool = False):
    """Encode one table whose (term, salt) groups are all complete."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = pa.schema([
        ("term", pa.string()),
        ("n", pa.int32()),
        ("docid_first", pa.int64()),
        ("docid_last", pa.int64()),
        ("cf", pa.int64()),
        ("max_weight", pa.float64()),
        ("payload", pa.binary()),
    ])
    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    if n == 0:
        return

    term = tbl.column("term").chunk(0)
    docid = tbl.column("docid").chunk(0).to_numpy().astype(np.int64)
    tf = tbl.column("tf").chunk(0).to_numpy().astype(np.int64)
    weight = tbl.column("weight").chunk(0).to_numpy().astype(np.float64)
    npos = tbl.column("npos").chunk(0).to_numpy().astype(np.int64)
    # pos_vb: the rows' pre-encoded position sections, as one
    # contiguous byte buffer + per-row exclusive end offsets (the
    # BinaryArray's own layout, re-based to this table)
    pv = tbl.column("pos_vb").chunk(0)
    pv_bufs = pv.buffers()
    pv_off = np.frombuffer(pv_bufs[1], dtype=np.int32)[
        pv.offset : pv.offset + n + 1
    ].astype(np.int64)
    pos_buf = np.frombuffer(pv_bufs[2], dtype=np.uint8)[
        pv_off[0]:pv_off[-1]
    ]
    pos_row_ends = pv_off[1:] - pv_off[0]

    imps = None
    if with_importance:
        imps = tbl.column("important").chunk(0).to_numpy().astype(
            np.int64
        )

    g = _group_flags(tbl)
    gid = np.cumsum(g) - 1
    gstart = np.flatnonzero(g)
    within = np.arange(n, dtype=np.int64) - gstart[gid]
    bstart = g | (within % POSTING_BLOCK == 0)
    starts = np.flatnonzero(bstart)
    bounds = np.append(starts, n)

    payloads = encode_payloads_pre(docid, tf, npos, pos_buf,
                                   pos_row_ends, starts, imps=imps)
    lens = np.diff(bounds).astype(np.int32)
    cf = np.add.reduceat(tf, starts)
    maxw = np.maximum.reduceat(weight, starts)
    first = docid[starts]
    last = docid[bounds[1:] - 1]
    idx = pa.array(starts, pa.int64())
    term_b = pc.take(term, idx)

    n_blocks = starts.size
    for lo in range(0, n_blocks, 4096):
        hi = min(lo + 4096, n_blocks)
        yield pa.RecordBatch.from_arrays(
            [
                term_b.slice(lo, hi - lo),
                pa.array(lens[lo:hi], pa.int32()),
                pa.array(first[lo:hi], pa.int64()),
                pa.array(last[lo:hi], pa.int64()),
                pa.array(cf[lo:hi], pa.int64()),
                pa.array(maxw[lo:hi], pa.float64()),
                pa.array(payloads[lo:hi], pa.binary()),
            ],
            schema=out_schema,
        )


def decode_blocks(batches):
    """mapInArrow inverse of _encode_blocks: block rows → posting rows.

    Fully vectorized: numpy varbyte decode per payload (decode_block_np),
    then one concatenate per column — the flat position buffer + cumsum
    offsets feed Arrow's ListArray directly, so no per-posting Python
    object is ever built.
    """
    import numpy as np
    import pyarrow as pa

    from .varbyte import decode_payloads_np

    out_schema = pa.schema([
        ("term", pa.string()),
        ("docid", pa.int64()),
        ("tf", pa.int32()),
        ("positions", pa.list_(pa.int32())),
    ])
    for rb in batches:
        terms_in = rb.column(rb.schema.get_field_index("term")).to_pylist()
        payloads = rb.column(rb.schema.get_field_index("payload")).to_pylist()
        n, docids, tfs, npos_all, flat_all = decode_payloads_np(
            [bytes(p) for p in payloads]
        )
        # dictionary-encode the repeated term labels (C++-side expand
        # beats a python-object repeat ~4×)
        tidx = np.repeat(np.arange(len(terms_in), dtype=np.int32), n)
        terms = pa.DictionaryArray.from_arrays(
            pa.array(tidx), pa.array(terms_in, pa.string())
        ).cast(pa.string())
        offsets = np.zeros(npos_all.size + 1, dtype=np.int32)
        np.cumsum(npos_all, out=offsets[1:])
        yield pa.RecordBatch.from_arrays(
            [
                terms,
                pa.array(docids, pa.int64()),
                pa.array(tfs.astype(np.int32), pa.int32()),
                pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flat_all.astype(np.int32), pa.int32()),
                ),
            ],
            schema=out_schema,
        )


def decode_blocks_imp(batches):
    """decode_blocks for importance-payload indexes: the trailing
    important[n] section rides out as an extra int32 column."""
    import numpy as np
    import pyarrow as pa

    from .varbyte import decode_payloads_np

    out_schema = pa.schema([
        ("term", pa.string()),
        ("docid", pa.int64()),
        ("tf", pa.int32()),
        ("positions", pa.list_(pa.int32())),
        ("important", pa.int32()),
    ])
    for rb in batches:
        terms_in = rb.column(rb.schema.get_field_index("term")).to_pylist()
        payloads = rb.column(rb.schema.get_field_index("payload")).to_pylist()
        n, docids, tfs, npos_all, flat_all, imps = decode_payloads_np(
            [bytes(p) for p in payloads], with_importance=True
        )
        tidx = np.repeat(np.arange(len(terms_in), dtype=np.int32), n)
        terms = pa.DictionaryArray.from_arrays(
            pa.array(tidx), pa.array(terms_in, pa.string())
        ).cast(pa.string())
        offsets = np.zeros(npos_all.size + 1, dtype=np.int32)
        np.cumsum(npos_all, out=offsets[1:])
        yield pa.RecordBatch.from_arrays(
            [
                terms,
                pa.array(docids, pa.int64()),
                pa.array(tfs.astype(np.int32), pa.int32()),
                pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()),
                    pa.array(flat_all.astype(np.int32), pa.int32()),
                ),
                pa.array(imps.astype(np.int32), pa.int32()),
            ],
            schema=out_schema,
        )


# --------------------------------------------------------------------------
# manifest


class Manifest:
    """Per-partition lineage + metrics; the resume contract (S4).

    Thread-safe: posting groups commit from concurrent job threads."""

    def __init__(self, path):
        import threading

        self.path = path
        self._lock = threading.Lock()
        self.data = {"version": 1, "stages": {}, "complete": False}
        if os.path.exists(path):
            with open(path) as f:
                self.data = json.load(f)

    def done(self, stage) -> bool:
        return self.data["stages"].get(stage, {}).get("status") == "done"

    def mark(self, stage, **metrics):
        with self._lock:
            self.data["stages"][stage] = {"status": "done", **metrics}
            self._save_locked()

    def save(self):
        with self._lock:
            self._save_locked()

    def _save_locked(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


# --------------------------------------------------------------------------
# writer


def write_index(
    spark: SparkSession,
    tables,
    index_dir: str,
    fail_after_group: int | None = None,
    store_content: bool = False,
    store_importance: bool = False,
) -> dict:
    """Materialize IndexTables into the sharded on-disk index.

    Idempotent and resumable: stages already marked done in
    ``_manifest.json`` are skipped; posting groups re-run only if
    incomplete (their output dir is overwritten whole, so a half-written
    group is safe).  ``fail_after_group`` injects a crash for the resume
    test (SURVEY.md §5 item 4).

    ``store_content=True`` additionally writes the ``stored/``
    stored-fields sidecar (index/stored.py) from ``tables.survivors``
    — its own resumable stage, completed before the mergeinfo commit
    marker so a complete manifest implies a complete sidecar.

    ``store_importance=True`` (requires postings built with
    ``importance_fn``) writes the BM25F importance-payload variant:
    each posting's field priority lands as the payload's trailing
    varbyte section, and the block/termdict ``max_weight`` bounds the
    importance-SCALED tf-side weight (weight × params.IMPORTANCE
    multiplier), so block-max WAND pruning stays lossless for the
    BM25F scorer.  The flag is recorded in mergeinfo
    (``importance_payload``) — readers pick the decode variant from
    it; a plain reader skipping positions can still read these blocks
    (sections decode front-to-back).
    """
    os.makedirs(index_dir, exist_ok=True)
    man = Manifest(os.path.join(index_dir, "_manifest.json"))

    # -- stage: docs + stats ------------------------------------------------
    docs_path = os.path.join(index_dir, "docs")
    stats = dict(tables.stats)
    avgdl = stats["avgdl"] or 1.0

    def docs_stage():
        if man.done("docs"):
            return
        from pyspark.sql import Observation

        obs = Observation()
        tables.docs.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(docs_path)
        man.mark("docs", rows=int(obs.get["rows"]))

    # -- stage: posting blocks, RESUME_GROUPS independent jobs --------------
    # weight = BM25 tf-side contribution; block max of it is the WAND bound
    dl = F.col("total_tokens").cast("double")
    weight = (
        F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * dl / F.lit(avgdl))
        )
    )
    if store_importance:
        if "important" not in tables.postings.columns:
            raise ValueError(
                "store_importance=True needs postings with an"
                " 'important' column (build_tables(importance_fn=...))"
            )
        from ..params import importance_mult_col

        # bound the SCALED per-posting score: WAND's block max must
        # dominate idf * tf_part * multiplier for losslessness
        weight = weight * importance_mult_col(F.col("important"))
    # salted repartitioning (north rule): stripes = f(df); salt = docid
    # stripe index.  df via partial-aggregating groupBy (map-side combine
    # keeps hot terms cheap), joined back on term.
    n_docs = int(stats["n_total"]) or 1
    dfreq = tables.postings.groupBy("term").agg(F.count("*").alias("_df"))
    stripes = F.ceil(F.col("_df") / F.lit(STRIPE_POSTINGS)).cast("long")
    stripe_width = F.ceil(F.lit(n_docs) / stripes).cast("long")
    # doc length: use the denormalized total_tokens column when the
    # pipeline provides it (no shuffle join of the full postings set);
    # fall back to a docs join for bare postings tables
    if "total_tokens" in tables.postings.columns:
        base = tables.postings
    else:
        base = tables.postings.join(
            tables.docs.select("docid", "total_tokens"), "docid"
        )
    # positions pre-encode to per-row varbyte BEFORE any wide edge:
    # the dfreq join and the (term, salt) repartition then carry
    # ~1-2 B/position binary instead of int list cells — shuffle
    # bytes are the build's scaling ceiling on a shared bus
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        StructField,
        StructType,
    )

    pre_cols = ["term", "docid", "tf", "positions", "total_tokens"] + (
        ["important"] if store_importance else []
    )
    base_p = base.select(*pre_cols)
    pre_schema = StructType(
        [f for f in base_p.schema.fields if f.name != "positions"]
        + [StructField("npos", IntegerType()),
           StructField("pos_vb", BinaryType())]
    )
    pre = base_p.mapInArrow(_pre_positions, schema=pre_schema)
    enriched = (
        pre
        .join(dfreq, "term")
        .withColumn("bucket", term_bucket_col())
        .withColumn("weight", weight)
        .withColumn(
            "salt",
            ((F.col("docid") - 1) / stripe_width).cast("long"),
        )
        .select("term", "salt", "bucket", "docid", "tf", "npos",
                "pos_vb", "weight",
                *(["important"] if store_importance else []))
    )
    encode_fn = _encode_blocks_imp if store_importance else _encode_blocks
    n_parts = max(spark.sparkContext.defaultParallelism, 8)
    todo = [g for g in range(RESUME_GROUPS)
            if not man.done(f"postings_group_{g}")]
    if todo:
        # ONE materialization of the enriched postings, completed BEFORE
        # the group jobs launch: concurrent jobs over an unmaterialized
        # .persist() would race and each recompute the full join
        # pipeline (cache fills per-partition, not per-plan).  The docs
        # write shares no lineage with `enriched` beyond already-cached
        # tables, so it runs concurrently on a second job thread.
        from concurrent.futures import ThreadPoolExecutor as _TPE

        enriched = enriched.persist()
        with _TPE(max_workers=1) as _ex:
            _docs_f = _ex.submit(docs_stage)
            enriched.count()
            _docs_f.result()

        from pyspark.sql import Observation

        def write_group(g):
            stage = f"postings_group_{g}"
            gdir = os.path.join(index_dir, "postings", f"group={g}")
            part = (
                enriched.filter(F.col("bucket") % RESUME_GROUPS == g)
                # bucket does NOT ride the wide shuffle: it re-derives
                # from term per BLOCK row after encoding (rows/128
                # hashes, JVM-side) — parity with the build rule is the
                # xxhash64 contract term_bucket_col encodes
                .drop("bucket")
                .repartition(max(n_parts // 4, 4), "term", "salt")
                .sortWithinPartitions("term", "salt", "docid")
                .mapInArrow(encode_fn, schema=BLOCK_ENC_SCHEMA)
                .withColumn("bucket", term_bucket_col())
            )
            # lineage metrics ride on the write job itself (Observation)
            # instead of a read-back job per group
            obs = Observation()
            part = part.observe(
                obs,
                F.count(F.lit(1)).alias("blocks"),
                F.sum("n").alias("postings"),
                F.approx_count_distinct("bucket").alias("n_buckets"),
            )
            part.write.mode("overwrite").partitionBy("bucket").parquet(gdir)
            m = obs.get
            man.mark(
                stage,
                group=g,
                buckets=sorted(range(g, N_TERM_BUCKETS, RESUME_GROUPS)),
                n_buckets_written=int(m["n_buckets"] or 0),
                blocks=int(m["blocks"] or 0),
                postings=int(m["postings"] or 0),
            )
            if fail_after_group is not None and g == fail_after_group:
                raise RuntimeError(f"injected failure after group {g}")

        if fail_after_group is not None:
            # deterministic sequential commits for the resume test
            for g in todo:
                write_group(g)
        else:
            # independent concurrent job submissions — the scheduler
            # interleaves group stages so the cluster stays saturated;
            # each group is still an independent commit point (resume)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=4) as ex:
                list(ex.map(write_group, todo))
        enriched.unpersist()
    else:
        docs_stage()

    # -- stage: term dictionary --------------------------------------------
    postings_path = os.path.join(index_dir, "postings")
    termdict_path = os.path.join(index_dir, "termdict")
    if not man.done("termdict"):
        blocks = spark.read.option("basePath", postings_path).parquet(
            postings_path
        )
        td = blocks.groupBy("term").agg(
            F.first("bucket").alias("bucket"),
            F.sum("n").cast("long").alias("df"),
            F.sum("cf").cast("long").alias("cf"),
            F.count("*").cast("int").alias("n_blocks"),
            F.max("max_weight").alias("max_weight"),
        )
        from pyspark.sql import Observation

        tobs = Observation()
        td.observe(tobs, F.count(F.lit(1)).alias("terms")).write.mode(
            "overwrite"
        ).parquet(termdict_path)
        man.mark("termdict", terms=int(tobs.get["terms"] or 0))

    # -- stage: stored-fields sidecar (opt-in) --------------------------------
    if store_content and not man.done("stored"):
        if tables.survivors is None:
            raise ValueError(
                "store_content=True needs tables.survivors (docid, content)"
            )
        from .stored import write_stored_fields

        write_stored_fields(
            spark, tables.survivors.select("docid", "content"), index_dir
        )
        man.mark("stored")

    # -- stage: mergeinfo ---------------------------------------------------
    if not man.done("mergeinfo"):
        n_terms = man.data["stages"]["termdict"]["terms"]
        info = {
            "version": 1,
            "n_total": stats["n_total"],
            "n_survivors": stats["n_survivors"],
            "avgdl": stats["avgdl"],
            # integer avgdl numerator; lets segment readers compose the
            # union mean exactly (index/segments.py).  Falls back to
            # round(avgdl*n) for indexes written before this field.
            "token_sum": int(
                stats.get(
                    "token_sum",
                    round(stats["avgdl"] * stats["n_survivors"]),
                )
            ),
            "n_terms": n_terms,
            "posting_block": POSTING_BLOCK,
            "n_buckets": N_TERM_BUCKETS,
            "importance_payload": bool(store_importance),
        }
        with open(os.path.join(index_dir, "mergeinfo.json"), "w") as f:
            json.dump(info, f, indent=1, sort_keys=True)
        man.mark("mergeinfo", **info)
        man.data["complete"] = True
        man.save()
    return man.data


# --------------------------------------------------------------------------
# reader


@dataclass
class IndexShards:
    """Query-side handle to an on-disk index (analogue of lib/reader.py's
    ``initialize``, but every piece stays a lazy DataFrame)."""

    blocks: DataFrame    # block rows incl. group/bucket partition columns
    termdict: DataFrame
    docs: DataFrame
    stats: dict = field(default_factory=dict)


def load_index(spark: SparkSession, index_dir: str,
               cache_meta: bool = True) -> IndexShards:
    """Open an on-disk index.

    ``cache_meta`` persists the termdict and docs tables (compressed
    columnar, MEMORY_AND_DISK): every query batch hits both — termdict
    for df lookups, docs for lengths/quality — so keeping them resident
    is the Spark-native analogue of the reference's in-RAM seek dict +
    LRU postings cache (lib/reader.py:229-259).  Lazy: the first batch
    fills the cache, later batches skip the parquet scan.  Block
    payloads stay on disk — bucket/row-group pruning already bounds
    what a query reads, and at web scale they don't fit memory.
    """
    with open(os.path.join(index_dir, "mergeinfo.json")) as f:
        stats = json.load(f)
    postings_path = os.path.join(index_dir, "postings")
    termdict = spark.read.parquet(os.path.join(index_dir, "termdict"))
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    if cache_meta:
        from pyspark import StorageLevel

        termdict = termdict.persist(StorageLevel.MEMORY_AND_DISK)
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    return IndexShards(
        blocks=spark.read.option("basePath", postings_path).parquet(
            postings_path
        ),
        termdict=termdict,
        docs=docs,
        stats=stats,
    )


def fetch_postings(shards: IndexShards, terms,
                   with_importance: bool = False) -> DataFrame:
    """Decoded postings for a term set, with shard pruning.

    The bucket filter prunes parquet partitions (group=G/bucket=B dirs);
    the term filter prunes row groups via parquet min/max stats.  This is
    the Spark-native replacement for the reference's in-RAM seek
    dictionary + per-term fseek (lib/reader.py:229-259).
    ``with_importance=True`` (importance-payload indexes only) adds
    the decoded ``important`` column.  The payload FLAVOR is detected
    from mergeinfo (``shards.stats['importance_payload']``): a plain
    read of an importance index decodes the trailing section and
    drops it, so every positions consumer works on either format;
    asking for importance from a plain index raises (the bits aren't
    there).
    """
    has_imp = bool(shards.stats.get("importance_payload"))
    if with_importance and not has_imp:
        raise ValueError(
            "with_importance=True needs an importance-payload index"
        )
    schema = DECODE_SCHEMA_IMP if with_importance else DECODE_SCHEMA
    terms = list(terms)
    if not terms:
        return shards.blocks.sparkSession.createDataFrame([], schema)
    buckets = buckets_of(shards.blocks.sparkSession, terms)
    want = shards.blocks.filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    decoded = want.select("term", "payload").mapInArrow(
        decode_blocks_imp if has_imp else decode_blocks,
        schema=DECODE_SCHEMA_IMP if has_imp else DECODE_SCHEMA,
    )
    if has_imp and not with_importance:
        decoded = decoded.drop("important")
    return decoded


def buckets_of(spark: SparkSession, terms) -> list[int]:
    """Shard buckets for a term list, computed with the SAME xxhash64 the
    writer used (Spark's JVM implementation — evaluated on a tiny local
    DataFrame so driver and executors can never disagree on the hash)."""
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = tdf.select(term_bucket_col().alias("b")).distinct().collect()
    return [r["b"] for r in rows]
