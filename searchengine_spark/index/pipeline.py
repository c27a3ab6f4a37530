"""Corpus → index tables, expressed Spark-first.

Replaces the reference's single-threaded walk + in-RAM dict build
(makeindex.py:49-266) with declarative DataFrame stages:

  corpus (repo, path, commit, lang, content)     [input_hint shape]
    → assign_docids        dense deterministic ids, no global-sort window
    → empty filter         (makeindex.py:116-122; id already consumed)
    → sha256 exact dedup   (input_hint invariant; keep lowest docid)
    → simhash near-dup     (banded LSH self-join, local-min rule)
    → analyze mapInPandas  postings w/ positions, map-side TF (no token shuffle)
    → docs / termdict / edges / stats

Scale notes (10^12 rows):
 - docid assignment is two-phase (range-partition + per-partition offsets),
   NOT a single-partition row_number window; cost = one range shuffle +
   a P-row collect.
 - dedup shuffles hash on sha256 / band values; AQE skew-join enabled.
 - the analyze UDF emits per-doc aggregated (term, tf, positions) rows so
   raw token occurrences never hit a shuffle.
"""

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..params import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HAMMING,
)
from ..text.udfs import (
    POSTINGS_SCHEMA,
    SIMHASH_SCHEMA,
    make_simhash_partition,
)

CORPUS_KEY = ["repo", "path", "commit"]

IMPORT_PATTERN = r"(?m)^import\s+(\S+):(\S+)\s*$"


@dataclass
class IndexTables:
    ids: DataFrame = None        # (docid, repo, path, commit, lang) — ALL
    survivors: DataFrame = None  # (docid, repo, path, commit, lang, content, sha256)
    postings: DataFrame = None   # (docid, term, tf, positions, important)
    docs: DataFrame = None       # (docid, url, total_tokens, qualities)
    termdict: DataFrame = None   # (term, df, cf)
    edges: DataFrame = None      # (src, dst)
    stats: dict = field(default_factory=dict)


def assign_docids(
    corpus: DataFrame, n_parts: int | None = None, order: str = "lexical",
    with_count: bool = False,
):
    """Dense 1-based docid = rank of (repo, path, commit) in a canonical
    total order.  Two-phase, cluster-size independent (SURVEY.md §1.2):
    bucket the key space into contiguous ranges, count rows per bucket
    (P-row collect), then docid = bucket offset + intra-bucket
    row_number.  Replaces the reference's file-walk-order id
    (makeindex.py:108).

    ``order='lexical'``: rank in (repo, path, commit) sort order via
    ``repartitionByRange`` — human-meaningful ids, but the range
    partitioner needs a sampling pass over the data to find boundaries.

    ``order='hash'``: rank in xxhash64(key) order — the web-scale mode:
    bucket = top-k bits of the hash, so boundaries are STATIC (uniform
    hash → balanced buckets, no sampling pass, no skew by construction);
    ids stay dense, deterministic, and independent of the partition
    count, they just follow hash order instead of lexicographic.

    The ranking runs over a NARROW (repo, path, commit) projection and
    the resulting (key, docid) map is joined back to the corpus: the
    range/bucket shuffle and the internal cache hold keys only, never
    content (the dominant byte-width).  AQE broadcasts the map when it
    is small; at 10^12 rows the join degrades to the one content
    shuffle the old rank-the-full-rows plan always paid.  Requires
    (repo, path, commit) to be a key — duplicates would already make
    the old plan's intra-tie row_number order nondeterministic, and
    corpus producers (testdata, segment appends) guarantee uniqueness.
    The join-back is NULL-SAFE (<=>): a row with a NULL key column is
    counted by the map (it consumes a dense id) and must come back —
    a plain equi-join would silently drop the document while keeping
    its id, which the old rank-the-full-rows plan never did.
    """
    spark = corpus.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)

    keys = corpus.select(*CORPUS_KEY)
    if order == "hash":
        k = max(4, (n_parts * 4 - 1).bit_length())
        h = F.xxhash64(*CORPUS_KEY)
        # xor with INT64_MIN maps unsigned order onto signed order, so
        # ORDER BY _u == unsigned hash order == contiguous bucket ranges
        bucketed = keys.withColumn(
            "_u", h.bitwiseXOR(F.lit(-(1 << 63)))
        ).withColumn("_pid", F.shiftrightunsigned(h, 64 - k).cast("int"))
        w = Window.partitionBy("_pid").orderBy("_u", *CORPUS_KEY)
        part = bucketed.repartition(n_parts, "_pid").persist()
    else:
        part = (
            keys.repartitionByRange(n_parts, *CORPUS_KEY)
            .withColumn("_pid", F.spark_partition_id())
            .persist()
        )
        w = Window.partitionBy("_pid").orderBy(*CORPUS_KEY)

    counts ={r["_pid"]: r["cnt"] for r in
              part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
    )
    idmap = (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("docid", (F.col("_off") + F.col("_rn")).cast("long"))
        .select(
            *[F.col(c).alias(f"_k_{c}") for c in CORPUS_KEY], "docid"
        )
    )
    # <=> stays an equi-join for planning (hash/sort-merge eligible);
    # the aliased map columns avoid self-join attribute ambiguity
    out = corpus.join(
        idmap,
        [corpus[c].eqNullSafe(F.col(f"_k_{c}")) for c in CORPUS_KEY],
    ).drop(*[f"_k_{c}" for c in CORPUS_KEY])
    # the bucket-count collect already knows the corpus size — callers
    # take it here instead of paying a separate count() job
    return (out, acc) if with_count else out


def _dedup_exact(ids: DataFrame) -> DataFrame:
    """sha256 exact dedup, keep lowest docid (input_hint invariant replaces
    the reference's CRC32+length hash, lib/duphash.py:80-92).

    The min-per-sha window runs over a (docid, sha256) projection — the
    full-content rows never shuffle on sha256 (content is the dominant
    byte-width in the corpus, and shuffle bandwidth is the build's
    scaling ceiling).  The drop-set anti-join runs on docid: at typical
    dup rates AQE converts it to a broadcast join with an
    ``AQEShuffleRead local`` on the content side (plan-verified) — the
    content rows are written once to node-local shuffle storage but
    never redistributed across the network, the scarce resource at
    cluster scale.  In the worst case (huge drop set) it degrades to
    the one full-row exchange the old window-over-content plan always
    paid.
    """
    hashed = ids.withColumn("sha256", F.sha2(F.col("content"), 256))
    w = Window.partitionBy("sha256").orderBy("docid")
    dropped = (
        hashed.select("docid", "sha256")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .select("docid")
    )
    return hashed.join(dropped, "docid", "left_anti")


def _dedup_simhash(alive: DataFrame, bits: int = SIMHASH_BITS):
    """Near-dup removal: simhash, Hamming<=3 (lib/duphash.py:97-141),
    exhaustive banded self-join with the deterministic local-min rule
    (keep a doc iff no similar doc has a smaller docid) — replaces the
    reference's order-dependent 200-doc window (makeindex.py:72-78).

    ``bits=32`` is reference parity (the oracle's semantics); ``bits=64``
    is the scale variant — same Hamming threshold, 4×16-bit bands, so
    the LSH key space is 65536 per band instead of 256 (the 32-bit band
    join degrades to O(n²/256) on large corpora, text/simhash.py).

    Returns ``(survivors, fps)``.  The fingerprint pass emits ONLY
    (docid, fingerprint) — 16 B/doc, persisted — so content crosses the
    Arrow pipe once and is never round-tripped back out of Python; a
    content-passthrough pass would also sit on both sides of the
    anti-join below and run the whole tokenize+hash twice (no common
    subplan reuse across join sides).  ``fps`` is joined to the NARROW
    docs projection at build_tables (stored for cross-segment
    compaction, index/segments.py) — never to content-width rows.
    """
    fps = (
        alive.select("docid", "content")
        .mapInPandas(make_simhash_partition(bits), schema=SIMHASH_SCHEMA)
        .persist()
    )
    survivors = alive.join(simhash_dropped(fps, bits), "docid", "left_anti")
    return survivors, fps


def simhash_dropped(fps: DataFrame, bits: int) -> DataFrame:
    """(docid) of every doc with a similar (Hamming<=SIMHASH_HAMMING)
    doc of SMALLER docid in ``fps`` (docid, fingerprint) — the banded
    LSH self-join + local-min rule, shared by the build-time dedup and
    cross-segment compaction (index/segments.py)."""
    width = bits // SIMHASH_BANDS
    mask = (1 << width) - 1
    band_rows = fps.select(
        "docid",
        "fingerprint",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftrightunsigned(
                        F.col("fingerprint"), bits - width * (i + 1)
                    ).bitwiseAND(F.lit(mask)).alias("band_val"),
                )
                for i in range(SIMHASH_BANDS)
            ])
        ).alias("band"),
    ).select("docid", "fingerprint", "band.band_id", "band.band_val")

    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.docid") < F.col("b.docid")),
        )
        .filter(
            F.bit_count(
                F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
            )
            <= SIMHASH_HAMMING
        )
        .select(F.col("b.docid").alias("docid"))
        .distinct()
    )


def build_tables(
    spark: SparkSession,
    corpus: DataFrame,
    compute_quality: bool = True,
    n_parts: int | None = None,
    simhash_bits: int = SIMHASH_BITS,
    id_order: str = "lexical",
    stem: bool = True,
    near_dup: bool = True,
    docid_offset: int = 0,
    known_sha: DataFrame | None = None,
    importance_fn=None,
) -> IndexTables:
    """Run the full build pipeline; returns lazy DataFrames + stats.

    ``simhash_bits``: 32 = reference/oracle parity (default); 64 = the
    web-scale near-dup variant (see _dedup_simhash).
    ``id_order``: 'lexical' = oracle parity; 'hash' = samplerless
    web-scale id assignment (see assign_docids).
    ``stem=False, near_dup=False``: the fully SQL-expressible variant —
    unstemmed regex tokens (DuckDB has no Porter offline) and no simhash
    stage (CRC-64 sign-sum isn't ANSI-SQL); exact sha256 dedup, docid
    assignment, stats, and the whole query chain stay identical, so the
    driver's DuckDB oracle can check the END-TO-END engine.
    ``docid_offset`` / ``known_sha``: incremental-segment hooks
    (index/segments.py) — ids continue an existing dense space, and docs
    whose sha256 already exists in prior segments are dropped (their
    ids consumed, the same rule as every other filter stage).
    ``importance_fn``: opt-in field extraction (e.g.
    text.importance.extract_importance) — postings carry the per-term
    priority in ``important`` instead of the reference-parity constant
    0, enabling the BM25F-style scorer (query/scoring.py,
    params.IMPORTANCE).
    """
    ids, n_total = assign_docids(
        corpus, n_parts=n_parts, order=id_order, with_count=True
    )
    if docid_offset:
        ids = ids.withColumn(
            "docid", F.col("docid") + F.lit(int(docid_offset))
        )
    ids.persist()

    # emptiness = no non-whitespace character (python str.strip() parity —
    # F.trim strips spaces only, so a regex class is needed for \t\n)
    nonempty = ids.filter(
        F.length(F.regexp_replace(F.col("content"), r"\s", "")) > 0
    )
    alive = _dedup_exact(nonempty)
    if known_sha is not None:
        alive = alive.join(
            known_sha.select("sha256"), "sha256", "left_anti"
        )
    if near_dup:
        survivors, fps = _dedup_simhash(alive, bits=simhash_bits)
        survivors = survivors.persist()
    else:
        survivors = alive.persist()
        fps = None

    from ..text.udfs import make_analyze_partition_arrow

    analyze_cols = ["docid", "content"] + (
        ["path"] if importance_fn is not None else []
    )
    postings_full = (
        survivors.select(*analyze_cols)
        .mapInArrow(
            make_analyze_partition_arrow(
                stem=stem, importance_fn=importance_fn
            ),
            schema=POSTINGS_SCHEMA,
        )
        .persist()
    )
    # total_tokens rides along so the index writer can compute BM25
    # doc-length weights without re-joining docs (one less shuffle of
    # the full postings set)
    postings = postings_full.select(
        "term", "docid", "tf", "positions", "important", "total_tokens"
    )

    doc_lengths = postings_full.select("docid", "total_tokens").distinct()
    docs = survivors.select(
        "docid",
        F.concat_ws(
            "", F.col("repo"), F.lit("/"), F.col("path"),
            F.lit("@"), F.col("commit"),
        ).alias("url"),
        "repo", "path", "commit", "sha256",
    )
    # fingerprint joins onto the NARROW docs projection (16 B/doc), never
    # onto content-width rows — stored for cross-segment compaction
    if fps is not None:
        docs = docs.join(fps, "docid", "left")
    else:
        docs = docs.withColumn("fingerprint", F.lit(None).cast("long"))
    docs = (
        docs.join(doc_lengths, "docid", "left")
        .withColumn("total_tokens", F.coalesce("total_tokens", F.lit(0)))
        .withColumn("pr_quality", F.lit(1.0))
        .withColumn("hub_quality", F.lit(1.0))
        .withColumn("auth_quality", F.lit(1.0))
    )

    termdict = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )

    # edges: import extraction (code-corpus analogue of <a href> links,
    # makeindex.py:179-187) resolved against surviving (repo, path) —
    # the reference drops dangling/unknown targets (lib/reader.py:136-143)
    imports = (
        survivors.select(
            "docid",
            F.arrays_zip(
                F.regexp_extract_all(F.col("content"), F.lit(IMPORT_PATTERN), 1),
                F.regexp_extract_all(F.col("content"), F.lit(IMPORT_PATTERN), 2),
            ).alias("imp"),
        )
        .select("docid", F.explode("imp").alias("i"))
        .select(
            F.col("docid").alias("src"),
            F.col("i")["0"].alias("t_repo"),
            F.col("i")["1"].alias("t_path"),
        )
    )
    targets = survivors.select(
        F.col("docid").alias("dst"),
        F.col("repo").alias("t_repo"),
        F.col("path").alias("t_path"),
    )
    edges = (
        imports.join(targets, ["t_repo", "t_path"])
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )

    srow = docs.agg(
        F.count("*").alias("n"),
        F.avg("total_tokens").alias("avgdl"),
        F.sum("total_tokens").alias("tok"),
    ).first()
    # token_sum: the integer numerator of avgdl.  Segment readers
    # (index/segments.py) compose the union avgdl from per-segment
    # integer sums — Σtok/Σn is then bit-identical to a monolithic
    # rebuild's mean, where a weighted mean of per-segment avgdl floats
    # would not be.
    stats = {
        "n_total": n_total,
        "n_survivors": srow["n"],
        "avgdl": float(srow["avgdl"] or 0.0),
        "token_sum": int(srow["tok"] or 0),
    }

    tables = IndexTables(
        ids=ids.select("docid", *CORPUS_KEY, "lang"),
        survivors=survivors,
        postings=postings,
        docs=docs,
        termdict=termdict,
        edges=edges,
        stats=stats,
    )

    if compute_quality:
        from ..graph.pagerank import pagerank_df
        from ..graph.hits import hits_df

        universe = tables.ids.select("docid")
        pr = pagerank_df(spark, universe, edges, n_total)
        ha = hits_df(spark, universe, edges)
        tables.docs = (
            tables.docs.drop("pr_quality", "hub_quality", "auth_quality")
            .join(pr, "docid", "left")
            .join(ha, "docid", "left")
            .withColumn("pr_quality", F.coalesce("pr_quality", F.lit(1.0)))
            .withColumn("hub_quality", F.coalesce("hub_quality", F.lit(1.0)))
            .withColumn("auth_quality", F.coalesce("auth_quality", F.lit(1.0)))
        )
    tables.docs = tables.docs.persist()
    return tables
