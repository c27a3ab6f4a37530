"""Similarity search / embedding operators (training-data pipeline).

Brute-force cosine top-k lives in textops.ann_cosine_topk (the exact
baseline).  Here: embedding-cosine near-dup pairs and an IVF-bucketed
ANN variant — the scale path: assignment to a coarse quantizer turns the
O(n²) search into (n_probe/n_centroids)-fraction scans, and every stage
is a join/agg on centroid keys (no driver loops).  Centroid choice is
deterministic (fixed-stride vec_ids) so the DuckDB oracle can mirror the
whole pipeline value-for-value; on a real corpus the centroids would
come from a k-means job, with identical downstream plumbing.

All cosine math is float64; ranking tie-break is (cosine desc, id asc).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

CENTROID_STRIDE = 50
NPROBE = 3

# sign-LSH blocking (embedding_neardup_lsh): bands × bits-per-band.
# Recall at cosine c is 1-(1-p^BITS)^BANDS with p = 1 - acos(c)/pi; at
# the test threshold 0.4 these defaults give ~0.94.  At web scale BITS
# grows with log2(n) (collisions per band scale n²/2^BITS) — the knob
# trades recall for candidate volume, the plan shape is unchanged.
LSH_BANDS = 16
LSH_BITS = 4
EMB_DIM = 64


def hyperplanes(n_planes: int, dim: int):
    """Deterministic Rademacher (±1) hyperplanes from md5 — a pure
    function with no RNG state, so the Spark engine and the DuckDB
    oracle share the exact same projection literals."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for i in range(n_planes)
    ]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_neardup(spark: SparkSession, sf_dir: str,
                      threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    TEST-SCALE EXACT VERIFIER ONLY: this is an unblocked all-pairs
    self-join (O(n²)).  The scale path is :func:`embedding_neardup_lsh`
    — same cosine predicate behind sign-LSH band blocking; this variant
    exists as its recall baseline (tests/test_ops.py) and as the
    exhaustive driver oracle entry at sf0.01.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.select(
            "a", "b", F.round(_cosine("va", "vb"), 5).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def lsh_band_keys(emb: DataFrame, n_bands: int = LSH_BANDS,
                  band_bits: int = LSH_BITS, dim: int = EMB_DIM,
                  vec_col: str = "embedding") -> DataFrame:
    """(vec_id, embedding, band, key): sign-LSH bucket keys.

    band b's key packs ``band_bits`` sign bits — bit t is set iff
    dot(v, hyperplane[b*band_bits+t]) > 0.  Dot products are sequential
    left-folds on both engines (F.aggregate here, list_dot_product in
    DuckDB), so the signs are bit-identical across the oracle boundary.
    """
    planes = hyperplanes(n_bands * band_bits, dim)
    band_structs = []
    for bd in range(n_bands):
        key = F.lit(0)
        for t in range(band_bits):
            p = planes[bd * band_bits + t]
            dot = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in p]))
            key = key + F.when(dot > 0, F.lit(1 << t)).otherwise(F.lit(0))
        band_structs.append(
            F.struct(F.lit(bd).alias("band"), key.alias("key"))
        )
    return emb.select(
        "vec_id", vec_col, F.explode(F.array(*band_structs)).alias("bk")
    ).select("vec_id", vec_col, F.col("bk.band"), F.col("bk.key"))


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str,
                          threshold: float = 0.4,
                          n_bands: int = LSH_BANDS,
                          band_bits: int = LSH_BITS) -> DataFrame:
    """Scale-path near-dup: sign-LSH band blocking → exact cosine filter.

    Candidate pairs come from a shuffle join on (band, key) — the same
    shape as dedup.minhash_pairs: no corpus-wide all-pairs product,
    but WITHIN a bucket the join is all-pairs, so this is the
    bounded-report form (a cluster of m near-identical embeddings in
    one sign bucket emits O(m²) candidate rows).  Connectivity
    consumers (components/drop sets) should use
    :func:`embedding_star_edges` — linear per bucket, identical
    components.  The exact cosine then keeps pairs >= threshold.
    Output ⊆ embedding_neardup's with recall 1-(1-p^bits)^bands
    (deterministic here — fixed hyperplanes — and pinned by
    tests/test_ops.py against the exhaustive baseline).
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    bands = lsh_band_keys(emb, n_bands, band_bits)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("a.embedding").alias("va"),
            F.col("b.vec_id").alias("b"),
            F.col("b.embedding").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.select(
            "a", "b", F.round(_cosine("va", "vb"), 5).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def embedding_star_edges(spark: SparkSession, sf_dir: str,
                         n_bands: int = LSH_BANDS,
                         band_bits: int = LSH_BITS) -> DataFrame:
    """(a, b) min-hub star edges per sign-LSH bucket, a < b distinct —
    the LINEAR candidate shape for connectivity consumers
    (dedup.dup_clusters over embedding buckets, drop-the-non-min
    dedup policies), exactly dedup.minhash_star_edges' construction
    on the embedding side: per (band, key) bucket emit only
    (bucket_min, member), so a template cluster of m near-identical
    embeddings contributes m−1 edges instead of m²/2.  Components and
    "has a smaller-id bucket-mate" drop sets equal the all-pairs
    candidate form's (the minhash_star_edges docstring proof applies
    verbatim — union of per-bucket cliques and per-bucket stars
    connect identical vertex sets).

    NOTE: star edges carry NO cosine — they encode BUCKET
    connectivity (the unverified candidate relation).  A consumer
    needing pairwise-verified similarity uses the bounded
    embedding_neardup_lsh report instead.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    bands = lsh_band_keys(emb, n_bands, band_bits).select(
        "vec_id", "band", "key"
    )
    mins = bands.groupBy("band", "key").agg(
        F.min("vec_id").alias("a")
    )
    return (
        bands.join(mins, ["band", "key"])
        .filter(F.col("vec_id") > F.col("a"))
        .select("a", F.col("vec_id").alias("b"))
        .distinct()
    )


KMEANS_ITERS = 3
KMEANS_ROUND = 6


def kmeans_centroids(spark: SparkSession, emb: DataFrame,
                     stride: int = CENTROID_STRIDE,
                     iters: int = KMEANS_ITERS,
                     dim: int = EMB_DIM):
    """Deterministic distributed k-means (cosine assignment, mean
    update) for IVF coarse quantization.

    Fully join/agg — no driver-side data pass: each iteration broadcasts
    the k×dim centroid literals, assigns every vector to its max-cosine
    centroid (tie: lowest cid), and recomputes means via posexplode →
    groupBy(cid, pos) → avg (k×dim rows collected — centroid-sized, not
    data-sized).  Determinism contract with the SQL oracle: init =
    first n_clusters vectors in vec_id order, fixed iteration count,
    means rounded to KMEANS_ROUND decimals each iteration (absorbs
    sum-order ulp noise across engines); empty clusters keep their
    previous centroid.

    Init = the fixed-stride vectors ann_ivf_topk uses as-is (cid = rank
    of vec_id among the stride ids), so the trained variant is a strict
    refinement of the stand-in quantizer.

    :return: list of python float lists (row i = centroid of cid i).
    """
    init = (
        emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .collect()
    )
    spark_ = emb.sparkSession
    cents = [[float(x) for x in r["embedding"]] for r in init]
    for _ in range(iters):
        # centroids enter the plan as a BROADCAST-JOINED DataFrame, not
        # k×dim exploded literals: at k in the thousands the literal
        # arrays bloat the plan (analysis/codegen cost), while a
        # broadcast of k rows is exactly what the executor needs.
        # Values are identical either way (python floats are exact
        # float64 through createDataFrame and F.lit alike).
        cent_df = spark_.createDataFrame(
            [(ci, cv) for ci, cv in enumerate(cents)],
            "cid int, cv array<double>",
        )
        cdf = emb.crossJoin(F.broadcast(cent_df)).select(
            "vec_id", "embedding", "cid",
            _cosine("embedding", F.col("cv")).alias("ccos"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
        assigned = (
            cdf.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cid", F.posexplode("embedding").alias("pos", "x"))
        )
        rows = (
            assigned.groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")),
                         KMEANS_ROUND).alias("m"))
            .collect()
        )
        nxt = [list(c) for c in cents]  # empty cluster → keep previous
        upd = {}
        for r in rows:
            upd.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        for cid, d in upd.items():
            nxt[cid] = [d[j] for j in range(dim)]
        cents = nxt
    return cents


def _kmeans_assigned(spark: SparkSession, emb: DataFrame):
    """(assigned, centroids): every vector joined to its nearest
    trained-k-means centroid (broadcast join, not k×dim literals — see
    kmeans_centroids; lowest-cid tie-break) — shared by
    ann_ivf_kmeans_topk and ivf_stats so the assignment rule cannot
    fork."""
    cents = kmeans_centroids(spark, emb)
    cent_df = spark.createDataFrame(
        [(ci, cv) for ci, cv in enumerate(cents)],
        "cid int, cv array<double>",
    )
    cdf = emb.crossJoin(F.broadcast(cent_df)).select(
        "vec_id", "embedding", "cid",
        _cosine("embedding", F.col("cv")).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    assigned = (
        cdf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    return assigned, cents


def ivf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cid, n_vecs, frac) — IVF cell-occupancy observability: how
    many vectors each trained cell holds and its corpus fraction
    (round-6 over exact integer counts).  The drift/retrain signal an
    IVF deployment watches: append_ivf never retrains (by design), so
    as appended data drifts, occupancy skews — max(frac)·k far above 1
    means probes scan ever-fatter cells and it is time for the
    rebuild/compact retrain.  The index_stats sibling for the vector
    side.

    Scale: the assignment pass is the broadcast-centroid join the ANN
    path already does; the stats are one key-hash count agg."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assigned, _ = _kmeans_assigned(spark, emb)
    total = emb.count()
    return (
        assigned.groupBy("cid")
        .agg(F.count("*").cast("long").alias("n_vecs"))
        .select(
            F.col("cid").cast("long").alias("cid"),
            "n_vecs",
            F.round(
                F.col("n_vecs").cast("double") / F.lit(float(total)), 6
            ).alias("frac"),
        )
        .orderBy("cid")
    )


def ann_ivf_kmeans_topk(spark: SparkSession, sf_dir: str,
                        query_vec_id: int = 0, k: int = 10,
                        nprobe: int = NPROBE) -> DataFrame:
    """IVF ANN with TRAINED coarse quantizer: deterministic k-means
    centroids (kmeans_centroids) instead of ann_ivf_topk's fixed-stride
    stand-ins; probe/scan structure is identical (broadcast assignment →
    nprobe-pruned exact rescoring, no driver loop over data)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assigned, cents = _kmeans_assigned(spark, emb)
    probes = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .crossJoin(
            spark.createDataFrame(
                [(ci, cv) for ci, cv in enumerate(cents)],
                "cid int, cv array<double>",
            )
        )
        .select("cid", "qv", _cosine("qv", "cv").alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(nprobe)
    )
    cands = assigned.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(probes.select("cid", "qv")), "cid"
    )
    return (
        cands.select(
            "vec_id",
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def build_ivf_index(spark: SparkSession, emb: DataFrame, out_dir: str,
                    stride: int = CENTROID_STRIDE,
                    iters: int = KMEANS_ITERS,
                    dim: int = EMB_DIM) -> None:
    """Persist an IVF index: build once, serve many — the vector-side
    analogue of write_index for the inverted index.

    Layout: ``out_dir/cells`` = (vec_id, embedding) parquet PARTITIONED
    BY the assigned centroid id (a probe reads only its cells via
    partition pruning, never a full scan), ``out_dir/centroids.parquet``
    = (cid, cv).  Centroids are written LAST: their presence marks a
    complete index (cells alone = crashed build, rebuilt on next call).

    ann_ivf_kmeans_topk recomputes training + assignment per query —
    correct, but O(n·k·iters) per query.  At 100 TB the quantizer is
    trained once and queries touch nprobe/k of the data; this persists
    exactly that split.  Assignment semantics (max cosine, tie lowest
    cid) and the 6-decimal centroid rounding contract are unchanged, so
    a probe-identical query returns the IDENTICAL ranking — the driver
    entry shares ann_ivf_kmeans_topk's DuckDB oracle.

    Rebuild-in-place over a MAINTAINED index (one that has appended
    generations/tombstones) resets the maintenance state first: the
    completeness marker and manifest are removed (readers see an
    honest incomplete-index error for the duration, exactly the
    crashed-build semantics), every committed/orphan cells_g*/tombs_*
    dir is dropped, and the fresh build commits a reset manifest.  The
    committed batch-tag history is PRESERVED across the rebuild: a
    crashed stream whose micro-batch data the rebuild already consumed
    must still no-op on replay (the same reason tags survive
    compact_ivf).
    """
    import os
    import shutil

    old = _ivf_manifest(out_dir)
    had_state = os.path.exists(os.path.join(out_dir, IVF_MANIFEST))
    if had_state or os.path.isdir(os.path.join(out_dir, "cells")):
        # reset protocol: kill the completeness marker FIRST (readers
        # refuse incomplete indexes), then the manifest, then the old
        # maintenance dirs — a crash anywhere mid-rebuild leaves an
        # index that reads as crashed-build and is rebuilt on retry
        for marker in (
            os.path.join(out_dir, "centroids.parquet", "_SUCCESS"),
            os.path.join(out_dir, IVF_MANIFEST),
        ):
            try:
                os.remove(marker)
            except OSError:
                pass
        for entry in os.listdir(out_dir):
            p = os.path.join(out_dir, entry)
            if os.path.isdir(p) and (
                entry.startswith("cells_g") or entry.startswith("tombs_t")
            ):
                shutil.rmtree(p, ignore_errors=True)
        # the PQ codebook derives from the (old) corpus — a retrain on
        # new data would silently serve stale ADC tables; callers
        # re-attach after the rebuild
        shutil.rmtree(os.path.join(out_dir, PQ_CODEBOOK),
                      ignore_errors=True)

    cents = kmeans_centroids(spark, emb, stride, iters, dim)
    cent_df = spark.createDataFrame(
        [(ci, cv) for ci, cv in enumerate(cents)],
        "cid int, cv array<double>",
    )
    _assign_cells(emb, cent_df).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(os.path.join(out_dir, "cells"))
    cent_df.write.mode("overwrite").parquet(
        os.path.join(out_dir, "centroids.parquet")
    )
    if had_state and old.get("batches"):
        _ivf_commit(
            out_dir,
            {"base": "cells", "generations": [], "tombstones": [],
             "gc": [], "batches": old["batches"]},
        )


def _assign_cells(emb: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Apply the coarse quantizer: assign every vector to its max-cosine
    centroid, tie-break lowest cid — the shared quantizer-application
    step of build_ivf_index and append_ivf (one broadcast join over the
    k-row centroid set, never a literal explosion)."""
    cdf = emb.crossJoin(F.broadcast(cent_df)).select(
        "vec_id", "embedding", "cid",
        _cosine("embedding", F.col("cv")).alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    return (
        cdf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )


IVF_MANIFEST = "ivf_segments.json"


def _ivf_manifest(index_dir: str) -> dict:
    """Committed maintenance state of a persisted IVF index:
    ``base`` (the original — or compacted — cells dir), ``generations``
    (appended cell dirs, in commit order), ``tombstones`` (deleted
    vec_id parquet dirs) and ``gc`` (dirs replaced by the LAST
    compaction, kept on disk for one compaction interval so replicas
    holding the previous manifest keep serving — the next compaction
    deletes them).  Directories named nowhere are orphans from a
    crashed append/delete/compact — readers never see them and the
    next writer overwrites or GCs them."""
    import json
    import os

    m = {"base": "cells", "generations": [], "tombstones": [],
         "batches": [], "gc": []}
    mp = os.path.join(index_dir, IVF_MANIFEST)
    if os.path.exists(mp):
        with open(mp) as f:
            m.update(json.load(f))
    return m


def _ivf_commit(index_dir: str, manifest: dict) -> None:
    """Atomically publish a manifest (write-then-rename) — the commit
    point of every IVF maintenance operation."""
    import json
    import os
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=index_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, IVF_MANIFEST))


def append_ivf(spark: SparkSession, emb_new: DataFrame,
               index_dir: str, batch_tag: str | None = None):
    """Append new vectors to a persisted IVF index WITHOUT retraining:
    assign them with the stored centroids (the identical quantizer
    application as build time, _assign_cells) and commit them as a new
    cell generation — the vector-side analogue of the inverted index's
    append_segment (index/segments.py).

    Crash-safe single-writer protocol (same shape as the text-index
    segments): the generation parquet is written first, then the
    manifest commits it via an atomic rename — a crash between the two
    leaves an orphan directory that readers ignore and the next append
    overwrites.  Queries over the appended index are ranking-identical
    to one quantizer pass over the union set (tests/test_ops.py):
    append changes WHEN vectors were added, never the answer — the
    reference behavior being mirrored is Lucene-style segment append,
    not any reference-repo feature (the reference has no vector index).

    Caller contract: vec_ids unique across generations (the same key
    contract as docids); the quantizer is NOT retrained, so recall
    degrades if the appended distribution drifts far from the training
    set — rebuild via build_ivf_index to retrain (documented tradeoff).

    ``batch_tag`` makes the append IDEMPOTENT per tag: a tag already in
    the manifest is a no-op (returns None).  The streaming front-end
    (streaming/ivf.py) tags each micro-batch so a crash between the
    manifest commit and the stream's checkpoint commit cannot
    double-append the replayed batch.

    An EMPTY ``emb_new`` commits no generation (an empty partitioned
    parquet dir has no readable schema and would poison every later
    read of the index) — with a batch_tag the tag alone is committed
    so the empty batch stays idempotent, without one it is a pure
    no-op.

    :return: the committed generation directory name (None when the
             batch_tag was already committed or the input was empty).
    """
    import os

    cent_path = os.path.join(index_dir, "centroids.parquet")
    if not os.path.exists(os.path.join(cent_path, "_SUCCESS")):
        raise ValueError(
            f"incomplete IVF index at {index_dir}: centroids.parquet "
            "missing (cells alone = crashed build)"
        )
    m = _ivf_manifest(index_dir)
    if batch_tag is not None and batch_tag in m.get("batches", []):
        return None
    if emb_new.isEmpty():
        if batch_tag is not None:
            m.setdefault("batches", []).append(batch_tag)
            _ivf_commit(index_dir, m)
        return None
    if batch_tag is not None:
        m.setdefault("batches", []).append(batch_tag)
    cent_df = spark.read.parquet(cent_path)
    # first cells_g name no committed (or gc-deferred) dir uses —
    # post-compaction the BASE may itself be a cells_g dir, and the
    # previous compaction's replaced dirs are still on disk for
    # replicas: never collide with any of them
    taken = [m["base"]] + m["generations"] + m.get("gc", [])
    n = 1
    while f"cells_g{n}" in taken:
        n += 1
    gname = f"cells_g{n}"
    _assign_cells(emb_new, cent_df).write.mode("overwrite").partitionBy(
        "cid"
    ).parquet(os.path.join(index_dir, gname))
    m["generations"].append(gname)
    _ivf_commit(index_dir, m)
    return gname


def delete_vectors(spark: SparkSession, index_dir: str,
                   vec_ids) -> str:
    """Tombstone vectors out of a persisted IVF index — the vector-side
    analogue of the text index's compact_near_dups tombstones: the
    stored cells are untouched (no rewrite), the reader anti-joins the
    committed tombstone set.  ``vec_ids`` is a DataFrame with a vec_id
    column or an iterable of ids.  Same crash-safe protocol as append:
    tombstone parquet first, manifest rename commits it.

    Caller contract (single-writer, like all index maintenance here):
    tombstoned vec_ids are dead until compact_ivf physically drops them;
    ids are never reused, so a tombstone masking every generation —
    including later appends — is well-defined.

    :return: the committed tombstone directory name.
    """
    import os

    if not isinstance(vec_ids, DataFrame):
        vec_ids = spark.createDataFrame(
            [(int(v),) for v in vec_ids], "vec_id long"
        )
    m = _ivf_manifest(index_dir)
    # first tombs_t name no committed (or gc-deferred) dir uses — a
    # post-compaction delete must not overwrite the previous epoch's
    # tombstone dir while stale replicas can still read it
    taken = m["tombstones"] + m.get("gc", [])
    n = 1
    while f"tombs_t{n}" in taken:
        n += 1
    tname = f"tombs_t{n}"
    vec_ids.select(F.col("vec_id").cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(index_dir, tname))
    m["tombstones"].append(tname)
    _ivf_commit(index_dir, m)
    return tname


def compact_ivf(spark: SparkSession, index_dir: str) -> str:
    """Physically merge a maintained IVF index: rewrite the union of
    all committed generations MINUS tombstones into one fresh base
    cells dir, then commit a manifest with no generations and no
    tombstones — the vector-side analogue of the text index's
    merge_segments.  Centroids are untouched (compaction never
    retrains), so rankings are identical before and after (tested).

    GC is DEFERRED by one compaction interval: the dirs this manifest
    replaces are listed under its ``gc`` key and stay on disk, so a
    Spark-free replica (query/serve_ivf.LocalANN) still holding the
    previous manifest keeps serving correct answers until its next
    ``maybe_refresh`` — the replica contract is "refresh at least once
    per compaction interval".  What IS removed now: the previous
    compaction's gc list and any dirs no manifest ever referenced
    (orphans from crashed appends/deletes).

    Zero survivors (everything tombstoned) commits a NON-partitioned
    empty base — Spark writes a schema-bearing empty parquet file
    without partitionBy but nothing at all with it, and a schema-less
    dir would poison every later read; the empty base still carries
    the cid column so readers' probe filter stays well-formed.

    :return: the new base cells directory name.
    """
    import os
    import shutil

    m = _ivf_manifest(index_dir)
    old_dirs = [m["base"]] + m["generations"] + m["tombstones"]
    # first cells_g name that no committed or gc-deferred dir uses —
    # in particular it must differ from the CURRENT base (a second
    # compaction would otherwise overwrite the directory it is reading
    # from) and from the previous compaction's still-served leftovers
    taken = old_dirs + m.get("gc", [])
    n = 1
    while f"cells_g{n}" in taken:
        n += 1
    gname = f"cells_g{n}"
    survivors = _read_cells(spark, index_dir, None)
    writer = survivors.write.mode("overwrite")
    if not survivors.isEmpty():
        writer = writer.partitionBy("cid")
    writer.parquet(os.path.join(index_dir, gname))
    # the committed batch-tag history SURVIVES compaction: a replayed
    # streaming micro-batch must stay a no-op even after its generation
    # was folded into the new base
    _ivf_commit(
        index_dir,
        {"base": gname, "generations": [], "tombstones": [],
         "gc": old_dirs, "batches": m.get("batches", [])},
    )
    keep = set(old_dirs) | {
        gname, "centroids.parquet", PQ_CODEBOOK, IVF_MANIFEST
    }
    for entry in os.listdir(index_dir):
        if entry in keep:
            continue
        p = os.path.join(index_dir, entry)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass
    return gname


def _read_cells(spark: SparkSession, index_dir: str,
                probe_cids) -> DataFrame:
    """Union the committed cell generations with the probe filter
    applied PER DIRECTORY, so each scan keeps its ``cid IN (probes)``
    PartitionFilters through the union (the same pruning-survives-union
    requirement the text-index segment reader pins), then mask the
    committed tombstones with an anti-join (eligibility only — exactly
    the text kernels' liveness-mask shape).  ``probe_cids=None`` reads
    everything (the compaction path)."""
    import os
    from functools import reduce

    m = _ivf_manifest(index_dir)
    dfs = []
    for g in [m["base"]] + m["generations"]:
        df = spark.read.parquet(os.path.join(index_dir, g))
        if probe_cids is not None:
            df = df.filter(F.col("cid").isin(probe_cids))
        dfs.append(df.select("vec_id", "embedding", "cid"))
    out = reduce(DataFrame.unionByName, dfs)
    if m["tombstones"]:
        tomb = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(os.path.join(index_dir, t))
                for t in m["tombstones"]
            ],
        )
        out = out.join(tomb.select("vec_id"), "vec_id", "left_anti")
    return out


def ivf_topk_ondisk(spark: SparkSession, index_dir: str, query_vec,
                    k: int = 10, nprobe: int = NPROBE,
                    exclude_vec_id=None) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (build_ivf_index).

    Probe selection is driver-side over the collected centroid table
    (k rows — centroid-sized, like WAND's term planning): cosine as a
    sequential left-fold (the cross-engine float determinism contract),
    tie-break lowest cid.  The cells scan carries
    ``cid IN (probes)`` — a PARTITION filter, so only nprobe/k of the
    stored vectors are read; rescoring within cells is exact.
    """
    import math
    import os

    qv = [float(x) for x in query_vec]
    cents = spark.read.parquet(
        os.path.join(index_dir, "centroids.parquet")
    ).collect()
    qn = math.sqrt(_fold_dot(qv, qv))

    def qcos(cv):
        return _fold_dot(qv, cv) / (math.sqrt(_fold_dot(cv, cv)) * qn)

    ranked = sorted(
        ((r["cid"], qcos(r["cv"])) for r in cents),
        key=lambda cq: (-cq[1], cq[0]),
    )
    probe_cids = [cid for cid, _ in ranked[:nprobe]]
    cells = _read_cells(spark, index_dir, probe_cids)
    if exclude_vec_id is not None:
        cells = cells.filter(F.col("vec_id") != exclude_vec_id)
    qlit = F.array(*[F.lit(x) for x in qv])
    return (
        cells.select(
            "vec_id",
            F.round(_cosine("embedding", qlit), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _fold_dot(a, b):
    """Sequential left-fold dot product — the float64 order every engine
    in the repo uses (F.aggregate, DuckDB list_dot_product, numpy-free
    python), so driver-side probe math reproduces plan-side values."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


_IVF_INDEX_CACHE = {}


def _ivf_index_key_dir(sf_dir, tag=""):
    """(cache key, on-disk dir) for the persisted IVF index over
    ``sf_dir`` — single source for the cache layout (shared with the
    bench's cold-measurement reset).  ``tag`` separates index variants
    over the same source (e.g. the append-path index)."""
    import hashlib
    import os
    import tempfile

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    key = (src, int(os.path.getmtime(src)), tag)
    d = os.path.join(
        tempfile.gettempdir(),
        "searchengine_spark_ivf",
        hashlib.md5(repr(key).encode()).hexdigest()[:16],
    )
    return key, d


def ivf_index_cache_reset(sf_dir):
    """Drop the persisted IVF indexes for ``sf_dir`` (both the
    monolithic and the append-path variants) from both cache layers so
    the next ann_ivf_persisted_topk / ann_ivf_append_topk call is a
    true cold build (see textops.flat_index_cache_reset)."""
    import shutil

    for tag in ("", "append", "maint"):
        key, d = _ivf_index_key_dir(sf_dir, tag)
        _IVF_INDEX_CACHE.pop(key, None)
        shutil.rmtree(d, ignore_errors=True)


def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str,
                           query_vec_id: int = 0, k: int = 10,
                           nprobe: int = NPROBE) -> DataFrame:
    """Driver entry: build-once (mtime-keyed temp dir), serve from the
    persisted IVF index.  Must return EXACTLY ann_ivf_kmeans_topk's
    ranking (same oracle) — proving the persisted index changes layout,
    never answers."""
    import os

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    key, d = _ivf_index_key_dir(sf_dir)
    if key in _IVF_INDEX_CACHE:
        d = _IVF_INDEX_CACHE[key]
    else:
        emb = spark.read.parquet(src).select("vec_id", "embedding")
        if not os.path.exists(
            os.path.join(d, "centroids.parquet", "_SUCCESS")
        ):
            build_ivf_index(spark, emb, d)
        _IVF_INDEX_CACHE[key] = d
    qv = (
        spark.read.parquet(src)
        .filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .first()["embedding"]
    )
    return ivf_topk_ondisk(
        spark, d, qv, k=k, nprobe=nprobe, exclude_vec_id=query_vec_id
    )


def ann_ivf_append_topk(spark: SparkSession, sf_dir: str,
                        query_vec_id: int = 0, k: int = 10,
                        nprobe: int = NPROBE) -> DataFrame:
    """Driver entry for incremental IVF maintenance: train + build the
    index over the EVEN vec_ids only, append_ivf the odd half with the
    stored quantizer (no retrain), then serve from the two-generation
    union.  The DuckDB oracle trains k-means on the even subset and
    applies one assignment pass over ALL vectors — proving end-to-end
    that append changes when vectors arrived, never the answer.

    Completeness marker for the two-step construction: the manifest is
    written LAST (by append_ivf), so a half-built cache dir is rebuilt
    from scratch on the next call."""
    import os
    import shutil

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    key, d = _ivf_index_key_dir(sf_dir, "append")
    if key in _IVF_INDEX_CACHE:
        d = _IVF_INDEX_CACHE[key]
    else:
        emb = spark.read.parquet(src).select("vec_id", "embedding")
        if not os.path.exists(os.path.join(d, IVF_MANIFEST)):
            shutil.rmtree(d, ignore_errors=True)
            build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
            append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)
        _IVF_INDEX_CACHE[key] = d
    qv = (
        spark.read.parquet(src)
        .filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .first()["embedding"]
    )
    return ivf_topk_ondisk(
        spark, d, qv, k=k, nprobe=nprobe, exclude_vec_id=query_vec_id
    )


def ann_ivf_maint_topk(spark: SparkSession, sf_dir: str,
                       query_vec_id: int = 0, k: int = 10,
                       nprobe: int = NPROBE) -> DataFrame:
    """Driver entry for the FULL IVF maintenance cycle: build over the
    even vec_ids, append the odds, tombstone vec_id % 7 == 3, then
    physically compact — and serve from the result.  The DuckDB oracle
    trains k-means on the evens, assigns all vectors, and excludes the
    deleted ids from serving: the whole append→delete→compact history
    must be invisible in the answer.

    Completeness marker: a compacted manifest (base != 'cells') — any
    crash mid-construction leaves an uncompacted state and the next
    call rebuilds from scratch."""
    import os
    import shutil

    src = os.path.abspath(f"{sf_dir}/embeddings.parquet")
    key, d = _ivf_index_key_dir(sf_dir, "maint")
    if key in _IVF_INDEX_CACHE:
        d = _IVF_INDEX_CACHE[key]
    else:
        if _ivf_manifest(d)["base"] == "cells":
            shutil.rmtree(d, ignore_errors=True)
            emb = spark.read.parquet(src).select("vec_id", "embedding")
            build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
            append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)
            delete_vectors(
                spark, d,
                emb.filter(F.col("vec_id") % 7 == 3).select("vec_id"),
            )
            compact_ivf(spark, d)
        _IVF_INDEX_CACHE[key] = d
    qv = (
        spark.read.parquet(src)
        .filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .first()["embedding"]
    )
    return ivf_topk_ondisk(
        spark, d, qv, k=k, nprobe=nprobe, exclude_vec_id=query_vec_id
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str, query_vec_id: int = 0,
                 k: int = 10) -> DataFrame:
    """IVF-style ANN: coarse quantize → probe NPROBE nearest lists.

    1. centroids = vectors at fixed-stride ids (deterministic stand-in
       for k-means centroids);
    2. every vector is assigned to its nearest centroid (broadcast join
       against the small centroid set — one narrow pass over n);
    3. the query probes its NPROBE nearest centroids and ranks only the
       vectors assigned to those lists.
    Approximate by construction; the driver oracle checks the *identical
    IVF semantics* in SQL, and tests/test_ops.py checks recall against
    the exact baseline.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.filter(
        F.col("vec_id") % CENTROID_STRIDE == 0
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))

    # nearest-centroid assignment (tie: lowest cid)
    asg = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cid",
        _cosine("embedding", "cv").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    assigned = (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )

    probes = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select("cid", "qv", _cosine("qv", "cv").alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(NPROBE)
    )

    cands = assigned.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(probes.select("cid", "qv")), "cid"
    )
    return (
        cands.select(
            "vec_id",
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_recall(spark: SparkSession, sf_dir: str, k: int = 10,
               query_mod: int = 25) -> DataFrame:
    """(query_vec_id, n_hits, recall) — recall@k of the stride-IVF
    approximate search against the exact cosine ranking, one row per
    query (vec_id % query_mod == 0).

    The evaluation surface every ANN deployment needs: approximate
    search trades recall for probe cost, and the trade must be
    MEASURED, not assumed — this runs both rankings over the shared id
    space and reports per-query overlap, so an nprobe/centroid change
    shows up as a recall delta in the driver's value hash.  Both
    rankings use the engine's pinned contracts (round-5 cosine,
    (cosine desc, vec_id) tie-break), so the DuckDB oracle reproduces
    the exact cut at rank k.

    Scale: the IVF side is probe-pruned exactly like ann_ivf_topk; the
    exact side is one broadcast of the query set against the corpus —
    Q×n, the price of ground truth, run on a sample of queries (the
    standard recall-eval shape).
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    asg = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cid",
        _cosine("embedding", "cv").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )

    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pr = queries.crossJoin(F.broadcast(cent)).select(
        "qid", "cid", _cosine("qv", "cv").alias("qcos")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("cid"))
    probes = (
        pr.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= NPROBE)
        .select("qid", "cid")
    )

    wr = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    ivf_k = (
        assigned.join(probes, "cid")
        .join(F.broadcast(queries), "qid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    exact_k = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )

    hits = (
        ivf_k.join(exact_k, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_hits"))
    )
    return queries.select("qid").join(hits, "qid", "left").select(
        F.col("qid").alias("query_vec_id"),
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.round(F.coalesce("n_hits", F.lit(0)) / k, 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ): the 100-TB memory story for the vector
# side.  Full float32 vectors in the probed cells cost dim×4 bytes of IO
# per candidate; PQ stores one byte per subspace (here 8 bytes vs 256 —
# 32×) and scores candidates from a tiny per-query lookup table (ADC,
# asymmetric distance computation), reranking only a short exact list.
# Codebooks follow the module's deterministic stand-in pattern
# (fixed-stride rows, like ann_ivf_topk's centroids) so the DuckDB
# oracle mirrors the whole pipeline value-for-value; a production build
# would train them with per-subspace k-means (kmeans_centroids has the
# machinery) with identical downstream plumbing.
# ---------------------------------------------------------------------------

PQ_M = 8                      # subspaces (EMB_DIM 64 → 8 dims each)
PQ_SUB = EMB_DIM // PQ_M
PQ_CODES = 16                 # codes per subspace codebook
PQ_STRIDE = 29                # codebook rows: vec_id = c * PQ_STRIDE
PQ_ROUND = 6                  # encode-distance rounding (cross-engine)
PQ_RERANK = 32                # exact-rerank shortlist size


def _pq_codebook(emb: DataFrame):
    """cb[m][c] = the m-th subvector (float64) of the vector at
    vec_id = c*PQ_STRIDE — a pure function of the data, shared
    value-for-value with the SQL oracle.  Collect is PQ_CODES rows
    (codebook-sized, not data-sized)."""
    rows = (
        emb.filter(
            (F.col("vec_id") % PQ_STRIDE == 0)
            & (F.col("vec_id") < PQ_CODES * PQ_STRIDE)
        )
        .orderBy("vec_id")
        .collect()
    )
    if len(rows) < PQ_CODES:
        raise ValueError(
            f"corpus too small for a {PQ_CODES}-code PQ codebook: "
            f"{len(rows)} stride rows"
        )
    full = [[float(x) for x in r["embedding"]] for r in rows]
    return [
        [v[m * PQ_SUB:(m + 1) * PQ_SUB] for v in full]
        for m in range(PQ_M)
    ]


def _pq_encode(emb: DataFrame, cb) -> DataFrame:
    """(vec_id, codes array<int>) — per subspace, the code of the
    nearest codebook entry by squared L2 distance, rounded to PQ_ROUND
    decimals before the argmin (absorbs fold-order ulp noise across
    engines; ties break to the lowest code on both)."""
    spark = emb.sparkSession
    cb_df = spark.createDataFrame(
        [(m, c, cb[m][c]) for m in range(PQ_M) for c in range(PQ_CODES)],
        "m int, c int, cv array<double>",
    )
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[
                F.slice("embedding", m * PQ_SUB + 1, PQ_SUB)
                for m in range(PQ_M)
            ])
        ).alias("m", "xv"),
    )
    dist = (
        _dot("xv", "xv") - 2.0 * _dot("xv", "cv") + _dot("cv", "cv")
    )
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.asc("d"), F.asc("c")
    )
    coded = (
        subs.join(F.broadcast(cb_df), "m")
        .withColumn("d", F.round(dist, PQ_ROUND))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", "c")
    )
    return coded.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "c"))),
            lambda s: s["c"],
        ).alias("codes")
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the PQ code of every vector, one INT column per
    subspace (m0..m7) so the oracle compare is column-wise exact."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    codes = _pq_encode(emb, _pq_codebook(emb))
    return codes.select(
        "vec_id",
        *[
            F.element_at("codes", m + 1).alias(f"m{m}")
            for m in range(PQ_M)
        ],
    )


def _seq_dot(a, b):
    """Sequential left-fold float64 dot — the cross-engine contract."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _pq_adc_scored(spark: SparkSession, sf_dir: str, query_vec_id: int,
                   nprobe: int, trained: bool = False):
    """Shared ADC pipeline: stride-IVF probe pruning (identical to
    ann_ivf_topk) + PQ scores from a per-query lookup table.

    ADC: with x̂ = concat_m cb[m][code_m], the approximate cosine is
      cos(q, x̂) = Σ_m dot(q_m, cb[m][code_m])
                  / (|q| · sqrt(Σ_m |cb[m][code_m]|²)),
    so a query needs only dq[m][c] = dot(q_m, cb[m][c]) and
    cc[m][c] = |cb[m][c]|² — PQ_M×PQ_CODES doubles, computed driver-
    side with sequential folds and folded over each row's codes array
    as literal lookup arrays (no shuffle, no per-row Python).
    Returns (vec_id, pq_score) over the probed cells.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cb = (pq_kmeans_codebooks(spark, emb) if trained
          else _pq_codebook(emb))
    codes = _pq_encode(emb, cb)

    cent = emb.filter(
        F.col("vec_id") % CENTROID_STRIDE == 0
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    asg = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _cosine("embedding", "cv").alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    qrow = emb.filter(F.col("vec_id") == query_vec_id).first()
    q = [float(x) for x in qrow["embedding"]]
    qnorm = _seq_dot(q, q) ** 0.5
    probes = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select("cid", _cosine("qv", "cv").alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(nprobe)
    )

    dq, cc = _pq_query_lut(q, cb)
    cands = (
        assigned.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(probes.select("cid")), "cid")
        .join(codes, "vec_id")
    )
    return cands.select(
        "vec_id", _pq_adc_score(dq, cc, qnorm).alias("pq_score")
    )


def _pq_query_lut(q, cb):
    """Per-query ADC lookup tables, flattened m-major:
    dq[m*CODES+c] = dot(q_m, cb[m][c]), cc[...] = |cb[m][c]|² —
    sequential float64 folds (the cross-engine contract)."""
    dq, cc = [], []
    for m in range(PQ_M):
        qm = q[m * PQ_SUB:(m + 1) * PQ_SUB]
        for c in range(PQ_CODES):
            dq.append(_seq_dot(qm, cb[m][c]))
            cc.append(_seq_dot(cb[m][c], cb[m][c]))
    return dq, cc


def _pq_adc_score(dq, cc, qnorm):
    """Round-5 quantized cosine of the row's ``codes`` array: a
    sequential fold over the codes with the LUTs as literal arrays —
    no shuffle, no per-row Python."""
    dq_lit = F.array(*[F.lit(v) for v in dq])
    cc_lit = F.array(*[F.lit(v) for v in cc])

    def lut_sum(lut):
        # sequential fold over the codes array: acc + lut[m*CODES+code]
        return F.aggregate(
            F.zip_with(
                F.col("codes"),
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda c, m: F.element_at(
                    lut, (m * PQ_CODES + c + 1).cast("int")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.round(
        lut_sum(dq_lit) / (F.lit(qnorm) * F.sqrt(lut_sum(cc_lit))), 5
    )


PQ_KMEANS_ITERS = 2


def pq_kmeans_codebooks(spark: SparkSession, emb: DataFrame,
                        iters: int = PQ_KMEANS_ITERS):
    """Per-subspace k-means refinement of the stride PQ codebook — the
    production training path (the stride codebook is its init, exactly
    like kmeans_centroids refines ann_ivf_topk's stride centroids).

    One distributed pass per iteration over ALL subspaces at once:
    subvectors are assigned to their nearest code by the same rounded
    squared-L2 rule the encoder uses (round PQ_ROUND before the argmin,
    tie → lowest code), means recompute per (m, c, pos) rounded to
    KMEANS_ROUND, empty codes keep their previous entry.  The collect
    per iteration is PQ_M×PQ_CODES×PQ_SUB rows — codebook-sized.
    """
    cb = _pq_codebook(emb)
    subs = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[
                F.slice("embedding", m * PQ_SUB + 1, PQ_SUB)
                for m in range(PQ_M)
            ])
        ).alias("m", "xv"),
    )
    for _ in range(iters):
        cb_df = spark.createDataFrame(
            [(m, c, cb[m][c])
             for m in range(PQ_M) for c in range(PQ_CODES)],
            "m int, c int, cv array<double>",
        )
        dist = (
            _dot("xv", "xv") - 2.0 * _dot("xv", "cv") + _dot("cv", "cv")
        )
        w = Window.partitionBy("vec_id", "m").orderBy(
            F.asc("d"), F.asc("c")
        )
        assigned = (
            subs.join(F.broadcast(cb_df), "m")
            .withColumn("d", F.round(dist, PQ_ROUND))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("m", "c", F.posexplode("xv").alias("pos", "x"))
        )
        rows = (
            assigned.groupBy("m", "c", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")),
                         KMEANS_ROUND).alias("mean"))
            .collect()
        )
        nxt = [[list(v) for v in sub] for sub in cb]  # empty → keep
        upd = {}
        for r in rows:
            upd.setdefault((r["m"], r["c"]), {})[r["pos"]] = r["mean"]
        for (m, c), d in upd.items():
            nxt[m][c] = [d[j] for j in range(PQ_SUB)]
        cb = nxt
    return cb


def ann_ivf_pq_trained_topk(spark: SparkSession, sf_dir: str,
                            query_vec_id: int = 0, k: int = 10,
                            nprobe: int = NPROBE,
                            rerank: int = PQ_RERANK) -> DataFrame:
    """IVF-PQ with TRAINED per-subspace codebooks + exact rerank — the
    production serving shape end-to-end: k-means-refined quantization,
    ADC shortlist over the IVF probes, exact round-5 rerank.  Oracled
    by an unrolled-CTE DuckDB mirror of the whole chain."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qrow = emb.filter(F.col("vec_id") == query_vec_id).first()
    short = (
        _pq_adc_scored(spark, sf_dir, query_vec_id, nprobe, trained=True)
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(rerank)
    )
    qv = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    return (
        short.join(emb, "vec_id")
        .select(
            "vec_id",
            F.round(_cosine("embedding", qv), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str,
                    query_vec_id: int = 0, k: int = 10,
                    nprobe: int = NPROBE) -> DataFrame:
    """IVF-PQ ANN, pure ADC ranking: (vec_id, pq_score) top-k by the
    quantized cosine.  The approximation itself is the contract here
    (the oracle recomputes the identical quantization); the serving
    variant with exact reranking is ann_ivf_pq_rerank_topk."""
    return (
        _pq_adc_scored(spark, sf_dir, query_vec_id, nprobe)
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(k)
    )


def ann_ivf_pq_rerank_topk(spark: SparkSession, sf_dir: str,
                           query_vec_id: int = 0, k: int = 10,
                           nprobe: int = NPROBE,
                           rerank: int = PQ_RERANK) -> DataFrame:
    """IVF-PQ with exact reranking — the standard serving shape: ADC
    shortlists `rerank` candidates from the probed cells (cheap, code
    bytes only), then the shortlist alone is rescored with the exact
    float cosine (round-5, (cosine desc, vec_id) tie-break).  At scale
    the full vectors are fetched for `rerank` rows instead of every
    probed candidate."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    qrow = emb.filter(F.col("vec_id") == query_vec_id).first()
    short = (
        _pq_adc_scored(spark, sf_dir, query_vec_id, nprobe)
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(rerank)
    )
    qv = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    return (
        short.join(emb, "vec_id")
        .select(
            "vec_id",
            F.round(_cosine("embedding", qv), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


PQ_CODEBOOK = "pq_codebook.parquet"


def attach_pq_codebook(spark: SparkSession, emb: DataFrame,
                       index_dir: str) -> None:
    """Persist the PQ codebook beside a built IVF index (index
    metadata, like centroids.parquet): (m, c, cv) — PQ_M×PQ_CODES rows.
    Enables the PQ serving paths (ivf_pq_topk_ondisk and
    query/serve_ivf.LocalANN.pq_topk); the plain exact paths ignore it.
    Codes themselves are NOT stored — readers encode cells on fetch
    against this codebook, so appends/deletes/compactions need no PQ
    bookkeeping (encode-on-fetch is cached at the replica)."""
    import os

    cb = _pq_codebook(emb)
    spark.createDataFrame(
        [(m, c, cb[m][c]) for m in range(PQ_M) for c in range(PQ_CODES)],
        "m int, c int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(index_dir, PQ_CODEBOOK)
    )


def _load_pq_codebook(spark: SparkSession, index_dir: str):
    """cb[m][c] (python float64 lists) from the persisted codebook —
    PQ_M×PQ_CODES rows, codebook-sized collect."""
    import os

    rows = spark.read.parquet(
        os.path.join(index_dir, PQ_CODEBOOK)
    ).collect()
    cb = [[None] * PQ_CODES for _ in range(PQ_M)]
    for r in rows:
        cb[r["m"]][r["c"]] = [float(x) for x in r["cv"]]
    return cb


def ivf_pq_topk_ondisk(spark: SparkSession, index_dir: str, query_vec,
                       k: int = 10, nprobe: int = NPROBE,
                       exclude_vec_id=None,
                       rerank: int = PQ_RERANK) -> DataFrame:
    """IVF-PQ serving from a persisted index: probe selection and the
    cid-pruned cells scan are ivf_topk_ondisk's, candidates are ADC-
    shortlisted from on-the-fly codes against the attached codebook,
    and only the shortlist is rescored with the exact round-5 cosine.
    Same maintenance semantics as the exact reader (tombstones masked
    by _read_cells, generations unioned with pruning intact).
    Returns (vec_id, cosine) — the exact cosine of the reranked top-k.
    """
    import math
    import os

    qv = [float(x) for x in query_vec]
    cb = _load_pq_codebook(spark, index_dir)
    cents = spark.read.parquet(
        os.path.join(index_dir, "centroids.parquet")
    ).collect()
    qn = math.sqrt(_fold_dot(qv, qv))
    ranked = sorted(
        (
            (r["cid"],
             _fold_dot(qv, r["cv"])
             / (math.sqrt(_fold_dot(r["cv"], r["cv"])) * qn))
            for r in cents
        ),
        key=lambda cq: (-cq[1], cq[0]),
    )
    probe_cids = [cid for cid, _ in ranked[:nprobe]]
    cells = _read_cells(spark, index_dir, probe_cids)
    if exclude_vec_id is not None:
        cells = cells.filter(F.col("vec_id") != exclude_vec_id)

    codes = _pq_encode(cells.select("vec_id", "embedding"), cb)
    dq, cc = _pq_query_lut(qv, cb)
    short = (
        codes.select(
            "vec_id", _pq_adc_score(dq, cc, qn).alias("pq_score")
        )
        .orderBy(F.desc("pq_score"), F.asc("vec_id"))
        .limit(rerank)
    )
    qlit = F.array(*[F.lit(x) for x in qv])
    return (
        short.join(cells, "vec_id")
        .select(
            "vec_id",
            F.round(_cosine("embedding", qlit), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# --- scalar quantization (SQ8) -----------------------------------------------
# pinned parameters, interpolated into the DuckDB oracle — change both
SQ_BINS = 256        # uint8 code space per dimension
SQ_RERANK = 32       # exact-rerank shortlist size
SQ_QUERY_VEC = 0     # pinned driver-entry query vector


def ann_sq8_topk(spark: SparkSession, sf_dir: str,
                 query_vec_id: int = SQ_QUERY_VEC, k: int = 10) -> DataFrame:
    """Scalar-quantization ANN (the faiss SQ8 scheme — the uniform
    per-dimension sibling of product quantization): per-dimension
    GLOBAL [min, max] ranges train the quantizer, every db vector
    stores one uint8 code per dimension (4x smaller than float32),
    search ranks by the ASYMMETRIC cosine between the reconstruction
    r = lo + (code + 0.5)·width and the exact query vector, then
    exact-reranks the top SQ_RERANK by true cosine.

    Cross-engine float contracts: ranges are order-free min/max over
    identical doubles; code = least(floor((v-lo)/width), 255) and the
    reconstruction are the same scalar expressions on both engines
    (zero-width dims pin code 0 / recon lo); the approx cosine's
    accumulations are per-dimension sums rounded 6 before ranking (the
    BM25 sum-order class), the exact rerank follows the ann round-5
    cosine contract with vec_id tie-breaks everywhere.

    Scale: the range table is |dims| rows (broadcast); codes are one
    narrow projection of the corpus; the approx pass is a (vec, dim)
    shuffle agg; only SQ_RERANK rows reach the exact rerank.
    """
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dims = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("d0", "v0"),
    ).select(
        "vec_id",
        (F.col("d0") + 1).cast("long").alias("d"),
        F.col("v0").cast("double").alias("v"),
    )
    rng = dims.groupBy("d").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    qd = dims.filter(F.col("vec_id") == query_vec_id).select(
        "d", F.col("v").alias("qv")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(SQ_BINS))
    db = dims.filter(F.col("vec_id") != query_vec_id).join(
        F.broadcast(rng), "d"
    )
    codes = db.withColumn(
        "code",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col("v") - F.col("lo")) / width),
                F.lit(SQ_BINS - 1),
            )
        ).cast("long"),
    ).withColumn(
        "r",
        F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
            F.col("lo") + (F.col("code") + F.lit(0.5)) * width
        ),
    )
    ap = (
        codes.join(F.broadcast(qd), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(F.col("r") * F.col("qv")).alias("num"),
            F.sum(F.col("r") * F.col("r")).alias("nn"),
        )
    )
    qn = qd.agg(
        F.sqrt(F.sum(F.col("qv") * F.col("qv"))).alias("_qn")
    )
    short = (
        ap.crossJoin(F.broadcast(qn))
        .select(
            "vec_id",
            F.round(
                F.col("num") / (F.sqrt(F.col("nn")) * F.col("_qn")), 6
            ).alias("approx"),
        )
        .orderBy(F.desc("approx"), F.asc("vec_id"))
        .limit(SQ_RERANK)
    )
    qv = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qvec")
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qvec",
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(
                "embedding", lambda a: a.cast("double") * a.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nq = F.sqrt(
        F.aggregate(
            F.transform(
                "qvec", lambda a: a.cast("double") * a.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        short.join(emb, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "approx",
            F.round(dot / (na * nq), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


# filtered vector search — pinned label subset, interpolated into the
# DuckDB oracle — change Spark and SQL together
ANN_FILTER_LABELS = (2, 5)


def ann_filtered_topk(spark: SparkSession, sf_dir: str,
                      query_vec_id: int = 0, k: int = 10,
                      labels=ANN_FILTER_LABELS) -> DataFrame:
    """(vec_id, label, cosine) — FILTERED vector search: IVF ANN
    restricted to vectors whose ``label`` is in the pinned set — the
    metadata-filtered ANN every vector store serves (pgvector WHERE,
    Pinecone/Qdrant filters).

    Filter semantics are eligibility-only, the engine's filtered-search
    contract: probes are chosen by query geometry alone (the filter
    must not move the probe set), the label predicate then drops
    ineligible candidates BEFORE the exact rescoring, and survivor
    cosines equal the unfiltered scores exactly.  Known IVF caveat
    (documented, not hidden): a highly selective filter thins the
    probed cells, so recall under heavy filtering needs more probes —
    nprobe is the knob, and the brute-force-within-filter alternative
    wins below ~1% selectivity.

    Scale: identical plan shape to ann_ivf_topk (broadcast centroid
    assignment, probe-pruned rescoring, no driver loop); the label
    predicate is a columnar filter pushed below the rescoring join.
    On the persisted path the cells carry label columns, so the same
    predicate reaches the parquet cell scan next to the cid partition
    filter."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.filter(
        F.col("vec_id") % CENTROID_STRIDE == 0
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    asg = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "embedding", "cid",
        _cosine("embedding", "cv").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    assigned = (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cid")
    )
    probes = (
        assigned.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select("cid", "qv", _cosine("qv", "cv").alias("qcos"))
        .orderBy(F.desc("qcos"), F.asc("cid"))
        .limit(NPROBE)
    )
    cands = (
        assigned.filter(
            (F.col("vec_id") != query_vec_id)
            & F.col("label").isin(*labels)
        )
        .join(F.broadcast(probes.select("cid", "qv")), "cid")
    )
    return (
        cands.select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


ANN_CURVE_MAX_NPROBE = 8   # curve domain, interpolated into the oracle


def ann_recall_curve(spark: SparkSession, sf_dir: str, k: int = 10,
                     query_mod: int = 25,
                     max_nprobe: int = ANN_CURVE_MAX_NPROBE
                     ) -> DataFrame:
    """(nprobe, recall) — the nprobe↔recall TRADEOFF CURVE of the
    stride-IVF search, every point from ONE pass: the tuning table an
    ANN deployment reads to pick its probe budget (ann_recall measures
    the single deployed point; this measures the whole knob).

    One pass suffices because membership is monotone: under the
    engine's pinned total order (round-5 cosine, vec_id tie-break) a
    ground-truth top-k vector has at most k-1 vectors above it
    GLOBALLY, so within ANY candidate subset it stays inside the
    top-k cut — v ∈ ivf-topk(p) iff the probe rank of v's cell
    ≤ p.  Hence recall@k(p) = |truth hits with cell-probe-rank ≤ p|
    / (|Q|·k), computed for all p from the per-hit minimal probe rank
    (exact integer counts, one round-6 division per point).

    Scale: assignment/probe ranking are the ann_recall shapes; the
    per-hit join is |Q|·k rows; the curve join is that tiny set
    against max_nprobe literals."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") % CENTROID_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    asg = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "embedding", "cid",
        _cosine("embedding", "cv").alias("ccos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assigned = (
        asg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    queries = emb.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("qcos"), F.asc("cid"))
    pranks = (
        queries.crossJoin(F.broadcast(cent))
        .select("qid", "cid", _cosine("qv", "cv").alias("qcos"))
        .withColumn("prank", F.row_number().over(wq))
        .select("qid", "cid", "prank")
    )
    wr = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    exact_k = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id",
            F.round(_cosine("embedding", "qv"), 5).alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id")
    )
    minp = (
        exact_k.join(assigned, "vec_id")
        .join(pranks, ["qid", "cid"])
        .select("qid", "prank")
    )
    nq = queries.count()
    points = spark.range(1, max_nprobe + 1).select(
        F.col("id").alias("nprobe")
    )
    hits = (
        minp.crossJoin(F.broadcast(points))
        .filter(F.col("prank") <= F.col("nprobe"))
        .groupBy("nprobe")
        .agg(F.count("*").cast("long").alias("_h"))
    )
    return (
        points.join(hits, "nprobe", "left")
        .na.fill({"_h": 0})
        .select(
            "nprobe",
            F.round(
                F.col("_h").cast("double") / F.lit(float(nq * k)), 6
            ).alias("recall"),
        )
        .orderBy("nprobe")
    )
