"""LocalANN (Spark-free IVF serving) must be VALUE-identical to
ops.vectors.ivf_topk_ondisk over the same index dir — through appends,
deletes, and compaction — and pick up maintenance commits via
maybe_refresh, mirroring tests/test_serve_local.py's contract for the
text tier."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _spark_topk(spark, d, qv, k=10, exclude=None):
    from searchengine_spark.ops.vectors import ivf_topk_ondisk

    return [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_ondisk(
            spark, d, qv, k=k, exclude_vec_id=exclude
        ).collect()
    ]


def test_local_ann_identity_through_maintenance(spark, tmp_path):
    from searchengine_spark.ops.vectors import (
        append_ivf,
        build_ivf_index,
        compact_ivf,
        delete_vectors,
    )
    from searchengine_spark.query.serve_ivf import LocalANN

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)

    qvs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([0, 3, 7])).collect()
    }
    ann = LocalANN(d)
    for vid, qv in qvs.items():
        assert ann.topk(qv, k=10, exclude_vec_id=vid) == _spark_topk(
            spark, d, qv, k=10, exclude=vid
        )

    # delete the current top-3 for query 0: the local tier must see the
    # commit via maybe_refresh and stay identical
    dead = [v for v, _ in ann.topk(qvs[0], k=3, exclude_vec_id=0)]
    delete_vectors(spark, d, dead)
    assert ann.maybe_refresh() is True
    got = ann.topk(qvs[0], k=10, exclude_vec_id=0)
    assert got == _spark_topk(spark, d, qvs[0], k=10, exclude=0)
    assert not set(dead) & {v for v, _ in got}
    # no commit since → no reload
    assert ann.maybe_refresh() is False

    # compaction: new base dir, same answers
    compact_ivf(spark, d)
    assert ann.maybe_refresh() is True
    for vid, qv in qvs.items():
        assert ann.topk(qv, k=10, exclude_vec_id=vid) == _spark_topk(
            spark, d, qv, k=10, exclude=vid
        )

    # warm path sanity: repeated queries hit the cell LRU and agree
    assert ann.topk(qvs[3], k=5) == ann.topk(qvs[3], k=5)


def test_stale_replica_serves_across_one_compaction(spark, tmp_path):
    """The deferred-GC replica contract: a LocalANN that loaded its
    manifest BEFORE a compaction keeps serving the pre-compaction
    answers (its dirs survive one compaction interval), and a refresh
    any time before the NEXT compaction converges it."""
    from searchengine_spark.ops.vectors import (
        append_ivf,
        build_ivf_index,
        compact_ivf,
        delete_vectors,
    )
    from searchengine_spark.query.serve_ivf import LocalANN

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]

    stale = LocalANN(d)
    before = stale.topk(qv, k=10, exclude_vec_id=0)
    assert before

    # a delete + compact land while the replica is NOT refreshing:
    # its old dirs (pre-compaction base + generation + no tombstones)
    # must still be on disk, so it serves the pre-compaction answers
    delete_vectors(spark, d, [before[0][0]])
    compact_ivf(spark, d)
    assert stale.topk(qv, k=10, exclude_vec_id=0) == before

    # one refresh inside the grace interval converges it exactly
    assert stale.maybe_refresh() is True
    got = stale.topk(qv, k=10, exclude_vec_id=0)
    assert got == _spark_topk(spark, d, qv, k=10, exclude=0)
    assert before[0][0] not in {v for v, _ in got}


def test_local_ann_pq_identity_through_maintenance(spark, tmp_path):
    """The PQ serving path: LocalANN.pq_topk must be VALUE-identical to
    ivf_pq_topk_ondisk over the same index dir — fresh build, append,
    delete, compaction — with codes encoded on fetch matching the Spark
    encoder exactly, and the exact-rerank cosines equal to the exact
    tier's for the same ids."""
    from searchengine_spark.ops.vectors import (
        _pq_encode,
        append_ivf,
        attach_pq_codebook,
        build_ivf_index,
        compact_ivf,
        delete_vectors,
        ivf_pq_topk_ondisk,
    )
    from searchengine_spark.query.serve_ivf import LocalANN

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = str(tmp_path / "ivfpq")
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    attach_pq_codebook(spark, emb, d)
    append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)

    qvs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([0, 7])).collect()
    }

    def spark_pq(qv, exclude):
        return [
            (r["vec_id"], r["cosine"])
            for r in ivf_pq_topk_ondisk(
                spark, d, qv, k=10, exclude_vec_id=exclude
            ).collect()
        ]

    ann = LocalANN(d)
    assert ann.pq_cb is not None
    for vid, qv in qvs.items():
        got = ann.pq_topk(qv, k=10, exclude_vec_id=vid)
        assert got == spark_pq(qv, vid), vid
        assert len(got) == 10

    # code parity: the replica's encode-on-fetch equals _pq_encode for
    # a probed cell's vectors
    gen, cid = ann.gens[0], sorted(ann.cent)[0]
    ids, codes = ann._cell_codes(gen, cid)
    if ids is not None and len(ids):
        want = {
            r["vec_id"]: list(r["codes"])
            for r in _pq_encode(
                emb.filter(F.col("vec_id").isin([int(i) for i in ids])),
                ann.pq_cb,
            ).collect()
        }
        got_codes = {int(i): [int(c) for c in row]
                     for i, row in zip(ids, codes)}
        assert got_codes == want

    # maintenance: delete the current top result, compact — identity
    # holds through both and the codebook survives compaction GC
    dead = ann.pq_topk(qvs[0], k=1, exclude_vec_id=0)[0][0]
    delete_vectors(spark, d, [dead])
    compact_ivf(spark, d)
    assert ann.maybe_refresh() is True
    assert ann.pq_cb is not None  # sidecar survived the GC
    for vid, qv in qvs.items():
        got = ann.pq_topk(qv, k=10, exclude_vec_id=vid)
        assert got == spark_pq(qv, vid), vid
    assert dead not in {v for v, _ in ann.pq_topk(qvs[0], k=10,
                                                  exclude_vec_id=0)}

    # rerank cosines are the EXACT tier's values for the same ids
    exact = dict(ann.topk(qvs[0], k=50, exclude_vec_id=0))
    for vid, cos in ann.pq_topk(qvs[0], k=10, exclude_vec_id=0):
        assert exact[vid] == cos

    # rebuild-in-place drops the stale codebook (callers re-attach)
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    ann2 = LocalANN(d)
    assert ann2.pq_cb is None


def test_sharded_ann_equals_unsharded(spark, tmp_path):
    """Cell-partition sharding must be invisible: ShardedANN answers
    value-identically to one LocalANN on BOTH paths (exact and the
    two-phase PQ), across shard counts, and re-partitions on
    maintenance commits."""
    from searchengine_spark.ops.vectors import (
        append_ivf,
        attach_pq_codebook,
        build_ivf_index,
        compact_ivf,
        delete_vectors,
    )
    from searchengine_spark.query.serve_ivf import LocalANN, ShardedANN

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, emb.filter(F.col("vec_id") % 2 == 0), d)
    append_ivf(spark, emb.filter(F.col("vec_id") % 2 == 1), d)
    attach_pq_codebook(spark, emb, d)

    qvs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([0, 3, 7])).collect()
    }
    whole = LocalANN(d)
    n_cells = len(whole.cent)
    for n_shards in (2, 3, n_cells + 5):  # over-sharding clamps
        router = ShardedANN(d, n_shards=n_shards)
        assert len(router.shards) <= n_cells
        owned = [c for sh in router.shards for c in sh._cells]
        assert sorted(owned) == sorted(whole.cent)  # exact partition
        for vid, qv in qvs.items():
            assert router.topk(qv, k=10, exclude_vec_id=vid) \
                == whole.topk(qv, k=10, exclude_vec_id=vid), n_shards
            assert router.pq_topk(qv, k=10, exclude_vec_id=vid) \
                == whole.pq_topk(qv, k=10, exclude_vec_id=vid), n_shards

    # maintenance under a live router: delete + compact, then refresh
    router = ShardedANN(d, n_shards=2)
    dead = [v for v, _ in whole.topk(qvs[0], k=3, exclude_vec_id=0)]
    delete_vectors(spark, d, dead)
    compact_ivf(spark, d)
    assert router.maybe_refresh() is True
    assert whole.maybe_refresh() is True
    for vid, qv in qvs.items():
        got = router.topk(qv, k=10, exclude_vec_id=vid)
        assert got == whole.topk(qv, k=10, exclude_vec_id=vid)
        assert not set(dead) & {v for v, _ in got}
    assert router.maybe_refresh() is False


def test_allowed_filter_on_serving_tiers(spark, tmp_path):
    """allowed= on LocalANN/ShardedANN (exact + PQ): eligibility-only
    — the filtered top-k is the allowed-subset prefix of a large
    unfiltered ranking with identical cosines, the PQ shortlist fills
    with eligible vectors (k results despite a narrow filter), and
    sharded == local under the same filter."""
    from searchengine_spark.ops.vectors import (
        attach_pq_codebook,
        build_ivf_index,
    )
    from searchengine_spark.query.serve_ivf import LocalANN, ShardedANN

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = str(tmp_path / "ivf")
    build_ivf_index(spark, emb, d)
    attach_pq_codebook(spark, emb, d)

    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    allowed = {
        r["vec_id"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet")
        .filter(F.col("label").isin(2, 5)).select("vec_id").collect()
    }

    ann = LocalANN(d)
    got = ann.topk(qv, k=10, exclude_vec_id=0, allowed=allowed)
    assert got and all(v in allowed for v, _ in got)
    full = ann.topk(qv, k=10_000, exclude_vec_id=0)
    want = [(v, c) for v, c in full if v in allowed][: len(got)]
    assert got == want

    pq_got = ann.pq_topk(qv, k=10, exclude_vec_id=0, allowed=allowed)
    assert len(pq_got) == 10
    assert all(v in allowed for v, _ in pq_got)

    router = ShardedANN(d, n_shards=2)
    assert router.topk(qv, k=10, exclude_vec_id=0,
                       allowed=allowed) == got
    assert router.pq_topk(qv, k=10, exclude_vec_id=0,
                          allowed=allowed) == pq_got
