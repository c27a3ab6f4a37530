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

    Brute self-join at test scale; at 10^12 rows the identical predicate
    runs after LSH/IVF blocking (ann_ivf_topk's assignment join) —
    the scoring expression is shared.
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
