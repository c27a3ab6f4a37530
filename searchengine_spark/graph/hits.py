"""HITS as an iterative DataFrame loop — the reference's variant.

Pinned semantics (lib/hits.py:15-59):
 - QUIRK reproduced as written: BOTH hub and authority accumulate over a
   doc's OUT-links (hits.py:36-37 use the same linked_docs) — this is NOT
   standard HITS (standard auth sums over in-links).
 - init hub=auth=1 for the full universe (incl. dropped docs)
 - each iteration L2-normalizes both vectors (norm computed driver-side,
   one scalar per vector)
 - converged when ALL deltas of both vectors < tol; post-update kept
 - max_iter=25, tol=1e-6

Per iteration: ONE join of edges against the score table at dst carrying
both hub and auth, one shuffle agg by src — hub and auth share the join.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..params import HITS_MAX_ITER, HITS_TOL


def hits_df(
    spark: SparkSession,
    universe: DataFrame,
    edges: DataFrame,
    max_iter: int = HITS_MAX_ITER,
    tol: float = HITS_TOL,
) -> DataFrame:
    """Return (docid, hub_quality, auth_quality)."""
    scores = universe.select(
        "docid", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    ).localCheckpoint()

    e = edges.persist()
    for _ in range(max_iter):
        # sum the dst-side scores over each doc's out-links (both vectors)
        sums = (
            e.join(scores.withColumnRenamed("docid", "dst"), "dst")
            .groupBy("src")
            .agg(
                F.sum("auth").alias("new_hub"),   # hub[d] = Σ auth[out(d)]
                F.sum("hub").alias("new_auth"),   # auth[d] = Σ hub[out(d)] (quirk)
            )
        )
        raw = (
            universe.join(sums.withColumnRenamed("src", "docid"), "docid", "left")
            .select(
                "docid",
                F.coalesce("new_hub", F.lit(0.0)).alias("new_hub"),
                F.coalesce("new_auth", F.lit(0.0)).alias("new_auth"),
            )
            .localCheckpoint()
        )
        norms = raw.agg(
            F.sqrt(F.sum(F.col("new_hub") ** 2)).alias("hn"),
            F.sqrt(F.sum(F.col("new_auth") ** 2)).alias("an"),
        ).first()
        hn = norms["hn"] or 0.0
        an = norms["an"] or 0.0
        new = raw.select(
            "docid",
            (F.col("new_hub") / hn if hn > 0 else F.col("new_hub")).alias("hub"),
            (F.col("new_auth") / an if an > 0 else F.col("new_auth")).alias("auth"),
        ).localCheckpoint()
        delta = (
            new.join(
                scores.withColumnRenamed("hub", "oh").withColumnRenamed(
                    "auth", "oa"
                ),
                "docid",
            )
            .agg(
                F.max(F.abs(F.col("hub") - F.col("oh"))).alias("dh"),
                F.max(F.abs(F.col("auth") - F.col("oa"))).alias("da"),
            )
            .first()
        )
        scores = new
        if (
            delta["dh"] is not None
            and delta["dh"] < tol
            and delta["da"] is not None
            and delta["da"] < tol
        ):
            break
    return scores.select(
        "docid",
        F.col("hub").alias("hub_quality"),
        F.col("auth").alias("auth_quality"),
    )
