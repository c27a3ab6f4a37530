"""spark-submit job: persisted-IVF vector-index build + maintenance.

The vector-side companion of build_index_job.py / maintain_index_job.py
(ops/vectors.py build_ivf_index / append_ivf / delete_vectors /
compact_ivf) — a deployment runs it against an index directory:

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/maintain_ivf_job.py --index /path/to/ivf \
        [--build SF_DIR] [--append PARQUET_DIR] \
        [--delete-ids 1,2,3 | --delete-parquet DIR] [--compact] \
        [--probe-vec-id N]

Operations run in the flag order above (build → append → delete →
compact), each committing through the index's crash-safe manifest
protocol, so one invocation can be a whole maintenance window.
``--probe-vec-id`` finishes with a served top-10 (ivf_topk_ondisk)
as an end-to-end smoke probe.  Prints ONE JSON line with what changed.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True, help="IVF index dir")
    ap.add_argument("--build", default=None,
                    help="sf dir with embeddings.parquet: train + build")
    ap.add_argument("--append", default=None,
                    help="parquet dir of new (vec_id, embedding) rows")
    ap.add_argument("--delete-ids", default=None,
                    help="comma-separated vec_ids to tombstone")
    ap.add_argument("--delete-parquet", default=None,
                    help="parquet dir with a vec_id column to tombstone")
    ap.add_argument("--compact", action="store_true",
                    help="fold generations minus tombstones into one base")
    ap.add_argument("--probe-vec-id", type=int, default=None,
                    help="serve a top-10 for this vector as a smoke probe")
    args = ap.parse_args()
    if not (args.build or args.append or args.delete_ids
            or args.delete_parquet or args.compact):
        ap.error("nothing to do")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("searchengine-maintain-ivf")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.ops.vectors import (
        _ivf_manifest,
        append_ivf,
        build_ivf_index,
        compact_ivf,
        delete_vectors,
        ivf_topk_ondisk,
    )

    t0 = time.time()
    out = {"metric": "ivf maintenance", "index": args.index, "ops": []}

    if args.build:
        emb = spark.read.parquet(
            f"{args.build}/embeddings.parquet"
        ).select("vec_id", "embedding")
        build_ivf_index(spark, emb, args.index)
        out["ops"].append({"op": "build", "input": args.build})

    if args.append:
        new = spark.read.parquet(args.append).select(
            "vec_id", "embedding"
        )
        gname = append_ivf(spark, new, args.index)
        out["ops"].append({"op": "append", "generation": gname})

    if args.delete_ids or args.delete_parquet:
        if args.delete_ids:
            ids = [int(x) for x in args.delete_ids.split(",") if x]
        else:
            ids = spark.read.parquet(args.delete_parquet).select(
                F.col("vec_id").cast("long")
            )
        tname = delete_vectors(spark, args.index, ids)
        out["ops"].append({"op": "delete", "tombstone": tname})

    if args.compact:
        base = compact_ivf(spark, args.index)
        out["ops"].append({"op": "compact", "base": base})

    m = _ivf_manifest(args.index)
    out["manifest"] = {
        "base": m["base"],
        "n_generations": len(m["generations"]),
        "n_tombstone_sets": len(m["tombstones"]),
    }

    if args.probe_vec_id is not None:
        # the probe vector must come from the stored cells: scan the
        # committed generations directly (tiny lookup, pruned by cid is
        # not possible for an id lookup — this is a smoke probe)
        from searchengine_spark.ops.vectors import _read_cells

        row = (
            _read_cells(spark, args.index, None)
            .filter(F.col("vec_id") == args.probe_vec_id)
            .select("embedding")
            .first()
        )
        if row is None:
            raise SystemExit(
                f"probe vec_id {args.probe_vec_id} not in the index"
            )
        res = ivf_topk_ondisk(
            spark, args.index, row["embedding"], k=10,
            exclude_vec_id=args.probe_vec_id,
        ).collect()
        out["probe"] = [
            {"vec_id": r["vec_id"], "cosine": r["cosine"]} for r in res
        ]

    out["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
