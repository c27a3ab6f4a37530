"""spark-submit job: segmented-index maintenance (compact / merge).

The operational companion to build_index_job.py for the incremental
path (index/segments.py): a cron-style job a deployment runs against a
generations directory —

    spark-submit --master <cluster> \
        --py-files dist/searchengine_spark.zip \
        tools/maintain_index_job.py --index /path/to/segments \
        [--compact] [--merge] [--simhash-bits 64]

``--delete-ids 3,17``: explicit delete-by-id (segments.delete_docs) —
tombstoned immediately, physically reclaimed by the next merge/expunge.
``--compact``: cross-segment near-dup compaction from stored
fingerprints — tombstones only, no segment rewrite; serving state
(stats, termdict df, block maxima) stays exact (segments.py).
``--merge``: physical rewrite of all generations minus tombstones into
one fresh segment (the reference's merge step, lib/writer.py:166-300
behavior), resetting tombstone state.  ``--compact --merge`` runs both
in order — the typical maintenance window.
``--tiered [--merge-factor N]``: size-tiered PARTIAL merge instead —
repeatedly merge the first adjacent same-tier run of N segments
(segments.maybe_merge), the 100-TB steady-state policy where a full
rewrite per window is not an option.
``--sync-trigram TRI_DIR``: propagate this index's tombstones into the
trigram grep shard (GDPR forgetting must reach every serving surface);
runs BEFORE any physical merge — merges reset the tombstone state the
sync reads.  Idempotent, so a window that also merges loses nothing.
``--backup DST`` / ``--restore-from SRC [--overwrite]`` /
``--verify-backup DIR``: crash-safe snapshot machinery
(index/backup.py — manifest-last, concurrent-commit safe, Spark-free;
backup runs AFTER maintenance, restore BEFORE).

Prints ONE JSON line with what changed.
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True,
                    help="segmented index dir (segments.json inside)")
    ap.add_argument("--compact", action="store_true",
                    help="tombstone cross-segment near-dups")
    ap.add_argument("--merge", action="store_true",
                    help="physically merge generations (minus tombstones)")
    ap.add_argument("--tiered", action="store_true",
                    help="size-tiered partial merges until no tier is full")
    ap.add_argument("--merge-factor", type=int, default=4,
                    help="segments per tier before a tiered merge fires")
    ap.add_argument("--expunge", type=float, metavar="MAX_DEL_FRAC",
                    default=None,
                    help="rewrite segments whose tombstone fraction "
                         "exceeds this (Lucene expungeDeletes)")
    ap.add_argument("--simhash-bits", type=int, default=64,
                    choices=(32, 64),
                    help="must match the bits the segments were built with")
    ap.add_argument("--delete-where", default=None, metavar="SQL",
                    help="tombstone every LIVE doc whose metadata row "
                         "(repo/path/commit/sha256/url) matches the "
                         "SQL predicate, e.g. \"repo = 'src1'\"")
    ap.add_argument("--delete-ids", default=None,
                    help="comma-separated docids to tombstone "
                         "(segments.delete_docs; reclaimed by the next "
                         "merge/expunge)")
    ap.add_argument("--backup", default=None, metavar="DST",
                    help="snapshot the index into DST after any "
                         "maintenance (index/backup.py — Spark-free, "
                         "manifest-last, concurrent-commit safe)")
    ap.add_argument("--restore-from", default=None, metavar="SRC",
                    help="restore a verified backup into --index "
                         "BEFORE any maintenance")
    ap.add_argument("--overwrite", action="store_true",
                    help="allow --restore-from onto an existing dir")
    ap.add_argument("--verify-backup", default=None, metavar="DIR",
                    help="verify a backup dir against its manifest "
                         "and exit")
    ap.add_argument("--no-checksum", action="store_true",
                    help="size-only backup manifest (the 100-TB mode; "
                         "let the object store carry byte integrity)")
    ap.add_argument("--stats", action="store_true",
                    help="print index_stats (per-generation + TOTAL "
                         "serving row) after any maintenance")
    ap.add_argument("--fsck", action="store_true",
                    help="full index audit (segments.fsck_index): "
                         "re-derive every stored invariant from the "
                         "raw bytes; violations in the JSON line and "
                         "a nonzero exit when any are found")
    ap.add_argument("--sync-trigram", default=None, metavar="TRI_DIR",
                    help="after deletes/maintenance, propagate this "
                         "index's tombstones into the trigram grep "
                         "shard at TRI_DIR (trigram.sync_trigram_"
                         "liveness — GDPR forgetting must reach every "
                         "serving surface); idempotent")
    args = ap.parse_args()
    if not (args.compact or args.merge or args.tiered
            or args.expunge is not None or args.delete_ids
            or args.delete_where
            or args.backup or args.restore_from or args.verify_backup
            or args.stats or args.fsck or args.sync_trigram):
        ap.error("nothing to do: pass --delete-ids, --compact, "
                 "--merge, --tiered, --expunge, --backup, "
                 "--restore-from, --verify-backup, --stats, "
                 "--sync-trigram and/or --fsck")

    try:
        from searchengine_spark.index.backup import (
            backup_index,
            restore_index,
            verify_backup,
        )
    except ModuleNotFoundError:
        # Spark-free invocation without --py-files/PYTHONPATH: resolve
        # the package from the repo checkout this script lives in
        import os

        sys.path.insert(
            0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        from searchengine_spark.index.backup import (
            backup_index,
            restore_index,
            verify_backup,
        )

    if args.verify_backup:
        print(json.dumps({"metric": "backup verify",
                          **verify_backup(args.verify_backup)}))
        return
    if args.restore_from:
        restored = restore_index(
            args.restore_from, args.index, overwrite=args.overwrite
        )
    spark_work = (args.compact or args.merge or args.tiered
                  or args.expunge is not None or args.delete_ids
                  or args.delete_where or args.stats or args.fsck
                  or args.sync_trigram)
    if not spark_work:
        out = {"metric": "segment maintenance", "index": args.index}
        if args.restore_from:
            out["restored"] = restored
        if args.backup:
            out["backup"] = backup_index(
                args.index, args.backup,
                checksum=not args.no_checksum,
            )
        print(json.dumps(out))
        return
    if args.merge and args.tiered:
        ap.error("--merge and --tiered are mutually exclusive")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("searchengine-maintain")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from searchengine_spark.index.segments import (
        _read_meta,
        compact_near_dups,
        delete_docs,
        expunge_deletes,
        index_stats,
        load_segments,
        maybe_merge,
        merge_segments,
    )

    out = {"metric": "segment maintenance", "index": args.index,
           "segments_before": list(_read_meta(args.index)["segments"])}
    if args.restore_from:
        out["restored"] = restored
    t0 = time.time()
    if args.delete_ids:
        ids = [int(x) for x in args.delete_ids.split(",") if x.strip()]
        out["deleted"] = delete_docs(spark, args.index, ids)
    if args.delete_where:
        from searchengine_spark.index.segments import delete_where

        out["deleted_where"] = delete_where(
            spark, args.index, args.delete_where
        )
    if args.compact:
        out["tombstoned"] = compact_near_dups(
            spark, args.index, bits=args.simhash_bits
        )
    if args.sync_trigram:
        # BEFORE any physical merge: merge_segments/merge_run RESET the
        # text index's tombstone state (dead postings are reclaimed),
        # so the grep sync must read the tombstones while they exist
        from searchengine_spark.index.trigram import (
            sync_trigram_liveness,
        )

        out["trigram_tombstoned"] = sync_trigram_liveness(
            spark, args.sync_trigram, args.index
        )
    if args.merge:
        out["merged_into"] = merge_segments(spark, args.index)
    if args.expunge is not None:
        out["expunged"] = expunge_deletes(
            spark, args.index, max_del_frac=args.expunge
        )
    if args.tiered:
        tiered = []
        while (m := maybe_merge(
            spark, args.index, merge_factor=args.merge_factor
        )) is not None:
            tiered.append(m)
        out["tiered_merges"] = tiered
    out["segments_after"] = list(_read_meta(args.index)["segments"])
    if args.stats:
        out["stats"] = [
            r.asDict() for r in index_stats(spark, args.index).collect()
        ]
    if args.backup:
        out["backup"] = backup_index(
            args.index, args.backup, checksum=not args.no_checksum
        )
    fsck_bad = 0
    if args.fsck:
        from searchengine_spark.index.segments import fsck_index

        viol = [r.asDict() for r in
                fsck_index(spark, args.index).collect()]
        out["fsck_violations"] = viol
        fsck_bad = len(viol)
    st = load_segments(spark, args.index, cache_meta=False).stats
    out.update({
        "n_total": st["n_total"],
        "n_survivors": st["n_survivors"],
        "wall_sec": round(time.time() - t0, 3),
        "value": round(time.time() - t0, 3),
        "unit": "sec",
    })
    print(json.dumps(out))
    spark.stop()
    return 1 if fsck_bad else 0


if __name__ == "__main__":
    sys.exit(main())
