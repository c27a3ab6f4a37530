"""Streaming corpus ingest → incremental postings (Structured Streaming).

The reference has no streaming (SURVEY.md §2.8) — its only incremental
mode is resume-from-checkpoint (lib/writer.py:40-57).  This module is
the Spark-native upgrade: a file-source stream of corpus rows feeds
``foreachBatch`` micro-batches through the SAME analyze UDF as the
batch pipeline, appending per-batch postings/docs parquet.  Streaming
checkpointing gives exactly-once per input file (a restart re-reads
nothing already committed) — the streaming generalization of the
build manifest's resume contract.

Scale notes: per micro-batch work is the map-side analyze UDF plus one
append write — no global shuffle, no unbounded state; watermark-style
state is not needed because postings aggregation is per-doc (map-side)
and the merge into the final compressed index is the batch write_index
job over the accumulated staging dir.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text.udfs import POSTINGS_SCHEMA, make_analyze_partition

CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def stream_corpus(spark: SparkSession, input_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(CORPUS_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def incremental_postings(
    spark: SparkSession,
    input_dir: str,
    stage_dir: str,
    checkpoint_dir: str,
    stem: bool = True,
):
    """Run the streaming ingest until no new files remain (availableNow).

    Appends to ``{stage_dir}/postings`` and ``{stage_dir}/docs``; doc
    identity is content-addressed — ``docid = xxhash64(repo, path,
    commit)`` — so ids are stable across micro-batches and restarts
    without any global coordination (the batch pipeline's dense
    range-rank ids need a full pass, which a stream by definition never
    has; SURVEY.md §1.2 offers both keying rules).

    Returns after the stream drains; call again after new files land —
    the checkpoint skips everything already processed.
    """
    stream = stream_corpus(spark, input_dir)
    analyze = make_analyze_partition(stem=stem)

    def process_batch(batch_df: DataFrame, batch_id: int):
        ids = batch_df.withColumn(
            "docid", F.xxhash64("repo", "path", "commit")
        )
        postings = ids.select("docid", "content").mapInPandas(
            analyze, schema=POSTINGS_SCHEMA
        )
        postings.write.mode("append").parquet(f"{stage_dir}/postings")
        ids.select(
            "docid", "repo", "path", "commit", "lang",
            F.sha2("content", 256).alias("sha256"),
        ).write.mode("append").parquet(f"{stage_dir}/docs")

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_stream_to_segment(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    processed_marker: str,
    merge_factor: int | None = None,
    upsert: bool = False,
    **build_kwargs,
):
    """Fold newly-arrived corpus files into the segmented index.

    The streaming half of the segment story (index/segments.py): corpus
    parquet accumulates under ``input_dir``; each compaction call reads
    the files not covered by the previous call (tracked in a marker
    file, the same exactly-once idea as the streaming checkpoint),
    builds ONE new generation from them via append_segment — which
    dedups against every earlier generation and continues the dense
    docid space — and advances the marker atomically.

    Returns the new segment name, or None when nothing new arrived.
    This is the batch-compaction companion to incremental_postings:
    micro-batch appends stage raw postings for low-latency serving,
    while compaction periodically folds the backlog into first-class
    compressed, WAND-servable segments.

    ``upsert=True`` treats the arrivals as a CHANGES FEED instead of
    pure inserts: waves route through segments.upsert_segment, so a
    re-sent (repo, path) with changed content replaces its old doc
    (tombstone + append) while unchanged re-sends keep their docids —
    and since upsert is content-idempotent, a crash between the append
    commit and the marker advance replays harmlessly (the marker is
    belt-and-braces against re-reading, not the correctness anchor in
    this mode).

    ``merge_factor`` switches on LSM behavior under continuous
    arrival: after each committed append, size-tiered partial merges
    (segments.maybe_merge) run until no tier is full, so the segment
    count stays O(merge_factor · log N) no matter how many waves
    arrive.  Merges run AFTER the marker advance — the append is
    already committed, and a crash mid-merge leaves only invisible
    orphans; the next call (or a manual maybe_merge) resumes the
    policy from committed state.
    """
    import json
    import os

    from ..index.segments import append_segment

    seen = set()
    if os.path.exists(processed_marker):
        with open(processed_marker) as f:
            seen = set(json.load(f)["files"])
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    new = [f for f in files if f not in seen]
    if not new:
        return None
    corpus = spark.read.schema(CORPUS_SCHEMA).parquet(*new)
    if upsert:
        from ..index.segments import upsert_segment

        name = upsert_segment(
            spark, index_dir, corpus, **build_kwargs
        )["segment"]
    else:
        name = append_segment(spark, index_dir, corpus, **build_kwargs)
    tmp = processed_marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 1, "files": sorted(seen | set(new))}, f)
    os.replace(tmp, processed_marker)
    if merge_factor:
        from ..index.segments import maybe_merge

        while maybe_merge(
            spark, index_dir, merge_factor=merge_factor
        ) is not None:
            pass
    return name
