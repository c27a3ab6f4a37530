"""Streaming embedding ingest → incremental IVF generations.

The vector-index counterpart of streaming/ingest.py: a file-source
stream of (vec_id, embedding) parquet feeds ``foreachBatch``
micro-batches through ops.vectors.append_ivf — each batch becomes one
committed cell generation, assigned with the STORED quantizer (no
retrain, the append_ivf contract).  Two commit layers compose for
exactly-once:

 - the streaming checkpoint replays nothing already committed across
   availableNow restarts (per input file);
 - append_ivf's ``batch_tag`` makes the one uncovered window — a crash
   AFTER the manifest rename but BEFORE the checkpoint commit — safe:
   the replayed batch finds its tag in the manifest and no-ops.

Scale notes: per micro-batch work is one broadcast join against the
k-row centroid table plus a partitioned parquet append — no global
shuffle, no unbounded state.  Periodic compact_ivf folds the
accumulated generations into one base (the GC/merge point), exactly
like compact_stream_to_segment on the text side.
"""

from pyspark.sql import DataFrame, SparkSession

# matches the stored embeddings table (list<float>): the streamed rows
# must enter the quantizer in the SAME numeric type the build used, or
# assignment cosines could differ across the batch/stream boundary
EMB_SCHEMA = "vec_id long, embedding array<float>"


def stream_embeddings(spark: SparkSession, input_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(EMB_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def incremental_ivf(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain newly-arrived embedding files into the persisted IVF index
    at ``index_dir`` (which must exist — the quantizer is trained by a
    prior build_ivf_index; a stream by definition never has the full
    pass training needs).  Returns after the availableNow stream
    drains; call again after new files land.

    Batch tags are namespaced by the STREAM's identity (the query id
    Structured Streaming persists in the checkpoint's metadata file),
    not just the batch number: batch ids restart at 0 whenever the
    checkpoint is recreated, and an un-namespaced ``stream:0`` from the
    old run would make the manifest silently swallow the new stream's
    first batches as replays.  A fresh checkpoint gets a fresh query
    id, so its batches are new tags; the SAME checkpoint replaying
    after a crash keeps its id, so the replay still no-ops.  Empty
    micro-batches are handled inside append_ivf (tag-only commit)."""
    from ..ops.vectors import append_ivf

    stream = stream_embeddings(spark, input_dir, max_files_per_trigger)

    def _stream_id() -> str:
        # written by Structured Streaming at stream start, stable for
        # the lifetime of the checkpoint dir
        import json
        import os

        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]

    def process_batch(batch_df: DataFrame, batch_id: int):
        append_ivf(
            spark,
            batch_df.select("vec_id", "embedding"),
            index_dir,
            batch_tag=f"stream:{_stream_id()}:{batch_id}",
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
