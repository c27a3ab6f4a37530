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
    drains; call again after new files land."""
    from ..ops.vectors import append_ivf

    stream = stream_embeddings(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            # an empty partitioned parquet dir has no readable schema —
            # commit nothing (the checkpoint still records the batch)
            return
        append_ivf(
            spark,
            batch_df.select("vec_id", "embedding"),
            index_dir,
            batch_tag=f"stream:{batch_id}",
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
