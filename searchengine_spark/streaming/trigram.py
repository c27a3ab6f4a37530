"""Streaming document ingest → incremental trigram generations.

The grep-index counterpart of streaming/ivf.py: a file-source stream
of (doc_id, text) parquet feeds ``foreachBatch`` micro-batches
through index.trigram.append_trigram — each batch becomes one
committed cells generation (already-indexed doc_ids anti-joined out,
so cross-batch resends of the same id cannot double a doc's trigram
rows — the coverage rule's per-doc-distinctness invariant).  Two
commit layers compose for exactly-once, the incremental_ivf contract:
the streaming checkpoint suppresses replays per input file, and
append_trigram's query-id-namespaced batch tag covers the crash
window between the manifest swap and the checkpoint commit.

Serving: the Spark path unions generations automatically; a LocalGrep
replica picks up committed generations via ``maybe_refresh`` (the
LocalSearcher/LocalANN maintenance contract).  A periodic
build_trigram_index rebuild-in-place is the compaction point when the
generation list grows long.
"""

from pyspark.sql import DataFrame, SparkSession

from .spans import DOC_SCHEMA, stream_documents


def incremental_trigram(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain newly-arrived document files into the persisted trigram
    shard at ``index_dir`` (which must exist — build_trigram_index
    first).  Returns after the availableNow stream drains; call again
    after new files land.  Empty / all-duplicate micro-batches commit
    their tag without a generation (inside append_trigram)."""
    from ..index.trigram import append_trigram

    stream = stream_documents(spark, input_dir, max_files_per_trigger)

    def _stream_id() -> str:
        import json
        import os

        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]

    def process_batch(batch_df: DataFrame, batch_id: int):
        append_trigram(
            spark,
            batch_df.select("doc_id", "text"),
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
