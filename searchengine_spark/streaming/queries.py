"""Streaming query front-end (SURVEY.md §2.8 stretch goal).

The reference serves queries from a REPL / Flask handler
(searcht.py:25-43, search.py:21-45).  The Spark-native equivalent of an
online serving loop is a query *stream*: (qid, query) rows arrive on a
file/socket source, each micro-batch is scored as one batch top-k DAG
against the loaded on-disk index, and results land on a sink (parquet
here; kafka/foreach in production).  foreachBatch reuses the exact batch
engine — streaming and batch answers are identical by construction
(asserted in tests/test_ops.py).
"""

from pyspark.sql import SparkSession

from ..index.shards import IndexShards
from ..query.scoring import score_queries_ondisk

QUERY_SCHEMA = "qid int, query string"


def serve_query_stream(
    spark: SparkSession,
    shards: IndexShards,
    query_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
):
    """Drain all pending query files (availableNow) through the batch
    scorer; append (qid, rank, docid, score) to ``out_dir``.

    Call again after new query files land — the checkpoint ensures each
    query file is answered exactly once.
    """
    stream = spark.readStream.schema(QUERY_SCHEMA).json(query_dir)

    def answer_batch(batch_df, batch_id):
        queries = [
            (r["qid"], r["query"])
            for r in batch_df.collect()
            if r["query"]
        ]
        if not queries:
            return
        res = score_queries_ondisk(spark, queries, shards, k=k)
        res.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(answer_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
