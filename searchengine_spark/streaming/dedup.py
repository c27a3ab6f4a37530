"""Streaming exact-dedup — a custom stateful operator
(``applyInPandasWithState``).

The batch pipeline dedups by sha256 with a min-docid window over the
whole corpus (index/pipeline._dedup_exact); a stream never has a whole
corpus, so dedup must be an ONLINE rule: the FIRST arrival of a content
hash survives and every later arrival — same micro-batch or any later
one — is dropped.  This is the canonical training-data-pipeline
"dedup on arrival" operator, expressed with Structured Streaming's
keyed-state API rather than a hand-rolled external store:

 * keying: ``groupBy(sha256)`` — the state store shards keys across
   executors (RocksDB-backed at scale), no state lives on the driver;
 * state per key: a 1-int "seen" marker — O(distinct contents) total,
   the minimum any exact-dedup can hold;
 * within one micro-batch all rows of a sha arrive grouped, and the
   winner is the smallest ``(repo, path, commit)`` key — arrival order
   inside a batch is an accident of file listing and must not decide
   survival (determinism: replaying the same batches yields the same
   survivor set, which the test asserts via checkpoint restart);
 * across micro-batches the checkpoint persists the state store, so a
   query restart (or ``availableNow`` re-run) never re-admits a sha it
   has already emitted — the streaming analogue of the batch
   manifest's exactly-once resume.

Production note: ``NoTimeout`` keeps every sha forever, matching the
batch semantics exactly.  A bounded-retention deployment would set a
processing-time timeout (state TTL) and accept re-admission of
contents older than the window — the standard watermark-vs-exactness
trade, decided by the operator, not hidden here.
"""

from pyspark.sql import DataFrame, SparkSession

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

CORPUS_SHA_SCHEMA = (
    "repo string, path string, commit string, lang string, "
    "content string, sha256 string"
)


def dedup_corpus_stream(stream: DataFrame) -> DataFrame:
    """corpus stream → stream of first-arrival rows, one per sha256."""
    hashed = stream.withColumn("sha256", F.sha2(F.col("content"), 256))

    def first_arrival(key, pdfs, state):
        if state.exists:
            return  # sha already emitted in an earlier batch: all dups
        batch = pd.concat(list(pdfs), ignore_index=True)
        win = batch.sort_values(
            ["repo", "path", "commit"], kind="mergesort"
        ).head(1)
        state.update((1,))
        yield win

    return hashed.groupBy("sha256").applyInPandasWithState(
        first_arrival,
        outputStructType=CORPUS_SHA_SCHEMA,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """Drain the input dir through the stateful dedup into ``out_dir``
    (availableNow trigger — call again after new files land; the
    checkpoint restores the seen-sha state, so nothing re-admits).

    The sink writes each micro-batch to a ``batch=<id>``-keyed
    subdirectory with overwrite, NOT a flat append: foreachBatch can
    replay a batch whose write succeeded but whose checkpoint commit
    did not (the state store rolls back too, so first_arrival re-emits
    the same winners) — the keyed overwrite makes the replay land on
    the same path and the output stays exactly-once.  Readers load
    ``out_dir`` as ordinary hive-partitioned parquet (the batch id
    surfaces as a partition column)."""
    from .ingest import stream_corpus

    deduped = dedup_corpus_stream(stream_corpus(spark, input_dir))
    q = (
        deduped.writeStream.foreachBatch(
            lambda df, bid: df.write.mode("overwrite").parquet(
                f"{out_dir}/batch={bid}"
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
