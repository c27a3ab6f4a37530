"""Streaming as-of attribution — per-user keyed state
(``applyInPandasWithState``).

The batch op (ops/events.asof_attribution) joins each purchase as-of
to the latest same-user click at or before its timestamp (argmax over
(ts, event_id), inclusive).  The streaming twin carries that argmax as
keyed state: per user, the best click seen so far as (cts ns, cid).
Each micro-batch sorts the user's arrivals by (ts, kind, event_id) —
kind 0 = click, 1 = purchase, the SAME total order the batch window
uses, so a click in the same microsecond as a purchase attributes it —
and walks once: clicks advance the state iff (ts, event_id) exceeds
it, purchases emit one attribution row against the current state.

Equality contract (the funnel/spans "ordered waves" rule, asserted in
tests/test_streaming_attribution.py): when micro-batches partition the
events in EVENT-TIME order, the emitted rows equal the batch op
exactly.  Out-of-order delivery ACROSS batches degrades monotonically:
a late-arriving click older than the state cannot replace it, and a
late-arriving purchase OLDER than the state click emits unmatched
(click_id 0 / lag_us -1) rather than attribute a click from its future
— the as-of rule (src.ts <= tgt.ts) is never violated, only match
recall degrades.

Scale: state is two longs per ACTIVE user, sharded by the state store
across executors (RocksDB-backed at scale); each user group sorts only
its own batch arrivals; no shuffle beyond the groupBy key.  NoTimeout
keeps state forever (the batch semantics); a deployment would TTL
idle users, bounding state at the active-user set.
"""

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupStateTimeout

from ..ops.events import ASOF_SRC, ASOF_TGT
from .windows import EVENTS_SCHEMA

ATTR_OUT_SCHEMA = (
    "event_id long, user_id long, click_id long, lag_us long"
)
ATTR_STATE_SCHEMA = "cts long, cid long"


def attribution_events_stream(stream: DataFrame,
                              src: str = ASOF_SRC,
                              tgt: str = ASOF_TGT) -> DataFrame:
    """events stream → stream of per-purchase attribution rows
    (event_id, user_id, click_id, lag_us), one per ``tgt`` event."""

    def attribute(key, pdfs, state):
        user = key[0]
        if state.exists:
            cts, cid = state.get
        else:
            cts, cid = -1, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch[batch["event_type"].isin((src, tgt))]
        if len(batch) == 0:
            return
        # the batch window's total order: src rows before tgt at
        # equal ts (inclusive <=), event_id breaks exact-ts ties
        batch["kind"] = (batch["event_type"] == tgt).astype("int64")
        batch = batch.sort_values(
            ["ts", "kind", "event_id"], kind="mergesort"
        )
        out = []
        for r in batch.itertuples():
            t = int(pd.Timestamp(r.ts).value)
            if r.kind == 0:
                if (t, int(r.event_id)) > (cts, cid):
                    cts, cid = t, int(r.event_id)
            else:
                if cid and cts <= t:
                    out.append(
                        (int(r.event_id), user, cid, (t - cts) // 1000)
                    )
                else:
                    out.append((int(r.event_id), user, 0, -1))
        state.update((int(cts), int(cid)))
        if out:
            yield pd.DataFrame(
                out,
                columns=["event_id", "user_id", "click_id", "lag_us"],
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        attribute,
        outputStructType=ATTR_OUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_stream(spark: SparkSession, src_dir: str,
                       max_files_per_trigger: int | None = None
                       ) -> DataFrame:
    """Attribution stream over a directory of event parquet files.
    ts stays TIMESTAMP_NTZ end to end — arrival-driven (NoTimeout, no
    watermark), so no wall-clock cast is needed."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return attribution_events_stream(reader.parquet(src_dir))


def run_attribution_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain ``input_dir`` through the stateful attributor into
    ``out_dir`` (availableNow; call again as new files land — the
    checkpoint restores per-user state, and a replayed micro-batch
    re-emits into the same ``batch=<id>`` dir, so the output stays
    exactly-once — the run_dedup_stream sink contract)."""
    q = (
        attribution_stream(spark, input_dir, max_files_per_trigger)
        .writeStream.foreachBatch(
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
