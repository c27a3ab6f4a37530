"""Streaming funnel tracking — per-user keyed state
(``applyInPandasWithState``).

The batch op (ops/events.funnel_conversion) computes the ordered
funnel over the whole events table with chained min-ts aggregations; a
stream must advance users ONLINE.  State per user = (step, tns): the
number of funnel steps completed and the ns timestamp of the last
completed step's first match.  Each micro-batch sorts the user's
arrivals by (ts, event_id) — the batch total order — and advances
greedily: an event of type FUNNEL_STEPS[step] STRICTLY after tns
completes the next step and emits one row per advance.  The greedy
scan over the ts-ordered stream picks exactly the chained min-ts
matches, so it IS the batch rule (first match of step i after the
step-(i-1) match).

Equality contract (the spans/pack "ordered waves" rule, asserted in
tests/test_streaming_funnel.py): when micro-batches partition the
events in EVENT-TIME order, the final per-user step equals the batch
op's reached sets exactly.  Out-of-order delivery ACROSS batches
degrades monotonically — a late-arriving event older than an already-
taken step cannot retro-advance (state only moves forward), and
within one micro-batch arrival order is irrelevant (the sort).

Scale: state is two longs per ACTIVE user, sharded by the state store
across executors (RocksDB-backed at scale); each user group sorts only
its own batch arrivals (bounded); no driver state, no shuffle beyond
the groupBy key.  ``NoTimeout`` keeps user state forever (the batch
semantics); a deployment would TTL idle users and accept funnel resets
past the window.
"""

from pyspark.sql import DataFrame, SparkSession

import pandas as pd
from pyspark.sql.streaming.state import GroupStateTimeout

from ..ops.events import FUNNEL_STEPS
from .windows import EVENTS_SCHEMA

FUNNEL_OUT_SCHEMA = (
    "user_id long, step long, event_type string, ts timestamp_ntz"
)
FUNNEL_STATE_SCHEMA = "step long, tns long"


def funnel_events_stream(stream: DataFrame,
                         steps=FUNNEL_STEPS) -> DataFrame:
    """events stream → stream of per-user funnel ADVANCE rows
    (user_id, step, event_type, ts), one per step completion."""
    steps = tuple(steps)

    def advance(key, pdfs, state):
        user = key[0]
        if state.exists:
            step, tns = state.get
        else:
            step, tns = 0, -1
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        out = []
        for r in batch.itertuples():
            if step >= len(steps):
                break
            if r.event_type == steps[step]:
                t = int(pd.Timestamp(r.ts).value)
                if step == 0 or t > tns:
                    step += 1
                    tns = t
                    out.append((user, step, r.event_type, r.ts))
        state.update((int(step), int(tns)))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "step", "event_type", "ts"]
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream(spark: SparkSession, src_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Funnel-advance stream over a directory of event parquet files.
    ts stays TIMESTAMP_NTZ end to end — the operator is arrival-driven
    (NoTimeout, no watermark), so no wall-clock cast is needed."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return funnel_events_stream(reader.parquet(src_dir))


def run_funnel_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
):
    """Drain ``input_dir`` through the stateful funnel into ``out_dir``
    (availableNow; call again as new files land — the checkpoint
    restores per-user state, so a replayed micro-batch re-emits into
    the same ``batch=<id>`` dir and the output stays exactly-once, the
    run_dedup_stream sink contract)."""
    q = (
        funnel_stream(spark, input_dir, max_files_per_trigger)
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
