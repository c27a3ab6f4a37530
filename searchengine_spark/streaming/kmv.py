"""Streaming distinct-bigram cardinality — keyed KMV sketch state
(``applyInPandasWithState``).

The batch op (ops/mix.kmv_distinct) carries an exact distinct count
next to the sketch as its test-scale evaluation column; a stream CANNOT
— exact distinct over an unbounded stream needs unbounded state.  The
sketch is the whole point: per language the state is just the k
smallest DISTINCT 32-bit hashes seen so far (k longs, fixed), merged
with each micro-batch's hashes and re-truncated.  Every batch emits the
language's refreshed (kth, n_est) row when the sketch changed.

The invariant here is STRONGER than the ordered-waves contracts of the
other streaming twins (spans/pack/funnel): KMV merge is exact and
ORDER-INDEPENDENT — min-k of a union does not care how the union was
split — so the final per-language estimate equals the batch op's for
ANY partition of the corpus into micro-batches, in any order
(tests/test_streaming_kmv.py shuffles the waves to prove it).

Hashing matches the batch op bit-for-bit: u32 = first 8 hex chars of
md5("lang:lhs:rhs") over the per-doc adjacent-bigram stream, computed
here in the Arrow batch (hashlib) instead of the SQL expression — the
same bytes either way.  NoTimeout: a language's sketch lives forever
(k longs per language — state that small never needs a TTL).
"""

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession

import pandas as pd
from pyspark.sql.streaming.state import GroupStateTimeout

from ..ops.mix import KMV_K
from ..text.tokenizer import TOKEN_PATTERN

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
KMV_OUT_SCHEMA = "lang string, kth long, n_est double"
KMV_STATE_SCHEMA = "ks array<long>"

_TOK_RE = re.compile(TOKEN_PATTERN)


def _batch_u32s(lang: str, texts) -> set:
    """The batch op's hash, in-kernel: distinct u32 of every adjacent
    bigram of every text, keyed by lang."""
    out = set()
    for t in texts:
        toks = _TOK_RE.findall(t.lower())
        for a, b in zip(toks, toks[1:]):
            h = hashlib.md5(f"{lang}:{a}:{b}".encode()).hexdigest()
            out.add(int(h[:8], 16))
    return out


def kmv_docs_stream(stream: DataFrame, k: int = KMV_K) -> DataFrame:
    """documents stream → stream of per-language refreshed
    (lang, kth, n_est) sketch rows (emitted when the sketch changed
    and is full)."""

    def update(key, pdfs, state):
        lang = key[0]
        old = [int(x) for x in state.get[0]] if state.exists else []
        texts = pd.concat(list(pdfs), ignore_index=True)["text"]
        merged = sorted(set(old) | _batch_u32s(lang, texts))[:k]
        if merged == old:
            return
        state.update((merged,))
        if len(merged) == k:
            kth = merged[-1]
            est = round((k - 1) * 4294967296.0 / kth, 6)
            yield pd.DataFrame(
                [(lang, kth, est)], columns=["lang", "kth", "n_est"]
            )

    return stream.groupBy("lang").applyInPandasWithState(
        update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_stream(spark: SparkSession, src_dir: str,
               max_files_per_trigger: int | None = None) -> DataFrame:
    """KMV sketch stream over a directory of documents parquet files."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option(
            "maxFilesPerTrigger", str(max_files_per_trigger)
        )
    return kmv_docs_stream(reader.parquet(src_dir))
