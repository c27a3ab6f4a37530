"""Decontamination-on-arrival: the streaming gate for ops/mix.decontaminate.

Batch decontamination (ops/mix.py) is a shuffle join keyed on the
n-gram — right for auditing an existing corpus.  At ingest time the
standard deployment (GPT-3 appendix C shape) is the other way around:
the EVAL set's n-grams are a fixed artifact, so they ship to every
executor once and each arriving document is checked statelessly.  No
shuffle, no state store: the stream stays append-only and
embarrassingly parallel, which is what lets the gate ride an
unbounded 10^12-doc ingest.

Two membership structures, same plumbing (decontaminate_stream
accepts either):

* ``eval_shingle_set`` — the exact broadcast set, right for real
  benchmark suites (10^4-10^6 shingles);
* ``eval_shingle_bloom`` — a Bloom filter BUILT DISTRIBUTIVELY (the
  billions-of-shingles path): executors fold their shingle partitions
  into sparse (word_index, word) pairs, one bit_or shuffle merges
  them, and only the fixed-size BITMAP crosses the driver — never the
  shingle strings (m bits ≈ 1.2 GB at 10^9 shingles / 1 % fpr, vs
  ~100 GB of raw 13-grams).  One-sided by construction: a member is
  ALWAYS contained (no false negatives — contaminated docs can never
  slip through); a false positive drops a clean doc at ~fpr, the
  conservative direction for decontamination.

Semantics are pinned to the batch operator: same tokenizer regex, same
n, a doc is contaminated iff it shares >= 1 distinct n-token shingle
with the eval set (tests assert the surviving set equals the batch
op's survivors on the same data, through BOTH gates).
"""

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.xxhash64 import xxh64
from ..ops.mix import DECON_EVAL_MOD, DECON_MAX_SHINGLE_DF, DECON_NGRAM
from ..text.tokenizer import ngrams, tokenize

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def text_shingles(text: str, n: int = DECON_NGRAM):
    """Distinct n-token shingles of one text — composed from the pinned
    tokenizer spec (text/tokenizer.py), the same functions every other
    pure-Python surface uses, so a tokenizer change can't silently
    diverge here."""
    return set(ngrams(tokenize(text), n))


def eval_shingle_set(docs: DataFrame, n: int = DECON_NGRAM,
                     eval_mod: int = DECON_EVAL_MOD,
                     train_docs: DataFrame | None = None,
                     max_shingle_df: int = DECON_MAX_SHINGLE_DF) -> set:
    """The eval slice's distinct n-grams, collected to the driver.

    The eval set is the BENCHMARK, not the corpus — bounded and known
    up front, so materializing it once is the intended shape (the
    13-gram set of every public benchmark is millions of entries, not
    trillions).  Past broadcast-comfort size, build a Bloom filter from
    this same DataFrame instead and keep everything else unchanged.

    ``train_docs``: when given, n-grams occurring in more than
    ``max_shingle_df`` of those docs are REMOVED from the eval set —
    the batch operator's hot-shingle cap expressed on the other side of
    the join (dropping a hot shingle from the train side and dropping
    it from the eval set cut the same pairs), so the stream gate built
    from a corpus snapshot matches ops/mix.decontaminate over that
    corpus exactly even when the cap fires."""
    ev = _eval_shingles_df(docs, n, eval_mod, train_docs,
                           max_shingle_df)
    return {r["shingle"] for r in ev.collect()}


def _eval_shingles_df(docs: DataFrame, n: int, eval_mod: int,
                      train_docs: DataFrame | None,
                      max_shingle_df: int) -> DataFrame:
    """The eval slice's distinct shingles as a DataFrame — the shared
    derivation behind both membership builds (exact set and Bloom)."""
    from ..ops.dedup import doc_shingles

    sh = docs.filter(F.col("doc_id") % eval_mod == 0).select(
        "doc_id", "text"
    )
    ev = doc_shingles(sh, n=n).select("shingle").distinct()
    if train_docs is not None:
        hot = (
            doc_shingles(
                train_docs.select("doc_id", "text"), n=n
            )
            .groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        ev = ev.join(hot, "shingle", "left_anti")
    return ev


class ShingleBloom:
    """Broadcast-able Bloom filter over shingle strings.

    Kirsch–Mitzenmacher double hashing over the repo's pure-Python
    xxh64 (seeds 42 / 1337, step forced odd), ``m`` a power of two so
    positions are a mask, bitmap stored as a numpy uint64 word array.
    ``contains`` is True for EVERY inserted member (one-sided — the
    property test in tests/test_streaming_decon.py); non-members hit
    at ~``fpr``."""

    def __init__(self, m_bits: int, k: int, words):
        import numpy as np

        assert m_bits & (m_bits - 1) == 0, "m must be a power of two"
        self.m = m_bits
        self.k = k
        self.words = np.asarray(words, dtype=np.uint64)
        assert self.words.size == m_bits >> 6

    @staticmethod
    def params(n_items: int, fpr: float):
        """(m_bits, k) for ``n_items`` at target ``fpr`` — textbook
        sizing, m rounded UP to a power of two (so the realized rate
        is at or below target)."""
        n_items = max(int(n_items), 1)
        m = max(
            64,
            int(math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2))),
        )
        m = 1 << (m - 1).bit_length()
        k = max(1, round(m / n_items * math.log(2)))
        return m, k

    @staticmethod
    def _hashes(shingle: str):
        b = shingle.encode("utf-8")
        return xxh64(b, 42), xxh64(b, 1337) | 1

    def bit_positions(self, shingle: str):
        h1, h2 = self._hashes(shingle)
        mask = self.m - 1
        return [(h1 + i * h2) & mask for i in range(self.k)]

    def contains(self, shingle: str) -> bool:
        import numpy as np

        w = self.words
        for pos in self.bit_positions(shingle):
            if not (int(w[pos >> 6]) >> (pos & 63)) & 1:
                return False
        return True

    def __contains__(self, shingle: str) -> bool:
        return self.contains(shingle)


def eval_shingle_bloom(docs: DataFrame, n: int = DECON_NGRAM,
                       eval_mod: int = DECON_EVAL_MOD,
                       train_docs: DataFrame | None = None,
                       max_shingle_df: int = DECON_MAX_SHINGLE_DF,
                       fpr: float = 1e-4) -> ShingleBloom:
    """Distributed Bloom build over the eval slice's shingles — the
    billions-of-shingles membership structure.

    Plan: one distinct-shingle count (sizes the bitmap), then one
    mapInArrow pass that folds each partition's shingles into SPARSE
    (word_index, word) pairs (local bitwise OR first — a partition
    emits each touched word once), one bit_or shuffle keyed on
    word_index, and a driver collect of the merged nonzero words.
    The driver sees O(min(m/64, k·n)) words — the fixed-size bitmap —
    never a shingle string; the hash rule is the same pure-Python
    xxh64 the stream-side ``contains`` replays, so build and probe
    can never disagree."""
    ev = _eval_shingles_df(docs, n, eval_mod, train_docs,
                           max_shingle_df)
    n_items = ev.count()
    m, k = ShingleBloom.params(n_items, fpr)

    def to_words(batches):
        import numpy as np
        import pyarrow as pa

        mask = m - 1
        acc: dict = {}
        for rb in batches:
            for s in rb.column(0).to_pylist():
                b = s.encode("utf-8")
                h1 = xxh64(b, 42)
                h2 = xxh64(b, 1337) | 1
                for i in range(k):
                    pos = (h1 + i * h2) & mask
                    wi = pos >> 6
                    acc[wi] = acc.get(wi, 0) | (1 << (pos & 63))
        if acc:
            wis = np.fromiter(acc.keys(), dtype=np.int64,
                              count=len(acc))
            wvs = np.fromiter(
                (v - (1 << 64) if v >= (1 << 63) else v
                 for v in acc.values()),
                dtype=np.int64, count=len(acc),
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(wis), pa.array(wvs)], names=["wi", "wv"]
            )

    merged = (
        ev.mapInArrow(to_words, schema="wi long, wv long")
        .groupBy("wi")
        .agg(F.bit_or("wv").alias("wv"))
        .collect()
    )
    import numpy as np

    words = np.zeros(m >> 6, dtype=np.uint64)
    for r in merged:
        words[int(r["wi"])] = np.uint64(int(r["wv"]) & ((1 << 64) - 1))
    return ShingleBloom(m, k, words)


def decontaminate_stream(
    spark: SparkSession,
    src_dir: str,
    shingles,
    out_dir: str,
    checkpoint_dir: str,
    n: int = DECON_NGRAM,
) -> None:
    """Drain pending doc files (availableNow), drop every contaminated
    doc, append survivors to ``out_dir`` parquet.  Exactly-once per
    input file via the checkpoint; stateless, so a restart needs no
    state-store recovery.  Call again as new files land.

    ``shingles`` is the broadcast membership structure: an exact
    ``set`` (eval_shingle_set) or a ``ShingleBloom``
    (eval_shingle_bloom) — both support ``in``, so the gate is
    structure-agnostic."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(shingles)

    @F.pandas_udf("boolean")
    def _clean(texts: pd.Series) -> pd.Series:
        ev = bc.value
        # null text = shingle-free = clean (batch parity: doc_shingles
        # maps NULL to an empty shingle set)
        return texts.map(
            lambda t: t is None
            or not any(s in ev for s in text_shingles(t, n))
        )

    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    q = (
        src.filter(_clean(F.col("text")))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("decontaminate stream did not drain in 600s")
