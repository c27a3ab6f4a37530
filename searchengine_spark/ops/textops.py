"""SQL-mirrorable text operators over the driver's ``documents`` table.

Every operator here is expressed twice — as a Spark DataFrame builder (this
module) and as ANSI SQL for DuckDB (__spark_entry__.oracle_sql) — with
IDENTICAL semantics, so the driver's row-count/schema/value-hash compare
passes bit-for-bit.  Tokenization is the engine's pinned regex spec
(searchengine_spark/text/tokenizer.py): maximal [a-z0-9] runs over
lowercased text.  These are unstemmed paths (DuckDB has no Porter stemmer
offline); the stemmed engine path is verified against the Python oracle in
tests/test_rank_identity.py instead.
"""

import hashlib
import os
import tempfile
from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..params import BM25_B, BM25_K1
from ..text.tokenizer import TOKEN_PATTERN, tokenize

# small fixed stopword subset used by the SQL-checkable quality scorer
QUALITY_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "are",
]


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def doc_tokens(spark, sf_dir) -> DataFrame:
    """(doc_id, pos, term) — posexplode gives positions for free
    (SURVEY.md P4 [NORTH-EXT])."""
    d = documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("pos0", "term"),
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "term")


def term_tf(spark, sf_dir) -> DataFrame:
    """Per-(doc, term) frequency — the postings TF aggregation (A2/P7)."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_length(spark, sf_dir) -> DataFrame:
    """Distinct-term count per doc — the reference's quirky total_tokens
    (makeindex.py:223-224)."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("total_tokens"))
    )


def term_dict(spark, sf_dir) -> DataFrame:
    """Term dictionary: document frequency + collection frequency (A4)."""
    return (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count("*").alias("cf"),
        )
    )


def corpus_stats(spark, sf_dir) -> DataFrame:
    """Mergeinfo analogue (lib/writer.py:284-291): corpus-level counters."""
    toks = doc_tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.countDistinct("term").alias("t"))
    return dl.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("t"), 6).alias("avgdl"),
    ).crossJoin(
        toks.agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").alias("n_tokens"),
        )
    ).select("n_docs", "n_terms", "n_tokens", "avgdl")


def dedup_exact(spark, sf_dir) -> DataFrame:
    """Exact dedup by sha256(text) (input_hint invariant): keep min doc_id
    per hash, report cluster size."""
    d = documents(spark, sf_dir).withColumn("h", F.sha2(F.col("text"), 256))
    return d.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.count("*").alias("dup_count"),
    ).select("doc_id", "dup_count")


def bm25_not_topk(spark, sf_dir, terms=("spark", "query"),
                  exclude=("hash",), k=10) -> DataFrame:
    """Boolean NOT — the third leg of the query algebra next to AND
    (bm25_topk/wand_topk) and OR (wand_or_topk): conjunctive BM25 over
    ``terms``, docs containing ANY ``exclude`` term dropped.  Exclusion
    is eligibility-only (the filtered-search rule): BM25 stats stay
    corpus-global, so scores of surviving docs equal their unexcluded
    scores exactly.

    Scale: the exclusion doc set rides a left-anti join on doc_id —
    one shuffle, no new scan (term_tf is the shared upstream); on the
    index path the same set comes from the exclude terms' postings and
    feeds the WAND kernels' liveness mask like allowed_docs does.
    """
    excl = spark.createDataFrame([(t,) for t in exclude], "term string")
    excl_docs = (
        term_tf(spark, sf_dir)
        .join(F.broadcast(excl), "term")
        .select("doc_id")
        .distinct()
    )
    return (
        _bm25_scored(spark, sf_dir, terms)
        .join(excl_docs, "doc_id", "left_anti")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_topk(spark, sf_dir, terms=("spark", "query", "join"), k=10) -> DataFrame:
    """Conjunctive BM25 top-k, unstemmed — the SQL-checkable twin of the
    engine's scorer (k1/b from params.py; idf = ln((N-df+.5)/(df+.5)+1))."""
    return (
        _bm25_scored(spark, sf_dir, terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _bm25_scored(spark, sf_dir, terms) -> DataFrame:
    """All conjunctive-BM25 matches as (doc_id, score-rounded-6) — the
    shared scoring core of bm25_topk and hybrid_rrf_topk."""
    return _bm25_scored_tf(spark, term_tf(spark, sf_dir), terms)


def _bm25_scored_tf(spark, tf, terms) -> DataFrame:
    """The _bm25_scored core with the token source factored out: scores
    an arbitrary (doc_id, term, tf) stream (stemmed_topk feeds the
    stem-mapped stream through the identical scorer)."""
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    dft = tf.join(F.broadcast(qterms), "term").groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    bm25 = (
        idf
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.col("avgdl")
            )
        )
    )
    return (
        hits.withColumn("bm25", bm25)
        .groupBy("doc_id")
        .agg(F.sum("bm25").alias("s"), F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == len(terms))
        .select("doc_id", F.round(F.col("s"), 6).alias("score"))
    )


STEM_QUERY = ("tables", "hashing")   # inflected forms absent from the
# corpus surface vocabulary — they match only THROUGH the stemmer
STEM_K = 10
# both interpolated into the DuckDB oracle — change Spark + SQL together


def stemmed_topk(spark, sf_dir, terms=STEM_QUERY, k=STEM_K) -> DataFrame:
    """Conjunctive BM25 over PORTER-STEMMED tokens — the first
    driver-level SQL oracle of the stemmed scoring path (the flagship
    engine twins are rows-only because DuckDB has no Porter offline).

    Spark computes stems VOCABULARY-sized: distinct terms → Arrow-
    batched porter_stem → broadcast stem map joined back onto the token
    stream (the analyze path's semantics in op shape; at 100 TB the
    stem map is |vocab| ~10⁷ rows, never a per-occurrence Python call).
    Query terms are stemmed with the same stemmer, so inflected
    queries ('tables hashing') match base-form documents.

    Oracle: the stem map enters the SQL as a VALUES table computed by
    the SAME pure-Python stemmer (adjudicated against the published
    Porter vectors in tests/test_text.py) over the test corpora's
    vocabulary — the SQL proves the distributed pipeline AROUND the
    stemmer (tokenize → map join → tf at stem granularity →
    distinct-stem dl quirk → conjunctive BM25), not the stemmer
    itself, which has its own vector gate.
    """
    import pandas as pd

    from ..text.porter import porter_stem

    @F.pandas_udf("string")
    def _stem(s: pd.Series) -> pd.Series:
        return s.map(porter_stem)

    toks = doc_tokens(spark, sf_dir).select("doc_id", "term")
    smap = toks.select("term").distinct().select(
        "term", _stem("term").alias("stem")
    )
    stoks = toks.join(F.broadcast(smap), "term").select(
        "doc_id", F.col("stem").alias("term")
    )
    tf = stoks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    qstems = sorted({porter_stem(t) for t in terms})
    return (
        _bm25_scored_tf(spark, tf, qstems)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# pinned parameters, interpolated into the DuckDB oracle
# (__spark_entry__.oracle_sql) — change Spark and SQL together
LM_MU = 2000.0                        # Dirichlet pseudo-count (Lucene default)
LM_TERMS = ("spark", "query", "join")  # same probe set as bm25_topk
LM_K = 10


def lm_dirichlet_topk(spark, sf_dir, terms=LM_TERMS, mu=LM_MU,
                      k=LM_K) -> DataFrame:
    """Conjunctive query-likelihood top-k under Dirichlet smoothing —
    a second ranking family next to BM25 (Lucene's
    LMDirichletSimilarity; Zhai & Lafferty 2001):

        score(d) = Σ_t∈q  ln(1 + tf / (mu · cf_t / T))  +  ln(mu / (dl + mu))

    with cf_t the term's collection frequency, T the total corpus
    occurrence count, and dl the doc's OCCURRENCE count — the true LM
    document length, deliberately NOT the engine's distinct-term
    quirk: this scorer is [NORTH-EXT] surface, not reference parity
    (the quirk stays on the BM25 path, makeindex.py:223-224 parity).
    Eligibility is conjunctive like bm25_topk; rank (score desc,
    doc_id) over the 6dp-rounded sum (cross-engine float contract:
    each per-term value is the same IEEE expression shape in both
    engines; only the sum order differs, absorbed by the rounding).

    Scale: identical shuffle shapes to _bm25_scored — one tf scan,
    broadcast query terms and per-term cf, per-doc hash agg; the
    corpus total is a 1-row broadcast.  No new scan: term_tf is the
    shared upstream.
    """
    tf = term_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = tf.agg(F.sum("tf").cast("double").alias("t_total"))
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    cf = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.sum("tf").cast("double").alias("cf"))
    )
    part = F.log(
        F.lit(1.0)
        + F.col("tf").cast("double")
        / (F.lit(mu) * F.col("cf") / F.col("t_total"))
    ) + F.log(F.lit(mu) / (F.col("dl").cast("double") + F.lit(mu)))
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(cf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .withColumn("p", part)
        .groupBy("doc_id")
        .agg(F.sum("p").alias("s"), F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == len(terms))
        .select("doc_id", F.round("s", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


_FLAT_INDEX_CACHE = {}


def _flat_index_key_dir(sf_dir):
    """(cache key, on-disk dir) for the flat index over ``sf_dir`` —
    the single source for the cache layout (used by _flat_index and
    the bench's cold-measurement reset)."""
    src = f"{sf_dir}/documents.parquet"
    key = (os.path.abspath(src), int(os.path.getmtime(src)))
    d = os.path.join(
        tempfile.gettempdir(),
        "searchengine_spark_idx",
        hashlib.md5(repr(key).encode()).hexdigest()[:16],
    )
    return key, d


def flat_index_cache_reset(sf_dir):
    """Drop the flat index for ``sf_dir`` from BOTH cache layers (the
    in-process handle dict and the on-disk stage-skip dir), so the next
    _flat_index call is a true cold build.  Bench-only surface: without
    it, a 'cold' timing on any run after the first silently measures
    load+serve (the temp dirs survive across processes)."""
    import shutil

    key, d = _flat_index_key_dir(sf_dir)
    _FLAT_INDEX_CACHE.pop(key, None)
    shutil.rmtree(d, ignore_errors=True)


def _flat_index(spark, sf_dir):
    """Unstemmed on-disk index over the documents table, built once per
    (sf_dir, mtime) into a temp dir; write_index skips completed stages,
    so repeated driver calls in one process or across runs are cheap."""
    from ..index.light import build_flat_tables
    from ..index.shards import load_index, write_index

    key, d = _flat_index_key_dir(sf_dir)
    if key in _FLAT_INDEX_CACHE:
        return _FLAT_INDEX_CACHE[key]
    tables = build_flat_tables(spark, documents(spark, sf_dir), stem=False)
    write_index(spark, tables, d)
    sh = load_index(spark, d)
    _FLAT_INDEX_CACHE[key] = sh
    return sh


def wand_topk(spark, sf_dir, terms=("spark", "query", "join"), k=10) -> DataFrame:
    """Block-max WAND conjunctive BM25 top-k over the on-disk compressed
    index — must equal bm25_topk (and its DuckDB oracle) rank-for-rank
    and score-for-score; the driver checks exactly that."""
    from ..query.wand import wand_topk as _wand

    sh = _flat_index(spark, sf_dir)
    res = _wand(
        spark,
        sh,
        [(1, " ".join(terms))],
        k=k,
        analyzer=lambda text: dict(Counter(tokenize(text))),
    )
    return res.select(
        F.col("docid").alias("doc_id"),
        F.round(F.col("score"), 6).alias("score"),
    )


def wand_or_topk(spark, sf_dir, terms=("spark", "query", "join"),
                 k=10) -> DataFrame:
    """Disjunctive (classic-WAND) BM25 top-k over the on-disk index —
    score sums whichever query terms a doc contains (no AND filter).
    Served by the event-sweep block-max kernel (query/wand.bmw_or_range);
    the driver oracle is the exhaustive OR scorer in SQL."""
    from ..query.wand import wand_topk as _wand

    sh = _flat_index(spark, sf_dir)
    res = _wand(
        spark,
        sh,
        [(1, " ".join(terms))],
        k=k,
        analyzer=lambda text: dict(Counter(tokenize(text))),
        mode="or",
    )
    return res.select(
        F.col("docid").alias("doc_id"),
        F.round(F.col("score"), 6).alias("score"),
    )


def bm25_snippets(spark, sf_dir, terms=("spark", "query", "join"),
                  k=10, width=80) -> DataFrame:
    """Result enrichment: conjunctive BM25 top-k plus a ``width``-char
    snippet of each hit, centered on the first occurrence of the
    RAREST query term (min corpus df, tie lexicographic) — the batch
    analogue of the reference's summary-attach stage (summarizer.py →
    lib/search.py result assembly), derived from content instead of a
    gated model.

    Window arithmetic is in characters over the original text with the
    match located in lower(text) (identical length for the corpus'
    ASCII alphabet; both engines index substrings 1-based), so the
    DuckDB oracle reproduces the snippet byte-for-byte.  Scale shape:
    the top-k is TakeOrderedAndProject; only k rows join back to
    content (docid-equi broadcast), and the 1-row rarest-term choice
    broadcasts.
    """
    top = bm25_topk(spark, sf_dir, terms=terms, k=k)
    tf = term_tf(spark, sf_dir)
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    rare = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy("df", "term")
        .limit(1)
        .select("term")
    )
    joined = (
        top.join(documents(spark, sf_dir), "doc_id")
        .crossJoin(F.broadcast(rare))
    )
    pos = F.expr("locate(term, lower(text))")
    start = F.greatest(F.lit(1), pos - F.lit(width // 2))
    return joined.select(
        "doc_id",
        "score",
        F.col("text").substr(start, F.lit(width)).alias("snippet"),
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def wand_topk_filtered(spark, sf_dir, terms=("spark", "query", "join"),
                       lang="en", k=10) -> DataFrame:
    """Metadata-filtered search: conjunctive WAND top-k restricted to
    documents matching a predicate (here ``lang``), with corpus-global
    BM25 stats — the reference's search has no filter surface; this is
    the [NORTH-EXT] faceting primitive every production index grows.

    The predicate reduces to a docid eligibility set pushed into the
    WAND kernels' per-range liveness mask (see wand_topk's
    ``allowed_docs``) — pruning stays lossless and filtered queries
    reuse the identical index, plans, and kernels.
    """
    from ..query.wand import wand_topk as _wand

    sh = _flat_index(spark, sf_dir)
    allowed = documents(spark, sf_dir).filter(
        F.col("lang") == lang
    ).select(F.col("doc_id").alias("docid"))
    res = _wand(
        spark,
        sh,
        [(1, " ".join(terms))],
        k=k,
        analyzer=lambda text: dict(Counter(tokenize(text))),
        allowed_docs=allowed,
    )
    return res.select(
        F.col("docid").alias("doc_id"),
        F.round(F.col("score"), 6).alias("score"),
    )


def min_pair_distance_udf():
    """Arrow-batched kernel: min |pa − pb| over two SORTED position
    arrays in O(tf_a + tf_b) per doc (searchsorted merge scan).

    The naive expression — explode both arrays and join on docid — is
    tf_a×tf_b rows PER DOC: a term-repetition-heavy doc (tf ≈ 10⁴)
    would make 10⁸ intermediate rows for one docid.  Here the two
    posting rows meet in ONE row per doc and the distance never
    materializes a pair."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _min_dist(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.int64)
        for i, (xa, xb) in enumerate(zip(a, b)):
            x = np.asarray(xa, dtype=np.int64)
            y = np.asarray(xb, dtype=np.int64)
            j = np.searchsorted(x, y)
            best = np.iinfo(np.int64).max
            left = j > 0
            if left.any():
                best = min(best, int(np.min(y[left] - x[j[left] - 1])))
            right = j < x.size
            if right.any():
                best = min(best, int(np.min(x[j[right]] - y[right])))
            out[i] = best
        return pd.Series(out)

    return _min_dist


def min_cover_window_udf():
    """Arrow-batched kernel: minimal covering window over k SORTED
    position arrays — the smallest max−min+1 over any set of positions
    containing one occurrence of EVERY term (Lucene SpanNearQuery /
    interval MINIMIZE semantics).

    Vectorized per doc in O(E·k) with E = Σ tf: the classic reduction
    that an optimal window starts at some query-term occurrence — for
    every anchor event p, the tightest cover starting at p ends at
    max over terms of (smallest pos >= p), one searchsorted per term
    over the event vector; no position×position pair ever
    materializes (the min_pair_distance_udf argument, k-ary)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _cover(*cols: pd.Series) -> pd.Series:
        n = len(cols[0])
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            arrs = [
                np.asarray(c.iloc[i], dtype=np.int64) for c in cols
            ]
            events = np.unique(np.concatenate(arrs))
            ok = np.ones(events.shape, dtype=bool)
            end = np.zeros(events.shape, dtype=np.int64)
            for a in arrs:
                idx = np.searchsorted(a, events, side="left")
                valid = idx < a.size
                ok &= valid
                nxt = a[np.minimum(idx, a.size - 1)]
                end = np.maximum(end, np.where(valid, nxt, 0))
            # a cover always exists when every array is non-empty
            # (anchor at the global min position is valid for all k)
            out[i] = int((end[ok] - events[ok] + 1).min())
        return pd.Series(out)

    return _cover


def ordered_window_count_udf(slop: int):
    """Arrow-batched kernel: number of ORDERED pairs (pa, pb) with
    0 < pb − pa <= slop + 1 over two SORTED position arrays, O((tf_a +
    tf_b) log) per doc via a vectorized double searchsorted — the
    counting sibling of min_pair_distance_udf, same no-pair-explode
    argument (a tf≈10⁴ doc would otherwise make 10⁸ join rows)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _win_count(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a), dtype=np.int64)
        for i, (xa, xb) in enumerate(zip(a, b)):
            x = np.asarray(xa, dtype=np.int64)
            y = np.asarray(xb, dtype=np.int64)
            out[i] = int(
                (
                    np.searchsorted(y, x + slop + 1, side="right")
                    - np.searchsorted(y, x, side="right")
                ).sum()
            )
        return pd.Series(out)

    return _win_count


# sloppy-phrase pinned defaults — interpolated into the DuckDB oracle
# by __spark_entry__ (change Spark and SQL together)
SLOP_TERMS = ("table", "hash")
PHRASE_SLOP = 3
SLOP_K = 20


def phrase_slop(spark, sf_dir, terms=SLOP_TERMS, slop=PHRASE_SLOP,
                k=SLOP_K) -> DataFrame:
    """Sloppy ordered phrase (Lucene-slop analogue, simplified to the
    order-preserving rule): ``terms[0]`` followed by ``terms[1]``
    within ``slop`` intervening tokens — i.e. ordered position pairs
    with 0 < pb − pa <= slop + 1.  slop=0 degenerates to the exact
    two-term phrase (adjacency), tying it to phrase_match.

    Returns (doc_id, n_windows) for docs with >= 1 window, ordered
    n_windows desc, doc_id asc, top k.  Served from the index's stored
    positions via query/positions.slop_topk_shards (bucket-pruned
    fetch, one row per doc per side, vectorized window count — never a
    position×position explode); the driver oracle recomputes the same
    count from the text with an explicit pair join (fine at sf0.01,
    and a losslessness proof for the kernel).
    """
    from ..query.positions import slop_topk_shards

    return slop_topk_shards(
        spark, _flat_index(spark, sf_dir), list(terms), slop=slop, k=k
    )


# span-near pinned defaults — interpolated into the DuckDB oracle by
# __spark_entry__ (change Spark and SQL together); the triple
# co-occurs at every test SF (257/263/2687 conjunctive docs)
SPAN_NEAR_TERMS = ("table", "hash", "join")
SPAN_NEAR_K = 10


def span_near_topk(spark, sf_dir, terms=SPAN_NEAR_TERMS,
                   k=SPAN_NEAR_K) -> DataFrame:
    """Unordered k-term span-near ranking (Lucene SpanNearQuery,
    inOrder=false) served from the index's stored positions: BM25 over
    docs containing ALL terms plus a len(terms)/min_win tightness
    boost, min_win = minimal covering window.  Completes the positions
    family phrase (exact adjacency) → slop (ordered window) →
    proximity (pair distance) → span-near (k-ary cover).

    Driver-entry wrapper over query/positions.span_near_topk_shards;
    the driver oracle recomputes the identical semantics from the text
    with the explicit anchor join (brute force at sf0.01 — the
    losslessness proof for the searchsorted cover kernel).
    """
    from ..query.positions import span_near_topk_shards

    return span_near_topk_shards(
        spark, _flat_index(spark, sf_dir), list(terms), k=k
    )


def proximity_topk(spark, sf_dir, terms=("table", "hash"),
                   k=10) -> DataFrame:
    """Proximity-boosted conjunctive ranking served from the index's
    stored positions: BM25 over docs containing BOTH terms, plus a
    1/(1+min_distance) boost where min_distance is the closest pair of
    occurrences.  (doc_id, min_dist, score); score desc, doc_id asc.

    The second positions-payload consumer after phrase_match_indexed —
    postings arrive via fetch_postings (bucket + row-group pruned), no
    raw text at query time; the driver oracle recomputes the identical
    semantics from the text in SQL.  Driver-entry wrapper over
    query/positions.proximity_topk_shards, which serves ANY shards
    handle (segmented/stemmed production indexes included).
    """
    from ..query.positions import proximity_topk_shards

    return proximity_topk_shards(
        spark, _flat_index(spark, sf_dir), list(terms), k=k
    )


def lang_counts(spark, sf_dir) -> DataFrame:
    return (
        documents(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


def text_quality(spark, sf_dir) -> DataFrame:
    """Per-doc quality features: token count, char length, mean token
    length, stopword ratio (training-data quality scoring)."""
    toks = doc_tokens(spark, sf_dir)
    per = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("term")), 6).alias("avg_token_len"),
        F.round(
            F.sum(
                F.when(F.col("term").isin(QUALITY_STOPWORDS), 1).otherwise(0)
            )
            / F.count("*"),
            6,
        ).alias("stopword_ratio"),
    )
    chars = documents(spark, sf_dir).select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )
    return per.join(chars, "doc_id").select(
        "doc_id", "n_tokens", "n_chars", "avg_token_len", "stopword_ratio"
    )


# Gopher-rules quality gate pinned defaults — interpolated into the
# DuckDB oracle (change Spark and SQL together)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_LO = 3.0
GOPHER_MEAN_LEN_HI = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_STOP_TERMS = ("the", "be", "to", "of", "and", "that", "have",
                     "with")
# Gopher's paper uses >= 2 of these 8; the synthetic fixture corpus
# carries at most ONE of them per doc, so the pinned floor is 1 —
# the rule stays live and discriminating at every SF (raise it on a
# natural-language corpus)
GOPHER_MIN_STOP_HITS = 1


def gopher_quality(spark, sf_dir) -> DataFrame:
    """(doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, n_stop_hits, passes) — the Gopher repetition-free
    quality rules (Rae et al. 2021 §A1.1) as one composite gate, the
    pre-training filter every corpus build runs before mixing:
    word-count window, mean word length window, symbol-to-word ratio
    ('#' chars + '...' occurrences), bullet-started / ellipsis-ended
    line fractions, and the common-stopword containment check
    (>= GOPHER_MIN_STOP_HITS of the 8 Gopher words).  Metrics are emitted alongside the boolean so a failing
    doc explains itself.  All ratios compare their 6dp-ROUNDED values
    (the cross-engine contract); a zero-token doc fails the word
    floor (three-valued AND: false AND null = false, coalesced FALSE
    for safety on both engines).

    Scale: one term_tf agg (no distinct-expand: stop hits count over
    the per-doc DISTINCT term rows term_tf already is) plus columnar
    line/char expressions on the raw text — no joins beyond the
    doc_id merge, no windows.
    """
    tf = term_tf(spark, sf_dir)
    per = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_words"),
        F.sum(F.col("tf") * F.length("term")).alias("n_chars"),
        F.sum(
            F.when(F.col("term").isin(*GOPHER_STOP_TERMS), 1).otherwise(0)
        ).alias("n_stop_hits"),
    )
    d = documents(spark, sf_dir).select("doc_id", "text")
    lines = F.split(F.col("text"), "\n")
    feats = d.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.col("n_chars"),
        F.coalesce("n_stop_hits", F.lit(0)).cast("long").alias(
            "n_stop_hits"
        ),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "#", ""))
        ).alias("hcnt"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace("text", r"\.\.\.", ""))
            )
            / 3
        ).alias("ecnt"),
        F.size(
            F.filter(
                lines,
                lambda x: F.substring(F.ltrim(x), 1, 1).isin(
                    "-", "*", "•"
                ),
            )
        ).alias("n_bullet"),
        F.size(
            F.filter(lines, lambda x: F.rtrim(x).endswith("..."))
        ).alias("n_ellipsis"),
        F.size(lines).alias("n_lines"),
    )
    mean_len = F.when(
        F.col("n_words") > 0,
        F.round(F.col("n_chars") / F.col("n_words"), 6),
    )
    sym = F.when(
        F.col("n_words") > 0,
        F.round((F.col("hcnt") + F.col("ecnt")) / F.col("n_words"), 6),
    )
    m = feats.select(
        "doc_id",
        "n_words",
        mean_len.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        F.round(F.col("n_bullet") / F.col("n_lines"), 6).alias(
            "bullet_frac"
        ),
        F.round(F.col("n_ellipsis") / F.col("n_lines"), 6).alias(
            "ellipsis_frac"
        ),
        "n_stop_hits",
    )
    passes = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("mean_word_len") >= GOPHER_MEAN_LEN_LO)
        & (F.col("mean_word_len") <= GOPHER_MEAN_LEN_HI)
        & (F.col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO)
        & (F.col("bullet_frac") <= GOPHER_MAX_BULLET_FRAC)
        & (F.col("ellipsis_frac") <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (F.col("n_stop_hits") >= GOPHER_MIN_STOP_HITS)
    )
    return m.withColumn(
        "passes", F.coalesce(passes, F.lit(False))
    ).orderBy("doc_id")


def repetition_stats(spark, sf_dir, ns=(2, 3)) -> DataFrame:
    """Per-doc repeated-n-gram occupancy — the Gopher-family repetition
    filter signal: for each n, the fraction of n-gram OCCURRENCES whose
    n-gram appears more than once in the doc (0 when the doc has no
    n-grams).  Repetition-heavy docs (boilerplate, templated spam,
    decoding loops) score high and get culled before training.

    Scale: n-grams are a per-doc arithmetic transform over the token
    array (no join), and the two aggregations key on (doc, gram) /
    doc — the same shuffle shape as text_quality."""
    d = documents(spark, sf_dir).select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(TOKEN_PATTERN), 0
        ).alias("t"),
    )
    out = d.select("doc_id")
    for n in ns:
        grams = d.filter(F.size("t") >= n).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(t) - {n} + 1),"
                    f" i -> array_join(slice(t, i, {n}), ' '))"
                )
            ).alias("g"),
        )
        per = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        agg = per.groupBy("doc_id").agg(
            (
                F.sum(
                    F.when(F.col("c") > 1, F.col("c")).otherwise(0)
                ).cast("double")
                / F.sum("c")
            ).alias(f"f{n}")
        )
        out = out.join(agg, "doc_id", "left")
    return out.select(
        "doc_id",
        *[
            F.round(F.coalesce(f"f{n}", F.lit(0.0)), 6).alias(
                f"dup_frac_{n}"
            )
            for n in ns
        ],
    ).orderBy("doc_id")


def doc_fingerprint(spark, sf_dir) -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized token
    stream (dedup/fingerprinting primitive, exactly mirrorable in SQL)."""
    d = documents(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ",
                F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0),
            )
        ).alias("fp"),
    )


EVAL_QUERIES = [
    (1, ("spark", "query", "join")),
    (2, ("table", "hash")),
    (3, ("data", "stream", "batch")),
    # "dup" is the one rare term in the synthetic vocabulary (~5% df at
    # every SF): mixing it with common terms makes the binary qrels
    # discriminative — MAP@10 lands in (0.2, 0.7) and MRR < 1 at some
    # SFs instead of the degenerate all-1.0 that all-common-term
    # queries produce (every term present at sf0.001/0.01/0.1; checked)
    (4, ("dup", "key", "fast")),
]


def _eval_candidates(spark, sf_dir) -> DataFrame:
    """Shared qrels/candidate core of the retrieval-eval family:
    (qid, doc_id, score, rel) — disjunctive BM25 per pinned EVAL_QUERIES
    query (score rounded 6, the rounded-rank contract) and rel = number
    of distinct query terms the doc contains (the deterministic graded
    qrels any synthetic corpus supports)."""
    qrows = [(qid, t) for qid, terms in EVAL_QUERIES for t in terms]
    qterms = spark.createDataFrame(qrows, "qid long, term string")
    tf = term_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    dft = tf.join(F.broadcast(qterms.select("term").distinct()),
                  "term").groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    bm25 = (
        idf
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.col("avgdl")
            )
        )
    )
    return hits.withColumn("bm25", bm25).groupBy("qid", "doc_id").agg(
        F.round(F.sum("bm25"), 6).alias("score"),
        F.count("*").alias("rel"),  # distinct terms matched (tf rows)
        F.sum("tf").cast("long").alias("sum_tf"),     # ltr_features
        F.max("total_tokens").cast("long").alias("dl"),  # ltr_features
    )


def search_eval_ndcg(spark, sf_dir, k: int = 10) -> DataFrame:
    """Retrieval-quality evaluation: NDCG@k of the disjunctive BM25
    ranking per pinned query, graded relevance = number of distinct
    query terms the doc contains (the deterministic qrels any synthetic
    corpus supports — the lexical twin of ann_recall).

    gain = 2^rel - 1, discount = log2(rank + 1); ranking rank over the
    6dp-ROUNDED score with doc_id tie-break (rounded-rank contract);
    ideal ranking over (rel desc, doc_id asc).  (qid, ndcg) rounded 6.

    Scale: the query set broadcasts; rel and score are one shuffle agg
    each over the qterm-joined postings; both windows partition by qid
    over ... the qid-matched candidate set (bounded by matching docs).
    At 100 TB the candidate windows are the same two-phase salted
    top-k the engine's scorer uses — here the driver-entry form keeps
    the plain window for oracle parity.
    """
    cand = _eval_candidates(spark, sf_dir)
    gain = F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0
    wr = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    dcg = (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .withColumn(
            "g", gain / F.log2(F.col("rank").cast("double") + 1.0)
        )
        .groupBy("qid")
        .agg(F.sum("g").alias("dcg"))
    )
    wi = Window.partitionBy("qid").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    idcg = (
        cand.withColumn("irank", F.row_number().over(wi))
        .filter(F.col("irank") <= k)
        .withColumn(
            "g", gain / F.log2(F.col("irank").cast("double") + 1.0)
        )
        .groupBy("qid")
        .agg(F.sum("g").alias("idcg"))
    )
    return (
        dcg.join(idcg, "qid")
        .select(
            "qid",
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
        .orderBy("qid")
    )


def search_eval_map_mrr(spark, sf_dir, k: int = 10) -> DataFrame:
    """Retrieval-quality evaluation, binary-relevance twin of
    search_eval_ndcg: MAP@k and MRR@k of the disjunctive BM25 ranking
    per pinned EVAL_QUERIES query.

    Relevant = the doc contains ALL the query's terms (rel == nterms —
    the conjunctive-match qrels).  Ranking rank = row_number over the
    6dp-ROUNDED score with doc_id tie-break (rounded-rank contract).
    ap = sum over relevant ranks r <= k of (cum_rel(r) / r), divided by
    min(R, k) with R = TOTAL relevant docs for the query (the standard
    AP@k denominator); mrr = 1/rank of the first relevant doc within
    top k, 0.0 if none.  (qid, ap, mrr) rounded 6.

    Scale: same shape as search_eval_ndcg — broadcast query set, one
    shuffle agg for candidates, per-qid windows over the qid-matched
    candidate set only.
    """
    nt_rows = [(qid, len(terms)) for qid, terms in EVAL_QUERIES]
    ntdf = spark.createDataFrame(nt_rows, "qid long, nterms long")
    cand = (
        _eval_candidates(spark, sf_dir)
        .join(F.broadcast(ntdf), "qid")
        .withColumn(
            "is_rel",
            (F.col("rel") == F.col("nterms")).cast("long"),
        )
    )
    r_total = cand.groupBy("qid").agg(F.sum("is_rel").alias("r_total"))
    wr = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = (
        cand.withColumn("rank", F.row_number().over(wr))
        .withColumn("cum_rel", F.sum("is_rel").over(wcum))
        .filter(F.col("rank") <= k)
    )
    per_q = ranked.groupBy("qid").agg(
        F.sum(
            F.when(
                F.col("is_rel") == 1,
                F.col("cum_rel").cast("double") / F.col("rank"),
            ).otherwise(F.lit(0.0))
        ).alias("ap_num"),
        F.max(
            F.when(
                F.col("is_rel") == 1, F.lit(1.0) / F.col("rank")
            ).otherwise(F.lit(0.0))
        ).alias("mrr_raw"),
    )
    denom = F.greatest(
        F.least(F.col("r_total"), F.lit(k)).cast("double"), F.lit(1.0)
    )
    return per_q.join(r_total, "qid").select(
        "qid",
        F.round(F.col("ap_num") / denom, 6).alias("ap"),
        F.round(F.col("mrr_raw"), 6).alias("mrr"),
    ).orderBy("qid")


HN_POOL = 20   # retrieval pool depth mined for negatives
HN_K = 5       # hard negatives kept per query
# both interpolated into the DuckDB oracle — change Spark + SQL together


def hard_negatives(spark, sf_dir, pool: int = HN_POOL,
                   k: int = HN_K) -> DataFrame:
    """Hard-negative mining for retriever training (the DPR/contrastive
    data-prep step): per pinned EVAL_QUERIES query, the top-scoring
    docs WITHIN the top-``pool`` BM25 retrieval that are NOT
    conjunctively relevant (rel < nterms) — exactly the
    high-ranked-but-wrong examples contrastive training wants.

    Ranks follow the rounded-rank contract (row_number over the
    6dp-rounded score, doc_id tie-break) for both the overall pool rank
    and the negative rank.  Scale: same shape as the eval family —
    broadcast query set, one shuffle agg, per-qid windows over the
    qid-matched candidates only.
    """
    nt_rows = [(qid, len(terms)) for qid, terms in EVAL_QUERIES]
    ntdf = spark.createDataFrame(nt_rows, "qid long, nterms long")
    cand = _eval_candidates(spark, sf_dir).join(
        F.broadcast(ntdf), "qid"
    )
    wr = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = (
        cand.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= pool)
    )
    negs = ranked.filter(F.col("rel") != F.col("nterms"))
    return (
        negs.withColumn(
            "neg_rank", F.row_number().over(wr).cast("long")
        )
        .filter(F.col("neg_rank") <= k)
        .select("qid", "neg_rank", "doc_id", "rank", "score")
    )


TV_DOC_IDS = (1, 2, 3)   # pinned driver-entry term-vectors docs


def term_vectors(spark, sf_dir, doc_ids=TV_DOC_IDS) -> DataFrame:
    """Per-document term-vectors surface (the Elasticsearch _termvectors
    API shape): for each pinned doc, every term with its tf, first
    position, and the full 1-based position list (comma-joined string —
    cross-engine comparable without array-type hashing).

    The position agg is array_sort(collect_list) — order-insensitive,
    so the result is partition-count invariant.  Scale: the doc_id
    filter prunes at the scan (pushed IN filter); the groupBy touches
    only the selected docs' tokens.
    """
    toks = doc_tokens(spark, sf_dir).filter(
        F.col("doc_id").isin(*[int(d) for d in doc_ids])
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.min("pos").alias("first_pos"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("pos")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )


MLT_DOC_ID = 1     # pinned driver-entry source document
MLT_KEYWORDS = 5   # keywords extracted per document


def tfidf_keywords(spark, sf_dir, topn: int = MLT_KEYWORDS) -> DataFrame:
    """Per-document keyword extraction: top-n terms by classic tf-idf
    (tf * ln(N/df), N = docs with >= 1 token — the bm25 stats
    convention), rounded to 6 places BEFORE ranking (the hybrid_rrf
    rounded-rank contract), ties -> term asc.
    (doc_id, term, tfidf, rank).

    Scale: one shuffle to tf, one to df, a per-doc window (partition =
    one document's distinct terms — inherently small).
    """
    tf = term_tf(spark, sf_dir)
    stats = tf.agg(F.countDistinct("doc_id").alias("n"))
    dft = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("doc_id", "term", "tfidf", "rank")
    )


def more_like_this(spark, sf_dir, doc_id: int = MLT_DOC_ID,
                   k: int = 10, topn: int = MLT_KEYWORDS) -> DataFrame:
    """Lucene-style more-like-this: the source document's top-n tf-idf
    keywords become a DISJUNCTIVE BM25 query (wand_or semantics — no
    nmatch gate), source excluded from the results (eligibility only:
    corpus stats stay global, the filtered-search rule).
    (doc_id, score desc, doc_id asc, top k).

    Scale: the keyword set is topn rows (broadcast); everything else
    is the bm25 chain's shuffle shape.  At serving scale the keywords
    come straight off the source doc's stored postings instead of the
    corpus-wide window — the driver entry proves the semantics.
    """
    kws = (
        tfidf_keywords(spark, sf_dir, topn)
        .filter(F.col("doc_id") == doc_id)
        .select("term")
    )
    tf = term_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    dft = tf.join(F.broadcast(kws), "term").groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hits = (
        tf.join(F.broadcast(kws), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    bm25 = (
        idf
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.col("avgdl")
            )
        )
    )
    return (
        hits.withColumn("bm25", bm25)
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25"), 6).alias("score"))
        .filter(F.col("doc_id") != doc_id)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# Rocchio pseudo-relevance feedback — pinned parameters, interpolated
# into the DuckDB oracle (__spark_entry__.oracle_sql) — change Spark
# and SQL together.
ROCCHIO_TERMS = ("spark", "join")  # seed query (conjunctive base pass)
ROCCHIO_FB_DOCS = 5                # pseudo-relevant feedback depth R
ROCCHIO_EXPAND = 3                 # expansion terms appended to the query
ROCCHIO_BETA = 0.4                 # feedback term weight (alpha = 1.0)


def rocchio_topk(spark, sf_dir, terms=ROCCHIO_TERMS, k=10,
                 fb_docs=ROCCHIO_FB_DOCS, expand=ROCCHIO_EXPAND,
                 beta=ROCCHIO_BETA) -> DataFrame:
    """Rocchio pseudo-relevance feedback (the classic PRF / RM3-style
    query expansion; reference has no analogue — [NORTH-EXT] next to
    more_like_this, whose keyword machinery it reuses query-side):

    1. base pass: conjunctive BM25 over ``terms`` (bm25_topk
       semantics), top ``fb_docs`` by (rounded score desc, doc_id asc)
       become the pseudo-relevant set;
    2. expansion: Rocchio centroid weight per term over the feedback
       set, w = round(sum(tf * ln(N/df)) / |FB|, 6) (the
       tfidf_keywords weight averaged over the feedback docs), seed
       terms excluded; top ``expand`` by (w desc, term asc);
    3. final pass: weighted DISJUNCTIVE BM25 (wand_or semantics, no
       nmatch gate) over seed terms at weight 1.0 plus expansion terms
       at weight ``beta`` — score = round(sum(wt * bm25), 6), top k by
       (score desc, doc_id asc).

    (doc_id, score).

    Scale: the feedback set is fb_docs rows and the expansion set
    ``expand`` rows (both broadcast); the expansion argmax window is
    global but ranges only over the feedback docs' term vocabulary
    (bounded by fb_docs document lengths).  Everything else is the
    bm25 chain's shuffle shape, run twice.
    """
    fb = (
        _bm25_scored(spark, sf_dir, terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(fb_docs)
        .select("doc_id")
    )
    tf = term_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    fbn = fb.agg(F.count("*").alias("r"))

    # Rocchio centroid over the feedback docs (seed terms excluded)
    dft_all = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    expw = (
        tf.join(F.broadcast(fb), "doc_id")
        .filter(~F.col("term").isin(list(terms)))
        .join(dft_all, "term")
        .crossJoin(F.broadcast(stats.select("n")))
        .crossJoin(F.broadcast(fbn))
        .groupBy("term", "r")
        .agg(
            F.round(
                F.sum(
                    F.col("tf").cast("double")
                    * F.log(F.col("n").cast("double") / F.col("df"))
                )
                / F.col("r"),
                6,
            ).alias("w")
        )
    )
    wexp = Window.orderBy(F.desc("w"), F.asc("term"))
    exp_terms = (
        expw.withColumn("rk", F.row_number().over(wexp))
        .filter(F.col("rk") <= expand)
        .select("term", F.lit(float(beta)).alias("wt"))
    )
    seed = spark.createDataFrame(
        [(t, 1.0) for t in terms], "term string, wt double"
    )
    qw = seed.unionByName(exp_terms)

    dft = tf.join(F.broadcast(qw.select("term")), "term").groupBy(
        "term"
    ).agg(F.countDistinct("doc_id").alias("df"))
    hits = (
        tf.join(F.broadcast(qw), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    bm25 = (
        idf
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.col("avgdl")
            )
        )
    )
    return (
        hits.withColumn("p", F.col("wt") * bm25)
        .groupBy("doc_id")
        .agg(F.round(F.sum("p"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


FUZZY_Q = 5        # misspelled probe terms derived from the corpus
FUZZY_MIN_LEN = 4  # only misspell terms this long (1 char carries less)
FUZZY_TOPN = 3     # candidates returned per query term


def _del1_variants(col: str):
    """Symmetric-delete variant set of a string column: the string
    itself + every single-deletion string (expr-based transform)."""
    return F.array_union(
        F.array(F.col(col)),
        F.expr(
            f"transform(sequence(1, length({col})), i -> "
            f"concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, length({col}))))"
        ),
    )


def _misspelled_probes(dict_df: DataFrame, n: int) -> DataFrame:
    """Deterministic corpus-derived misspellings (no external data):
    the ``n`` highest-df dictionary terms of length >= FUZZY_MIN_LEN
    (ties -> lexicographic), each with its 2nd character deleted."""
    return (
        dict_df.filter(F.length("term") >= FUZZY_MIN_LEN)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(n)
        .select(
            F.concat(
                F.substring("term", 1, 1), F.expr("substring(term, 3)")
            ).alias("q")
        )
        .distinct()
    )


def _ed1_candidates(probes: DataFrame, dict_df: DataFrame) -> DataFrame:
    """(q, term, df, dist) pairs at levenshtein <= 1 via the symmetric-
    delete equi-join (superset of ed<=1, exact filter after — the
    DuckDB oracle's brute-force cross join proves it lossless)."""
    dvar = dict_df.select(
        "term", "df", F.explode(_del1_variants("term")).alias("v")
    )
    qvar = probes.select(
        "q", F.explode(_del1_variants("q")).alias("v")
    )
    return (
        qvar.join(dvar, "v")
        .select("q", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("q", "term").cast("long"))
        .filter(F.col("dist") <= 1)
    )


def fuzzy_terms(spark, sf_dir, topn: int = FUZZY_TOPN) -> DataFrame:
    """SymSpell-style fuzzy term correction over the term dictionary —
    the did-you-mean surface of the query path.

    Probe terms are derived deterministically from the corpus itself
    (no external data): the FUZZY_Q highest-df dictionary terms of
    length >= FUZZY_MIN_LEN (ties -> lexicographic), each misspelled by
    deleting its 2nd character.  For each probe q the op returns the
    dictionary terms within Levenshtein distance <= 1, ranked by
    (distance asc, df desc, term asc), top FUZZY_TOPN.

    Scale path (what makes this not a |dict| scan per query): symmetric
    deletes.  d(q, t) <= 1  implies q and t share a variant in
    {self} + single-deletions — insertion puts q in del1(t), deletion
    puts t in del1(q), substitution meets in the middle — so candidates
    come from an equi-join of the two variant sets (dict side expands
    ~|term|+1 rows, once; at serving scale it would be precomputed and
    bucketed on the variant hash).  The join is a SUPERSET of ed<=1
    (e.g. transposed neighbors), so the exact levenshtein filter runs
    after; the DuckDB oracle is the brute-force cross join with the
    same filter, proving the pruning lossless.
    """
    dict_df = term_dict(spark, sf_dir)  # (term, df, cf)
    probes = _misspelled_probes(dict_df, FUZZY_Q)
    cand = _ed1_candidates(probes, dict_df)
    w = Window.partitionBy("q").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("q", "term", "df", "dist", "rank")
    )


# search-result clustering — pinned parameters, interpolated into the
# DuckDB oracle (change Spark and SQL together)
RC_TERMS = ("spark", "query", "join")  # the bm25_topk probe set
RC_DEPTH = 30                          # results clustered (disjunctive)
RC_MIN_SHARED = 2                      # shared top keywords per edge


def result_clusters(spark, sf_dir, terms=RC_TERMS, depth=RC_DEPTH,
                    min_shared=RC_MIN_SHARED,
                    topn=MLT_KEYWORDS) -> DataFrame:
    """Search-result clustering (the Carrot2/Lingo surface): the
    disjunctive BM25 top-``depth`` for ``terms`` is grouped into topic
    clusters — two results connect iff they share >= ``min_shared`` of
    their per-doc top-``topn`` tf-idf keywords (tfidf_keywords'
    rounded-rank rule, corpus-global df), and clusters are the EXACT
    connected components of that graph (dup_clusters' min-label
    propagation with pointer jumping); results sharing no edge stay
    singleton clusters of themselves.
    (cluster_id, doc_id, score, cluster_size), cluster_id = smallest
    member doc_id, ordered (cluster_id, doc_id).

    Scale: the result set is ``depth`` rows (broadcast into the
    keyword join); edges are <= depth^2 bounded; components converge
    in O(log diameter) shuffle rounds over those bounded edges.  Only
    the scoring pass and the keyword df stats touch the corpus.
    """
    tf = term_tf(spark, sf_dir)
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    dft = tf.join(F.broadcast(qterms), "term").groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    bm25 = (
        idf
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (
            F.col("tf").cast("double")
            + F.lit(BM25_K1)
            * (
                F.lit(1 - BM25_B)
                + F.lit(BM25_B)
                * F.col("total_tokens").cast("double")
                / F.col("avgdl")
            )
        )
    )
    res = (
        hits.withColumn("bm25", bm25)
        .groupBy("doc_id")
        .agg(F.round(F.sum("bm25"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(depth)
    )

    kws = tfidf_keywords(spark, sf_dir, topn).join(
        F.broadcast(res.select("doc_id")), "doc_id"
    ).select("doc_id", "term")
    a = kws.select(F.col("doc_id").alias("a"), "term")
    b = kws.select(F.col("doc_id").alias("b"), "term")
    pairs = (
        a.join(b, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .select("a", "b")
    )
    from .dedup import dup_clusters

    clus = dup_clusters(pairs)
    singles = res.select("doc_id").join(
        clus.select("doc_id"), "doc_id", "left_anti"
    ).select(
        "doc_id",
        F.col("doc_id").alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    return (
        clus.unionByName(singles)
        .join(res, "doc_id")
        .select("cluster_id", "doc_id", "score", "cluster_size")
        .orderBy("cluster_id", "doc_id")
    )


# phrase (whole-query) suggester — pinned parameters, interpolated
# into the DuckDB oracle (change Spark and SQL together; lambda AND
# 1-lambda via their exact double reprs, the bigram_logprob rule)
SUGG_LAMBDA = 0.8    # bigram interpolation weight (bigram_logprob's)
SUGG_EDIT_LP = -1.0  # ln-space channel penalty per edit
SUGG_TOPN = 3        # suggestion pairs returned


def phrase_suggest(spark, sf_dir, topn=SUGG_TOPN, lam=SUGG_LAMBDA,
                   edit_lp=SUGG_EDIT_LP) -> DataFrame:
    """Noisy-channel WHOLE-QUERY did-you-mean (the Lucene/ES phrase-
    suggester surface): candidate corrections for each query token are
    scored TOGETHER under the corpus's interpolated bigram LM, so
    context picks the pair — where fuzzy_terms / corrected_topk rank
    each term independently by (dist, df), this op can prefer a
    lower-df candidate because it actually FOLLOWS the other term:

        score(c1, c2) = round( ln(cu(c1)/total)
                             + ln(lam * c2(c1,c2)/ctx(c1)
                                  + (1-lam) * cu(c2)/total)
                             + edit_lp * (dist1 + dist2), 6)

    (unseen bigram -> the unigram backoff term alone; the interpolated
    LM and its constants are bigram_logprob's).  The probe query is
    corpus-derived like fuzzy_terms': the top corpus bigram with both
    sides >= FUZZY_MIN_LEN chars and distinct (ties -> lexicographic),
    each side misspelled by deleting its 2nd character.  Candidates
    are the symmetric-delete lev<=1 dictionary neighborhoods (the
    fuzzy_terms join, brute-force-oracled lossless).  Ranks
    (score desc, term1 asc, term2 asc), top ``topn``.
    (rank, term1, term2, score), rank asc.

    Scale: bigram/unigram stats are the bigram_logprob shuffles; the
    candidate sets are two lev<=1 neighborhoods (bounded), their pair
    cross join is |c1|x|c2| bounded rows, and every stats join against
    the pair list is pre-filtered by a broadcast of that list — no
    corpus-scale side ever joins unpruned.
    """
    d = documents(spark, sf_dir).select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("prev", F.lag("term").over(w))
        .filter(F.col("prev").isNotNull())
        .select("prev", "term")
    )
    bg = pairs.groupBy("prev", "term").agg(F.count("*").alias("bc"))
    ctx = bg.groupBy("prev").agg(F.sum("bc").alias("ctx"))
    cu = toks.groupBy("term").agg(F.count("*").alias("cu"))
    tot = cu.agg(F.sum("cu").cast("double").alias("tot"))

    top1 = (
        bg.filter(
            (F.length("prev") >= FUZZY_MIN_LEN)
            & (F.length("term") >= FUZZY_MIN_LEN)
            & (F.col("prev") != F.col("term"))
        )
        .orderBy(F.desc("bc"), F.asc("prev"), F.asc("term"))
        .limit(1)
    )

    def _mis(c):
        return F.concat(
            F.substring(c, 1, 1), F.expr(f"substring({c}, 3)")
        )

    probes = top1.select(
        F.posexplode(F.array(_mis("prev"), _mis("term"))).alias(
            "slot0", "q"
        )
    ).select((F.col("slot0") + 1).alias("slot"), "q")

    dict_df = term_dict(spark, sf_dir)
    cand = _ed1_candidates(probes.select("q").distinct(), dict_df).join(
        F.broadcast(probes), "q"
    )
    cs1 = cand.filter(F.col("slot") == 1).select(
        F.col("term").alias("term1"), F.col("dist").alias("d1")
    )
    cs2 = cand.filter(F.col("slot") == 2).select(
        F.col("term").alias("term2"), F.col("dist").alias("d2")
    )
    pp = cs1.crossJoin(F.broadcast(cs2))

    # pre-filter the corpus-scale stats down to the candidate pairs
    # (the qterms broadcast pattern), then left-join the tiny results
    bgq = bg.join(
        F.broadcast(pp.select(
            F.col("term1").alias("prev"), F.col("term2").alias("term")
        ).distinct()),
        ["prev", "term"],
    ).select(
        F.col("prev").alias("term1"), F.col("term").alias("term2"), "bc"
    )
    ctxq = ctx.join(
        F.broadcast(pp.select(F.col("term1").alias("prev")).distinct()),
        "prev",
    ).select(F.col("prev").alias("term1"), "ctx")
    cu1 = cu.join(
        F.broadcast(pp.select(F.col("term1").alias("term")).distinct()),
        "term",
    ).select(F.col("term").alias("term1"), F.col("cu").alias("cu1"))
    cu2 = cu.join(
        F.broadcast(pp.select(F.col("term2").alias("term")).distinct()),
        "term",
    ).select(F.col("term").alias("term2"), F.col("cu").alias("cu2"))

    scored = (
        pp.join(F.broadcast(bgq), ["term1", "term2"], "left")
        .join(F.broadcast(ctxq), "term1", "left")
        .join(F.broadcast(cu1), "term1")
        .join(F.broadcast(cu2), "term2")
        .crossJoin(F.broadcast(tot))
    )
    p2 = F.when(
        F.col("bc").isNotNull(),
        F.lit(lam) * F.col("bc") / F.col("ctx")
        + F.lit(1.0 - lam) * F.col("cu2") / F.col("tot"),
    ).otherwise(F.lit(1.0 - lam) * F.col("cu2") / F.col("tot"))
    lp = (
        F.log(F.col("cu1") / F.col("tot"))
        + F.log(p2)
        + F.lit(edit_lp) * (F.col("d1") + F.col("d2")).cast("double")
    )
    wr = Window.orderBy(F.desc("score"), F.asc("term1"), F.asc("term2"))
    return (
        scored.select(
            "term1", "term2", F.round(lp, 6).alias("score")
        )
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("rank", "term1", "term2", "score")
        .orderBy("rank")
    )


# spell-corrected search pinned defaults — interpolated into the
# DuckDB oracle by __spark_entry__ (change Spark and SQL together)
CORR_BASE_TERMS = ("spark",)  # in-dictionary at every SF (bm25 default)
CORR_PROBES = 1               # corpus-derived misspelled terms appended
CORR_K = 10


def corrected_topk(spark, sf_dir, k=CORR_K) -> DataFrame:
    """Spell-corrected search — the did-you-mean surface wired INTO the
    scoring chain: each query term is rewritten to its best dictionary
    correction, then conjunctive BM25 runs over the corrected terms.

    The query is CORR_BASE_TERMS plus CORR_PROBES corpus-derived
    misspellings (the fuzzy_terms probe rule: top-df dictionary term of
    length >= FUZZY_MIN_LEN with its 2nd character deleted — no
    external data).  Correction rule per query term q: rank the
    dictionary terms at levenshtein <= 1 by (dist asc, df desc, term
    asc) and take rank 1 — an in-dictionary q corrects to itself (dist
    0 always wins); a term with no candidate is dropped from the
    query.  Corrected terms dedup, then bm25_topk semantics (nmatch ==
    |corrected set|), (doc_id, score) score desc, doc_id asc, top k.

    Scale: candidates come from the symmetric-delete equi-join (the
    fuzzy_terms pruning, lossless vs the oracle's brute-force cross
    join); the corrected set is <= |query| terms, collected driver-side
    (bounded, like every query-term collect) and fed to the shared
    _bm25_scored core.
    """
    dict_df = term_dict(spark, sf_dir)
    base = spark.createDataFrame(
        [(t,) for t in CORR_BASE_TERMS], "q string"
    )
    probes = _misspelled_probes(dict_df, CORR_PROBES)
    qterms = base.union(probes).distinct()
    w = Window.partitionBy("q").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term")
    )
    corrected = [
        r["term"]
        for r in _ed1_candidates(qterms, dict_df)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("term")
        .distinct()
        .collect()
    ]
    return (
        _bm25_scored(spark, sf_dir, sorted(corrected))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_match(spark, sf_dir, phrase=("table", "hash"), k=20) -> DataFrame:
    """Exact-phrase search via token positions (the [NORTH-EXT] positions
    stored in every posting exist precisely for this): a doc matches
    where the phrase's terms appear at consecutive positions.

    Expressed as an adjacency self-join on (doc_id, pos): term_i at
    position p must be followed by term_{i+1} at p+1.  Returns
    (doc_id, n_occurrences) ordered by occurrences desc, doc_id asc.
    """
    toks = doc_tokens(spark, sf_dir)
    first = toks.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("pos").alias("p0")
    )
    cur = first
    for i, term in enumerate(phrase[1:], 1):
        nxt = toks.filter(F.col("term") == term).select(
            F.col("doc_id").alias("d"), F.col("pos").alias("pi")
        )
        cur = cur.join(
            nxt,
            (F.col("doc_id") == F.col("d"))
            & (F.col("pi") == F.col("p0") + i),
        ).select("doc_id", "p0")
    return (
        cur.groupBy("doc_id")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_match_indexed(spark, sf_dir, phrase=("table", "hash"),
                         k=20) -> DataFrame:
    """Exact-phrase search served FROM THE INDEX's stored positions —
    the payload written by encode_block (index/varbyte.py) consumed
    end-to-end, no raw text touched at query time.

    fetch_postings prunes shard buckets + parquet row groups down to the
    phrase's terms, positions explode per phrase slot i as (docid,
    pos - i), and an equi-join on (docid, p0) keeps exactly the
    positions where every slot lines up consecutively.  Output is
    equivalent to the text-derived :func:`phrase_match` (asserted by
    tests/test_ops.py and by sharing its driver oracle).  Driver-entry
    wrapper over query/positions.phrase_topk_shards, which serves ANY
    shards handle (segmented/stemmed production indexes included).
    """
    from ..query.positions import phrase_topk_shards

    return phrase_topk_shards(
        spark, _flat_index(spark, sf_dir), list(phrase), k=k
    )


# marker tokens per language for the heuristic language identifier;
# CASE order below is the deterministic tie-break (alphabetical)
LANG_MARKERS = {
    "c": ["include", "int", "char", "printf", "struct", "sizeof"],
    "java": ["public", "void", "static", "extends", "implements", "new"],
    "js": ["function", "var", "const", "let", "console", "require"],
    "md": ["http", "https", "www", "readme", "license", "usage"],
    "python": ["def", "import", "self", "print", "lambda", "elif"],
}


def lang_marker_aggs() -> list:
    """One ``s_<lang>`` marker-count aggregate per language — the
    single Spark source for the lang-ID feature columns (shared by
    lang_id and ops/prep's one-pass feature aggregate; the DuckDB
    fragment in __spark_entry__ is generated from the same
    LANG_MARKERS)."""
    return [
        F.sum(
            F.when(F.col("term").isin(LANG_MARKERS[lang]), 1).otherwise(0)
        ).alias(f"s_{lang}")
        for lang in sorted(LANG_MARKERS)
    ]


def lang_pred_expr():
    """The prediction over the ``s_<lang>`` columns: argmax with the
    alphabetical CASE-order tie-break, all-zero → 'unknown'.  Change
    this and the oracle's lang_case together."""
    mx = F.greatest(*[F.col(f"s_{lang}") for lang in sorted(LANG_MARKERS)])
    pred = F.when(mx == 0, F.lit("unknown"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(F.col(f"s_{lang}") == mx, F.lit(lang))
    return pred


def bpe_pieces_agg():
    """Σ ceil(len(term)/4) — the BPE-ish piece-count aggregate (the
    standard chars/4 budget rule), shared by token_counts and
    ops/prep."""
    return F.sum(F.ceil(F.length("term") / 4).cast("long"))


def lang_id(spark, sf_dir) -> DataFrame:
    """Heuristic language identification from marker-token counts
    (training-data pipeline: language-ID without external models).
    Tie-break: first language in alphabetical CASE order; all-zero →
    'unknown'."""
    toks = doc_tokens(spark, sf_dir)
    per = toks.groupBy("doc_id").agg(*lang_marker_aggs())
    docs = documents(spark, sf_dir).select("doc_id")
    return (
        docs.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(lang_pred_expr(), F.lit("unknown")).alias(
                "lang_pred"
            ),
        )
    )


def token_counts(spark, sf_dir) -> DataFrame:
    """Token-count statistics per doc: word tokens, token characters,
    and a BPE-ish piece estimate (4-char pieces per word — the standard
    chars/4 budget rule, computed exactly per token)."""
    toks = doc_tokens(spark, sf_dir)
    per = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("term")).alias("n_token_chars"),
        bpe_pieces_agg().alias("n_pieces_bpe"),
    )
    docs = documents(spark, sf_dir).select("doc_id")
    return (
        docs.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_token_chars", F.lit(0)).alias("n_token_chars"),
            F.coalesce("n_pieces_bpe", F.lit(0)).alias("n_pieces_bpe"),
        )
    )


def ann_cosine_topk(spark, sf_dir, query_vec_id=0, k=10) -> DataFrame:
    """Brute-force cosine top-k over the embedding column — the exact
    baseline for similarity search (IVF/LSH variants build on this)."""
    return (
        _cosine_scored(spark, sf_dir, query_vec_id)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _cosine_scored(spark, sf_dir, query_vec_id) -> DataFrame:
    """Cosine vs the query vector for EVERY other vector, as
    (vec_id, cosine-rounded-5) — shared by ann_cosine_topk and
    hybrid_rrf_topk."""
    emb = embeddings(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    pairs = emb.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "qv", lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm_a = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norm_q = F.sqrt(
        F.aggregate(
            F.transform("qv", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return pairs.select(
        "vec_id", F.round(dot / (norm_a * norm_q), 5).alias("cosine")
    )


# MMR diversification — pinned parameters, interpolated into the
# DuckDB oracle (__spark_entry__.oracle_sql) — change Spark and SQL
# together (lambda AND 1-lambda via repr, the bigram_logprob rule).
MMR_POOL = 20      # relevance candidate pool (top-N by cosine)
MMR_K = 5          # diversified results returned
MMR_LAMBDA = 0.7   # relevance weight; 1-lambda penalizes redundancy


def _mmr_round6(x: float) -> float:
    """Spark F.round(col, 6) parity: HALF_UP over the shortest decimal
    repr (the serve_ivf cross-engine rule)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(float(x))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
    )


def mmr_topk(spark, sf_dir, query_vec_id=0, k=MMR_K, pool=MMR_POOL,
             lam=MMR_LAMBDA) -> DataFrame:
    """Maximal marginal relevance diversification (Carbonell & Goldstein,
    SIGIR'98) over the embedding column: greedily re-rank the top-
    ``pool`` cosine candidates so each pick maximizes
    round(lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s), 6) —
    relevance minus redundancy against the already-selected set S
    (empty-set max = 0.0, so pick 1 is the plain cosine argmax).
    Ties -> vec_id asc.  (rank, vec_id, mmr), rank asc.

    Scale: the pool cut is TakeOrderedAndProject over the full corpus
    (the only corpus-size-dependent stage); the pool-vs-pool sim matrix
    is pool^2 bounded rows, and the greedy loop runs driver-side over
    those collected values — the IVF-probe "driver-side selection
    equals plan/SQL values" contract (rel/sim enter rounded to 5dp,
    the combine is HALF_UP round-6, so selection is reproducible in
    DuckDB's unrolled-CTE mirror).
    """
    rel = (
        _cosine_scored(spark, sf_dir, query_vec_id)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(pool)
    )
    emb = embeddings(spark, sf_dir)
    pv = rel.join(emb, "vec_id").select("vec_id", "cosine", "embedding")
    a = pv.select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("va")
    )
    b = pv.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with(
            "va", "vb", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform("va", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform("vb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", F.round(dot / (na * nb), 5).alias("sim"))
    )

    rels = {r["vec_id"]: r["cosine"] for r in rel.collect()}
    sim = {(r["a"], r["b"]): r["sim"] for r in sims.collect()}
    oml = 1.0 - lam
    picked, out = [], []
    while len(out) < min(k, len(rels)):
        best = None
        for c in sorted(rels):           # vec_id asc = tie order
            if c in picked:
                continue
            mx = max((sim[(c, s)] for s in picked), default=0.0)
            m = _mmr_round6(lam * rels[c] - oml * mx)
            if best is None or m > best[0]:
                best = (m, c)
        out.append((len(out) + 1, best[1], best[0]))
        picked.append(best[1])
    return spark.createDataFrame(
        out, "rank long, vec_id long, mmr double"
    ).orderBy("rank")


def hybrid_rrf_topk(spark, sf_dir, terms=("spark", "query", "join"),
                    query_vec_id=0, depth=50, k=10,
                    rrf_k=60) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the lexical (BM25)
    and vector (cosine) rankings — the standard way an LLM-data /
    RAG pipeline combines a full-text index with an embedding index
    (Cormack et al., "Reciprocal Rank Fusion outperforms Condorcet",
    SIGIR'09: rrf(d) = Σ_lists 1/(rrf_k + rank_list(d))).

    The documents and embeddings tables share an id space (doc_id ==
    vec_id).  Each list is cut at ``depth`` before fusion; a doc in one
    list only contributes that list's term.  Ranks are computed over
    the ROUNDED scores (6dp BM25 / 5dp cosine) with doc_id tie-break so
    rank assignment is reproducible across engines — the DuckDB oracle
    mirrors this exactly.

    Scale shape: each list is cut by ``orderBy().limit(depth)`` —
    Spark's TakeOrderedAndProject, a per-partition top-``depth`` merged
    at the driver, never a global sort — and rank assignment's
    row_number window runs over the ≤ ``depth`` cut rows only.  The
    fusion full-outer join then touches ≤ 2·``depth`` rows — O(depth),
    independent of corpus size.
    """
    lex_order = [F.desc("score"), F.asc("doc_id")]
    lex = (
        _bm25_scored(spark, sf_dir, terms)
        .orderBy(*lex_order)
        .limit(depth)
        .withColumn(
            "bm25_rank", F.row_number().over(Window.orderBy(*lex_order))
        )
        .select("doc_id", "bm25_rank")
    )
    vec_order = [F.desc("cosine"), F.asc("vec_id")]
    vec = (
        _cosine_scored(spark, sf_dir, query_vec_id)
        .orderBy(*vec_order)
        .limit(depth)
        .withColumn(
            "cos_rank", F.row_number().over(Window.orderBy(*vec_order))
        )
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )
    rrf = (
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("cos_rank")), F.lit(0.0))
    )
    # absent-from-list rank is encoded 0 (ranks are 1-based) so the
    # output carries no NULLs — cross-engine NULL/NaN sort order is
    # undefined, integers are not
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("bm25_rank", F.lit(0)).cast("long").alias(
                "bm25_rank"
            ),
            F.coalesce("cos_rank", F.lit(0)).cast("long").alias(
                "cos_rank"
            ),
            F.round(rrf, 6).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


# per-language heavy hitters + df histogram pinned defaults —
# interpolated into the DuckDB oracles (change Spark and SQL together)
TOPTERMS_N = 5


def top_terms_per_lang(spark, sf_dir, n=TOPTERMS_N) -> DataFrame:
    """Per-language heavy hitters: the ``n`` most frequent terms of
    each language's slice, by total occurrences (ties -> term asc) —
    the per-group vocabulary fingerprint a mixture audit reads.
    (lang, term, n_occurrences, rank).

    Scale: one token explode + a (lang, term) count agg (shuffle on
    the composite key), then a row_number window over rows already
    reduced to vocab-per-lang size — the window input is dictionary-
    scale, never corpus-scale."""
    toks = doc_tokens(spark, sf_dir)
    meta = documents(spark, sf_dir).select("doc_id", "lang")
    counts = (
        toks.join(meta, "doc_id")
        .groupBy("lang", "term")
        .agg(F.count("*").alias("n_occurrences"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("n_occurrences"), F.asc("term")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
        .select("lang", "term", "n_occurrences", "rank")
        .orderBy("lang", "rank")
    )


def df_histogram(spark, sf_dir) -> DataFrame:
    """Document-frequency histogram: terms bucketed by floor(log2(df))
    — the Zipf-curve observability surface (how heavy is the stopword
    head, how long the rare tail) that sizes stopword pruning and the
    WAND block-max payoff.  (bucket, n_terms, min_df, max_df) ordered
    by bucket.

    floor(log2) of an integer is exact in IEEE doubles (powers of two
    are representable), so the bucket edges cannot drift between
    engines.  Scale: term-dictionary-sized input, one tiny agg."""
    df_t = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    return (
        df_t.withColumn(
            "bucket", F.floor(F.log2(F.col("df"))).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_terms"),
            F.min("df").alias("min_df"),
            F.max("df").alias("max_df"),
        )
        .orderBy("bucket")
    )


# significant-terms pinned defaults — interpolated into the DuckDB
# oracle (change Spark and SQL together)
SIG_MIN_COUNT = 10   # occurrence floor (lift's rare-term bias)
SIG_TOPN = 10        # terms kept per language


def significant_terms(spark, sf_dir, min_count: int = SIG_MIN_COUNT,
                      topn: int = SIG_TOPN) -> DataFrame:
    """(lang, term, n_fg, lift, rank) — per-language terms most
    OVER-represented vs the corpus background (the lift-scored form of
    Elasticsearch's significant_terms aggregation):

        lift = (fg · T_corpus) / (T_lang · bg)

    with fg/bg the term's occurrence counts in the language slice /
    whole corpus and T_* the slice / corpus totals.  Unlike
    top_terms_per_lang (raw heavy hitters — dominated by corpus-wide
    stopwords), lift surfaces what is DISTINCTIVE of the slice.
    min_count floors fg; rank (rounded lift desc, term asc) per lang,
    kept to topn.  All four factors are integer counts, so the
    pre-round ratio is the same IEEE double in both engines.

    Scale: one token explode, (lang, term) and term count aggs, a
    broadcast 1-row corpus total and a langs-sized total join; the
    rank window runs over vocab-per-lang rows, never corpus rows.
    """
    toks = doc_tokens(spark, sf_dir)
    meta = documents(spark, sf_dir).select("doc_id", "lang")
    ltoks = toks.join(meta, "doc_id")
    fg = ltoks.groupBy("lang", "term").agg(F.count("*").alias("n_fg"))
    bg = ltoks.groupBy("term").agg(F.count("*").alias("n_bg"))
    tl = ltoks.groupBy("lang").agg(F.count("*").alias("t_lang"))
    tc = ltoks.agg(F.count("*").alias("t_corpus"))
    lift = F.round(
        (F.col("n_fg") * F.col("t_corpus"))
        / (F.col("t_lang") * F.col("n_bg")),
        6,
    )
    w = Window.partitionBy("lang").orderBy(F.desc("lift"), F.asc("term"))
    return (
        fg.filter(F.col("n_fg") >= min_count)
        .join(bg, "term")
        .join(F.broadcast(tl), "lang")
        .crossJoin(F.broadcast(tc))
        .withColumn("lift", lift)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topn)
        .select("lang", "term", "n_fg", "lift", "rank")
        .orderBy("lang", "rank")
    )


# keyword-in-context pinned defaults — interpolated into the DuckDB
# oracle (change Spark and SQL together)
KWIC_TERM = "hash"   # in the synthetic vocabulary at every SF
KWIC_W = 3           # context tokens kept each side
KWIC_LIMIT = 50


def kwic(spark, sf_dir, term: str = KWIC_TERM, w: int = KWIC_W,
         limit: int = KWIC_LIMIT) -> DataFrame:
    """(doc_id, pos, left_ctx, right_ctx) — keyword-in-context
    concordance: every occurrence of ``term`` with up to ``w`` tokens
    of context each side, joined with single spaces; pos is the
    1-BASED token position (both engines emit the same base).  The
    corpus-linguistics reading surface next to window_snippets (which
    ranks windows; kwic enumerates occurrences).  First ``limit`` rows
    of the (doc_id, pos) total order.

    Scale: occurrences are found by posexplode + an equality filter
    (predicate on the exploded stream — corpus-scale but narrow); the
    token ARRAY is joined back only onto hit rows, so the w-window
    slices touch hits × array bytes, never corpus × array bytes (the
    span-dedup recompute rule).  Boundary slices are empty arrays →
    '' (the oracle coalesces DuckDB's NULL-on-empty to match).
    """
    raw = documents(spark, sf_dir).select(
        "doc_id",
        F.regexp_extract_all(
            F.lower("text"), F.lit(TOKEN_PATTERN), 0
        ).alias("t"),
    )
    hits = (
        raw.select("doc_id", F.posexplode("t").alias("pos0", "tok"))
        .filter(F.col("tok") == term)
        .select("doc_id", (F.col("pos0") + 1).alias("pos"))
    )
    p = F.col("pos")
    left = F.array_join(
        F.slice("t", F.greatest(F.lit(1), p - w), F.least(F.lit(w), p - 1)),
        " ",
    )
    right = F.array_join(
        F.slice("t", p + 1, F.least(F.lit(w), F.size("t") - p)), " "
    )
    return (
        hits.join(raw, "doc_id")
        .select(
            "doc_id",
            p.cast("long").alias("pos"),
            left.alias("left_ctx"),
            right.alias("right_ctx"),
        )
        .orderBy("doc_id", "pos")
        .limit(limit)
    )


# trigram substring search pinned defaults — interpolated into the
# DuckDB oracle (change Spark and SQL together)
SUBSTR_Q = "table hash"   # crosses a token boundary: tokenized search
SUBSTR_K = 20             # cannot express this match; trigrams can


def substring_search(spark, sf_dir, q=SUBSTR_Q, k=SUBSTR_K) -> DataFrame:
    """Zoekt-style substring search over raw text — the code-search
    query class the tokenized index cannot serve (matches cross token
    boundaries, include whitespace, ignore the analyzer).

    Candidate generation is the trigram-index rule: a doc can contain
    ``q`` only if its character-trigram set covers ALL of q's
    trigrams, so docs are pruned by an (in-row-distinct) trigram
    explode joined against the query's broadcast trigram set and a
    coverage count — then survivors are VERIFIED with the exact
    (lowercased) containment test and occurrence-counted.  The oracle
    is the brute-force full-text containment scan: equality proves the
    trigram pruning lossless (the fuzzy_terms proof pattern).  Returns
    (doc_id, n_occurrences), n desc / doc_id asc, top k; requires
    len(q) >= 3 (below that there are no trigrams to prune with).

    Scale: this op inlines the index build (one pass, len(text) rows
    per doc before the broadcast prune) because the driver tables are
    rebuilt per run; a deployment materializes the (trigram, doc_id)
    table once — Zoekt's shard build — and only the tiny
    intersect+verify part runs per query.  The verify join touches
    candidates only.
    """
    ql = q.lower()
    if len(ql) < 3:
        raise ValueError("substring_search needs len(q) >= 3")
    need = sorted({ql[i:i + 3] for i in range(len(ql) - 2)})
    d = documents(spark, sf_dir)
    tri = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 2, 0)),"
                    " i -> substring(lower(text), i, 3))"
                )
            )
        ).alias("tg"),
    )
    needed = spark.createDataFrame([(t,) for t in need], "tg string")
    cand = (
        tri.join(F.broadcast(needed), "tg")
        .groupBy("doc_id")
        .agg(F.count("*").alias("ncov"))
        .filter(F.col("ncov") == len(need))
        .select("doc_id")
    )
    lt = F.lower(F.col("text"))
    return (
        d.join(cand, "doc_id")
        .withColumn(
            "n_occurrences",
            (
                (F.length(lt) - F.length(F.replace(lt, F.lit(ql))))
                / F.lit(len(ql))
            ).cast("long"),
        )
        .filter(F.col("n_occurrences") > 0)
        .select("doc_id", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )


def _trigram_index_key_dir(sf_dir):
    """On-disk dir for the persisted trigram shard over ``sf_dir`` —
    keyed on the documents file's (path, mtime) like the flat index."""
    src = f"{sf_dir}/documents.parquet"
    key = ("tri", os.path.abspath(src), int(os.path.getmtime(src)))
    d = os.path.join(
        tempfile.gettempdir(),
        "searchengine_spark_tri",
        hashlib.md5(repr(key).encode()).hexdigest()[:16],
    )
    return key, d


def trigram_index_cache_reset(sf_dir):
    """Drop the persisted trigram shard (bench cold-timing surface —
    the temp dir survives across processes, flat_index_cache_reset's
    argument verbatim)."""
    import shutil

    _, d = _trigram_index_key_dir(sf_dir)
    shutil.rmtree(d, ignore_errors=True)


def substring_search_persisted(spark, sf_dir, q=SUBSTR_Q,
                               k=SUBSTR_K) -> DataFrame:
    """substring_search served from the PERSISTED trigram shard
    (index/trigram.py — build once, partition-pruned reads per query:
    the Zoekt deployment shape).  Same output contract and the same
    brute-force containment oracle as the inline op; the shard is
    built on first use per (sf_dir, mtime) and the manifest is the
    completeness marker, so a crashed build rebuilds."""
    from ..index.trigram import (
        MANIFEST,
        build_trigram_index,
        substring_topk_ondisk,
    )

    _, d = _trigram_index_key_dir(sf_dir)
    docs = documents(spark, sf_dir).select("doc_id", "text")
    if not os.path.exists(os.path.join(d, MANIFEST)):
        os.makedirs(d, exist_ok=True)
        build_trigram_index(spark, docs, d)
    return substring_topk_ondisk(spark, d, docs, q, k=k)


# regex search pinned defaults — interpolated into the DuckDB oracle
# (the pattern is restricted to the dialect-identical subset: literals,
# character classes, ., quantifiers — see regex_literal_runs)
REGEX_Q = "tab[a-z]e +hash"
# the pinned ALTERNATION pattern (branch-union pruning; both branches
# match docs in the synthetic corpus) — interpolated into the oracle
REGEX_ALT_Q = "tab[a-z]e +hash|merge (sort|join)"
REGEX_K = 20


def regex_literal_runs(pattern: str) -> list:
    """Literal substrings GUARANTEED to appear in any match of
    ``pattern`` — the Zoekt planning step that turns a regex into
    trigram requirements.  Pure string processing, no regex engine.

    Supported atoms: literal chars, escaped literals (\\.), character
    classes [...], '.', and quantifiers * + ? {m,n} applying to the
    PRECEDING atom (which therefore leaves the literal run — a '?' or
    '*' atom may be absent, and a '+'/'{' atom's repetition boundary
    is unknown, so the run safely splits there).  Alternation and
    groups make "guaranteed" require a product over branches — out of
    this subset, so '|', '(' and ')' raise (callers fall back to a
    full verify scan, still correct, just unpruned).
    """
    runs, cur, i = [], "", 0
    prev_literal = False  # whether the LAST atom appended to cur

    def flush():
        nonlocal cur
        if cur:
            runs.append(cur)
        cur = ""

    while i < len(pattern):
        c = pattern[i]
        if c in "(|)":
            raise ValueError(
                f"regex_literal_runs: unsupported {c!r} in {pattern!r}"
            )
        if c == "\\":
            if i + 1 >= len(pattern):
                raise ValueError(f"trailing backslash in {pattern!r}")
            nxt = pattern[i + 1]
            if nxt.isalnum():  # \d \w \s ... : a class, not a literal
                flush()
                prev_literal = False
            else:              # \. \\ \+ ... : an escaped literal
                cur += nxt
                prev_literal = True
            i += 2
            continue
        if c == "[":
            j = pattern.find("]", i + 1)
            if j < 0:
                raise ValueError(f"unclosed class in {pattern!r}")
            flush()
            prev_literal = False
            i = j + 1
            continue
        if c == ".":
            flush()
            prev_literal = False
            i += 1
            continue
        if c in "*+?{":
            # quantifier on the preceding atom: that atom's presence /
            # adjacency is uncertain, so it leaves the literal run
            if prev_literal and cur:
                cur = cur[:-1]
            flush()
            prev_literal = False
            if c == "{":
                j = pattern.find("}", i + 1)
                if j < 0:
                    raise ValueError(f"unclosed brace in {pattern!r}")
                i = j + 1
            else:
                i += 1
            continue
        if c in "^$":
            flush()
            prev_literal = False
            i += 1
            continue
        cur += c
        prev_literal = True
        i += 1
    flush()
    return runs


def _regex_split_top(pattern: str) -> list:
    """Split on TOP-LEVEL alternation bars (depth-0 ``|`` outside
    classes and escapes).  Pure string processing."""
    branches, cur, depth, i = [], "", 0, 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            if i + 1 >= len(pattern):
                raise ValueError(f"trailing backslash in {pattern!r}")
            cur += pattern[i:i + 2]
            i += 2
            continue
        if c == "[":
            j = pattern.find("]", i + 1)
            if j < 0:
                raise ValueError(f"unclosed class in {pattern!r}")
            cur += pattern[i:j + 1]
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in {pattern!r}")
        if c == "|" and depth == 0:
            branches.append(cur)
            cur = ""
        else:
            cur += c
        i += 1
    if depth != 0:
        raise ValueError(f"unbalanced '(' in {pattern!r}")
    branches.append(cur)
    return branches


def _match_paren(p: str, i: int) -> int:
    """Index of the ``)`` closing the ``(`` at ``p[i]`` (escape- and
    class-aware)."""
    depth, j = 0, i
    while j < len(p):
        c = p[j]
        if c == "\\":
            j += 2
            continue
        if c == "[":
            k = p.find("]", j + 1)
            if k < 0:
                raise ValueError(f"unclosed class in {p!r}")
            j = k + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise ValueError(f"unbalanced '(' in {p!r}")


def _branch_runs(branch: str) -> list:
    """Guaranteed literal runs of ONE branch (no top-level ``|``),
    group-aware: a bare, alternation-free, unquantified group is
    TRANSPARENT (parens spliced out — runs merge across it, so
    ``ab(cd)ef`` guarantees ``abcdef``); a quantified group or one
    containing alternation is an OPAQUE atom (splits runs, contributes
    nothing — still sound: every emitted run stays guaranteed).
    ``(?...)`` constructs are outside the dialect-identical subset and
    raise."""
    runs, cur, i = [], "", 0
    prev_literal = False

    def flush():
        nonlocal cur
        if cur:
            runs.append(cur)
        cur = ""

    while i < len(branch):
        c = branch[i]
        if c in "|)":
            raise ValueError(
                f"_branch_runs: stray {c!r} in {branch!r}"
            )
        if c == "\\":
            if i + 1 >= len(branch):
                raise ValueError(f"trailing backslash in {branch!r}")
            nxt = branch[i + 1]
            if nxt.isalnum():
                flush()
                prev_literal = False
            else:
                cur += nxt
                prev_literal = True
            i += 2
            continue
        if c == "(":
            if branch[i + 1:i + 2] == "?":
                raise ValueError(
                    f"(?...) constructs unsupported in {branch!r}"
                )
            j = _match_paren(branch, i)
            inner = branch[i + 1:j]
            quantified = branch[j + 1:j + 2] in ("*", "+", "?", "{")
            if quantified or len(_regex_split_top(inner)) != 1:
                # opaque atom; a following quantifier then hits the
                # quantifier arm below with prev_literal False (the
                # group was never part of cur), which is exactly right
                flush()
                prev_literal = False
                i = j + 1
                continue
            # transparent: splice the body in place (strictly shorter,
            # so the scan terminates)
            branch = branch[:i] + inner + branch[j + 1:]
            continue
        if c == "[":
            j = branch.find("]", i + 1)
            if j < 0:
                raise ValueError(f"unclosed class in {branch!r}")
            flush()
            prev_literal = False
            i = j + 1
            continue
        if c == ".":
            flush()
            prev_literal = False
            i += 1
            continue
        if c in "*+?{":
            if prev_literal and cur:
                cur = cur[:-1]
            flush()
            prev_literal = False
            if c == "{":
                j = branch.find("}", i + 1)
                if j < 0:
                    raise ValueError(f"unclosed brace in {branch!r}")
                i = j + 1
            else:
                i += 1
            continue
        if c in "^$":
            flush()
            prev_literal = False
            i += 1
            continue
        cur += c
        prev_literal = True
        i += 1
    flush()
    return runs


def regex_branch_runs(pattern: str) -> list:
    """Per-top-level-branch guaranteed literal runs — the alternation
    extension of regex_literal_runs (the Zoekt planning rule:
    candidates(A|B) = candidates(A) ∪ candidates(B), lossless iff
    EVERY branch yields a usable run).  Returns one runs-list per
    top-level branch; an empty branch yields ``[]`` (it matches
    everywhere — callers must fall back to the full verify scan)."""
    return [_branch_runs(b) for b in _regex_split_top(pattern)]


def regex_anchor_sets(pattern: str) -> list | None:
    """Pruning plan for ``pattern``: one sorted distinct trigram list
    per top-level branch (the trigrams of that branch's LONGEST
    guaranteed literal run), or ``None`` when any branch lacks a
    >= 3-char run (union pruning would be lossy, so the caller must
    full-scan).  Duplicate anchor sets collapse.  Shared by the Spark
    op (regex_search), the persisted shard (index/trigram), and the
    ms tier (query/serve_grep) — ONE planner for all three tiers."""
    out, seen = [], set()
    for runs in regex_branch_runs(pattern):
        good = [r for r in runs if len(r) >= 3]
        if not good:
            return None
        a = max(good, key=len)
        need = tuple(sorted({a[i:i + 3] for i in range(len(a) - 2)}))
        if need not in seen:
            seen.add(need)
            out.append(list(need))
    return out


def regex_search(spark, sf_dir, pattern=REGEX_Q, k=REGEX_K) -> DataFrame:
    """Zoekt-style regex search: candidates are pruned by the trigrams
    of the LONGEST guaranteed literal run of the pattern
    (regex_literal_runs), then verified with the real regex engine and
    counted (leftmost non-overlapping matches — regexp_count in Spark,
    len(regexp_extract_all) in the DuckDB oracle; identical for the
    supported dialect subset).  Alternation (``a|b``, incl. groups)
    prunes as the UNION of each top-level branch's trigram-coverage
    candidates (regex_anchor_sets); a pattern where any branch's
    longest run is < 3 chars gets no pruning (full verify scan —
    correct, just unpruned).  (doc_id, n_matches), n desc / doc_id
    asc, top k.  The oracle is the brute-force regex scan: equality
    proves the branch-union pruning lossless."""
    need_sets = regex_anchor_sets(pattern.lower())
    d = documents(spark, sf_dir)
    if need_sets:
        tri = d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, greatest(length(text) - 2,"
                        " 0)), i -> substring(lower(text), i, 3))"
                    )
                )
            ).alias("tg"),
        )
        needed = spark.createDataFrame(
            [(bi, tg) for bi, s in enumerate(need_sets) for tg in s],
            "br int, tg string",
        )
        sizes = spark.createDataFrame(
            [(bi, len(s)) for bi, s in enumerate(need_sets)],
            "br int, need_n int",
        )
        # a doc is a candidate iff it covers ALL trigrams of ANY
        # branch anchor (per-doc distinct rows, so count == coverage)
        cand = (
            tri.join(F.broadcast(needed), "tg")
            .groupBy("doc_id", "br")
            .agg(F.count("*").alias("ncov"))
            .join(F.broadcast(sizes), "br")
            .filter(F.col("ncov") == F.col("need_n"))
            .select("doc_id")
            .distinct()
        )
        d = d.join(cand, "doc_id")
    return (
        d.withColumn(
            "n_matches",
            F.regexp_count(
                F.lower("text"), F.lit(pattern.lower())
            ).cast("long"),
        )
        .filter(F.col("n_matches") > 0)
        .select("doc_id", "n_matches")
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(k)
    )


def regex_alt_search(spark, sf_dir, pattern=REGEX_ALT_Q,
                     k=REGEX_K) -> DataFrame:
    """regex_search under the pinned alternation pattern — the driver
    surface for branch-union trigram pruning (top-level ``|`` plus an
    opaque inner group).  Same contract, same brute-force oracle:
    equality proves the union pruning lossless."""
    return regex_search(spark, sf_dir, pattern=pattern, k=k)


def regex_search_persisted(spark, sf_dir, pattern=REGEX_Q,
                           k=REGEX_K) -> DataFrame:
    """regex_search served from the persisted trigram shard
    (index/trigram.regex_topk_ondisk) — same contract and the same
    brute-force regex oracle; shares the shard (and its build-once
    cache) with substring_search_persisted."""
    from ..index.trigram import (
        MANIFEST,
        build_trigram_index,
        regex_topk_ondisk,
    )

    _, d = _trigram_index_key_dir(sf_dir)
    docs = documents(spark, sf_dir).select("doc_id", "text")
    if not os.path.exists(os.path.join(d, MANIFEST)):
        os.makedirs(d, exist_ok=True)
        build_trigram_index(spark, docs, d)
    return regex_topk_ondisk(spark, d, docs, pattern, k=k)


def regex_alt_search_persisted(spark, sf_dir, pattern=REGEX_ALT_Q,
                               k=REGEX_K) -> DataFrame:
    """The alternation pattern served from the persisted trigram shard
    (per-branch candidate union inside regex_topk_ondisk)."""
    return regex_search_persisted(spark, sf_dir, pattern=pattern, k=k)


COUNT_TERMS = ("spark", "query", "join")   # the lm/bm25 probe set


def match_counts(spark, sf_dir, terms=COUNT_TERMS) -> DataFrame:
    """(mode, n_docs) — total-hits counts without scoring, both query
    modes at once: docs containing ALL the terms ("and") and docs
    containing ANY ("or").  The batch twin of the serving tier's
    LocalSearcher.count (the Lucene IndexSearcher.count surface) —
    hit totals power pagination and facet UIs where a scored top-k is
    wasted work.

    Scale: one distinct (doc, term) projection filtered to the |terms|
    probe set, one per-doc countDistinct, one 2-row aggregate — no
    scoring chain, no windows."""
    tlist = list(dict.fromkeys(terms))
    qterms = spark.createDataFrame([(t,) for t in tlist], "term string")
    per_doc = (
        doc_tokens(spark, sf_dir)
        .join(F.broadcast(qterms), "term")
        .select("doc_id", "term")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("nm"))
    )
    agg = per_doc.agg(
        F.sum(
            F.when(F.col("nm") == len(tlist), 1).otherwise(0)
        ).cast("long").alias("n_and"),
        F.count("*").cast("long").alias("n_or"),
    )
    return agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("and").alias("mode"),
                    F.col("n_and").alias("n_docs"),
                ),
                F.struct(
                    F.lit("or").alias("mode"),
                    F.col("n_or").alias("n_docs"),
                ),
            )
        ).alias("r")
    ).select("r.mode", "r.n_docs").orderBy("mode")


def match_counts_oracle_sql(terms=COUNT_TERMS) -> str:
    tlist = list(dict.fromkeys(terms))
    inlist = ", ".join(f"'{t}'" for t in tlist)
    return f"""
        WITH toks AS (
          SELECT DISTINCT doc_id, t.term FROM (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                     AS term
            FROM documents) t
          WHERE t.term IN ({inlist})),
        per_doc AS (
          SELECT doc_id, count(*) AS nm FROM toks GROUP BY doc_id),
        agg AS (
          SELECT sum(CASE WHEN nm = {len(tlist)} THEN 1 ELSE 0 END)
                   ::BIGINT AS n_and,
                 count(*)::BIGINT AS n_or
          FROM per_doc)
        SELECT 'and' AS mode, n_and AS n_docs FROM agg
        UNION ALL
        SELECT 'or', n_or FROM agg
        ORDER BY mode
    """


HV_DIM = 64        # hashing-trick feature dimensions
HV_DOC_ID = 1      # pinned query document (the MLT probe doc)
HV_K = 10


def hashed_tfidf_topk(spark, sf_dir, doc_id: int = HV_DOC_ID,
                      dim: int = HV_DIM, k: int = HV_K) -> DataFrame:
    """(doc_id, cos) — model-free embedding retrieval: every doc is
    featurized by the hashing trick (tf·idf mass summed into
    ``dim`` buckets keyed by the md5-u32 of the term — the
    HashingVectorizer staple) and ranked by cosine against the pinned
    query document's vector, source excluded.  The no-model bridge
    from the text corpus into the ANN family's vector shapes.

    Float discipline: tf·ln(N/df) weights flow UNROUNDED through
    ORDER-PINNED folds — bucket sums fold colliding terms in term
    order, norms and dots fold buckets in bucket order, each a left
    fold with a 0.0 init ((0+x) == x exactly, and DuckDB's
    list_reduce seeds with the first element — the same fold) — so
    both engines produce bit-identical doubles before the one round-6
    on the final cosine.  Docs sharing no bucket with the query are
    unscored (inner-join semantics; at dim=64 over a corpus
    vocabulary that is the empty-overlap corner only).

    Scale: two key-hash aggs (term tf, bucket sums), a broadcast of
    the dim-row query vector, one per-doc fold — the ann_cosine shape
    with engine-derived vectors instead of a stored embedding
    column."""
    from .mix import kmv_u32_sql

    tf = term_tf(spark, sf_dir)
    stats = tf.agg(F.countDistinct("doc_id").alias("n"))
    dft = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    coords = (
        tf.join(dft, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "term",
            F.expr(f"pmod({kmv_u32_sql('term')}, {dim})").alias("j"),
            (
                F.col("tf").cast("double")
                * F.log(F.col("n").cast("double") / F.col("df"))
            ).alias("w"),
        )
        .groupBy("doc_id", "j")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(term, w))), "
                "cast(0 as double), (a, x) -> a + x.w)"
            ).alias("v")
        )
    )
    norms = coords.groupBy("doc_id").agg(
        F.expr(
            "sqrt(aggregate(array_sort(collect_list(struct(j, v))), "
            "cast(0 as double), (a, x) -> a + x.v * x.v))"
        ).alias("nrm")
    )
    qv = coords.filter(F.col("doc_id") == doc_id).select(
        "j", F.col("v").alias("qv")
    )
    qn = norms.filter(F.col("doc_id") == doc_id).select(
        F.col("nrm").alias("qn")
    )
    dots = (
        coords.join(F.broadcast(qv), "j")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(j, v, qv))), "
                "cast(0 as double), (a, x) -> a + x.v * x.qv)"
            ).alias("dot")
        )
    )
    return (
        dots.join(norms, "doc_id")
        .crossJoin(F.broadcast(qn))
        .filter(F.col("doc_id") != doc_id)
        .select(
            "doc_id",
            F.round(
                F.col("dot") / (F.col("nrm") * F.col("qn")), 6
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(k)
    )


def hashed_tfidf_topk_oracle_sql(doc_id: int = HV_DOC_ID,
                                 dim: int = HV_DIM,
                                 k: int = HV_K) -> str:
    from .mix import kmv_u32_sql

    u32 = kmv_u32_sql("term")
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(
            regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        st AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf GROUP BY term),
        wts AS (
          SELECT tf.doc_id, tf.term,
                 ({u32}) % {dim} AS j,
                 tf.tf::DOUBLE * ln(st.n / dft.df) AS w
          FROM tf JOIN dft USING (term) CROSS JOIN st),
        coords AS (
          SELECT doc_id, j,
                 list_reduce(list(w ORDER BY term),
                             (a, b) -> a + b) AS v
          FROM wts GROUP BY doc_id, j),
        norms AS (
          SELECT doc_id,
                 sqrt(list_reduce(list(v * v ORDER BY j),
                                  (a, b) -> a + b)) AS nrm
          FROM coords GROUP BY doc_id),
        qv AS (SELECT j, v AS qv FROM coords
               WHERE doc_id = {doc_id}),
        qn AS (SELECT nrm AS qn FROM norms WHERE doc_id = {doc_id}),
        dots AS (
          SELECT c.doc_id,
                 list_reduce(list(c.v * q.qv ORDER BY c.j),
                             (a, b) -> a + b) AS dot
          FROM coords c JOIN qv q USING (j)
          GROUP BY c.doc_id)
        SELECT d.doc_id,
               round(d.dot / (n.nrm * q.qn), 6) AS cos
        FROM dots d JOIN norms n USING (doc_id) CROSS JOIN qn q
        WHERE d.doc_id != {doc_id}
        ORDER BY cos DESC, doc_id LIMIT {k}
    """


LTR_POOL = 20   # retrieval-pool size feature rows are exported for


def ltr_features(spark, sf_dir, pool: int = LTR_POOL) -> DataFrame:
    """(qid, doc_id, rank, nmatch, sum_tf, dl, bm25, min_win) — the
    learning-to-rank training export: per pinned EVAL_QUERIES query,
    one feature row for each doc in the top-``pool`` disjunctive-BM25
    retrieval — exactly the (query, doc) feature table an LTR trainer
    (LambdaMART / a cross-encoder distillation set) consumes, with the
    graded label nmatch alongside (the eval family's deterministic
    qrels).

    Features: pool rank (rounded-rank contract), nmatch = distinct
    query terms present, sum_tf = total query-term occurrences, dl =
    the BM25 doc length (the distinct-term quirk length the scorer
    itself uses), bm25 = the rounded disjunctive score, min_win = the
    k-ary minimal covering window over ALL query terms (the span_near
    tightness signal) — 0 when the doc is not a full conjunctive
    match (partial matches have no full cover; 0 is the pinned
    "undefined" encoding, distinguishable because a real cover is
    >= nterms >= 2).

    Scale: the candidate/rank stages are the eval family's shape
    (broadcast query set, one shuffle agg, per-qid windows over
    matched candidates).  min_win is computed ONLY for pool docs —
    the anchor join is quadratic in a doc's query-term occurrences
    but runs on <= |queries| * pool rows (the L2-rerank cascade
    shape: expensive features only for the retrieval pool)."""
    from ..text.tokenizer import TOKEN_PATTERN

    nt_rows = [(qid, len(terms)) for qid, terms in EVAL_QUERIES]
    ntdf = spark.createDataFrame(nt_rows, "qid long, nterms long")
    cand = _eval_candidates(spark, sf_dir).join(
        F.broadcast(ntdf), "qid"
    )
    wr = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    pooled = (
        cand.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= pool)
    )
    qrows = [(qid, t) for qid, terms in EVAL_QUERIES for t in terms]
    qterms = spark.createDataFrame(qrows, "qid long, term string")
    toks = documents(spark, sf_dir).select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.lower("text"), F.lit(TOKEN_PATTERN), 0
            )
        ).alias("pos0", "term"),
    ).select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "term"
    )
    qpos = (
        toks.join(F.broadcast(qterms), "term")
        .join(pooled.select("qid", "doc_id"), ["qid", "doc_id"])
        .select("qid", "doc_id", "pos", "term")
    )
    anchors = qpos.select("qid", "doc_id", "pos").distinct()
    nxt = (
        anchors.alias("a")
        .join(
            qpos.alias("q"),
            (F.col("a.qid") == F.col("q.qid"))
            & (F.col("a.doc_id") == F.col("q.doc_id"))
            & (F.col("q.pos") >= F.col("a.pos")),
        )
        .groupBy(
            F.col("a.qid").alias("qid"),
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.pos").alias("p"),
            F.col("q.term").alias("term"),
        )
        .agg(F.min("q.pos").alias("np"))
    )
    cover = (
        nxt.groupBy("qid", "doc_id", "p")
        .agg(
            F.max("np").alias("e"),
            F.countDistinct("term").alias("ct"),
        )
        .join(F.broadcast(ntdf), "qid")
        .filter(F.col("ct") == F.col("nterms"))
    )
    win = cover.groupBy("qid", "doc_id").agg(
        F.min(F.col("e") - F.col("p") + 1).cast("long").alias("min_win")
    )
    return (
        pooled.join(win, ["qid", "doc_id"], "left")
        .na.fill({"min_win": 0})
        .select(
            "qid", "doc_id", "rank",
            F.col("rel").cast("long").alias("nmatch"),
            "sum_tf", "dl",
            F.col("score").alias("bm25"),
            "min_win",
        )
        .orderBy("qid", "rank")
    )
