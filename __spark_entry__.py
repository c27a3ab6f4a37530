"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end engine (corpus ingest →
dedup → postings → PageRank/HITS → batch BM25 top-k) on the sf0.001
``documents`` table mapped into the input_hint corpus shape.

``queries()`` / ``oracle_sql()`` expose SQL-checkable operators from
SURVEY.md §2 over the driver's parquet tables; each pair is
semantically identical Spark-vs-DuckDB (same tokenizer regex, same
literals, same rounding, same column names).  ``engine_topk_flat`` /
``engine_topk_ondisk_flat`` run the engine unstemmed so the entire
chain — docid assignment, dedup, analyze, stats, query prune / abort /
stopword readmission, BM25+cosine blend, top-k — is value-checked
against one full-chain DuckDB oracle; ``engine_topk_stem`` /
``engine_topk_ondisk_stem`` run the SAME chain with the real Porter
analyze path on, oracled by the same SQL with corpus and query tokens
routed through an interpolated (term, stem) VALUES map (DuckDB has no
Porter offline; the map comes from the in-repo stemmer, which keeps
its published-vector pytest gate).  The flagship ``engine_topk`` twins
themselves are oracled by the FULL variant of the same SQL
(stem map + interpolated unsigned-xxh64 hash-order ids + 64-bit
simhash near-dup computed as integer arithmetic from interpolated
per-term CRC-64 sign weights + the empty-edge-graph quality
constants) — every interpolated map comes from a pure function whose
own parity/vector gate lives in pytest, so the SQL proves the entire
distributed pipeline around them.  When the test corpora are absent
(or a full-mode precondition fails) those entries degrade to
rows-only, still covered by the 20-query rank-identity pytest gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

FLAGSHIP_QUERIES = [
    (1, "spark query join"),
    (2, "hash merge sort"),
    (3, "window agg stream"),
]

# The SQL-oracle-able engine variant's query set, chosen to exercise every
# prune branch (reference lib/queryproc.py:195-233): plain conjunctive,
# stopword readmission (the/a), unknown-term prune without abort, full
# abort (pruned > 2*valid), and a rare-term query.
ENGINE_FLAT_QUERIES = [
    (1, "spark query join"),
    (2, "the data table a the sort"),
    (3, "window agg stream zzzqx"),
    (4, "zzzqx vvkwq qqqpt join"),
    (5, "dup merge"),
]


def _documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table to the input_hint corpus shape
    (repo, path, commit, lang, content)."""
    from searchengine_spark.corpus.ingest import documents_as_corpus

    return documents_as_corpus(spark, sf_dir)


_TABLES_CACHE = {}


def _engine_tables(spark, sf_dir):
    if sf_dir not in _TABLES_CACHE:
        from searchengine_spark.index import build_tables

        corpus = _documents_as_corpus(spark, sf_dir)
        # scale path by default: 64-bit simhash (16-bit LSH bands) and
        # samplerless hash-order docids; the 32-bit/lexical parity mode
        # lives where oracles assert it (pytest fixtures, *_flat twins)
        _TABLES_CACHE[sf_dir] = build_tables(
            spark, corpus, compute_quality=True,
            simhash_bits=64, id_order="hash",
        )
    return _TABLES_CACHE[sf_dir]


def _run_engine(spark: SparkSession, sf_dir: str, queries, k=10) -> DataFrame:
    from searchengine_spark.query.scoring import score_queries

    tables = _engine_tables(spark, sf_dir)
    res = score_queries(spark, queries, tables, k=k)
    urls = tables.docs.select("docid", "url")
    # round-6 like every oracled entry (sum-order ulp noise); the full
    # flagship chain is SQL-oracled via _engine_flat_oracle_sql(full=True)
    return res.join(urls, "docid").select(
        "qid", "rank", "docid", "url",
        F.round("score", 6).alias("score"),
    )


def _index_cache_dir(sf_dir: str, tag: str) -> str:
    """Temp index dir keyed by the source files' (name, mtime, size) — a
    changed dataset at the same path invalidates the cached on-disk index
    (a stale complete manifest would otherwise serve the old index).
    Keying on the files INSIDE the dir matters: overwriting a parquet
    file in place does not touch the directory mtime."""
    import hashlib
    import os
    import tempfile

    sig = ";".join(
        f"{name}:{st.st_mtime_ns}:{st.st_size}"
        for name in sorted(os.listdir(sf_dir))
        for st in [os.stat(os.path.join(sf_dir, name))]
    )
    key = f"{os.path.abspath(sf_dir)}|{sig}|{tag}"
    return os.path.join(
        tempfile.gettempdir(),
        "searchengine_spark_idx",
        tag + "_" + hashlib.md5(key.encode()).hexdigest()[:16],
    )


def _run_engine_ondisk(spark: SparkSession, sf_dir: str, queries, k=10) -> DataFrame:
    """Full north-rule pipeline: corpus → build → compressed on-disk index
    (resumable, salted) → blended top-k served from the shards."""
    from searchengine_spark.index.shards import load_index, write_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    tables = _engine_tables(spark, sf_dir)
    d = _index_cache_dir(sf_dir, "engine")
    write_index(spark, tables, d)  # stage-skipping: cheap when complete
    shards = load_index(spark, d)
    return score_queries_ondisk(spark, queries, shards, k=k).select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _engine_tables_flat(spark, sf_dir):
    """SQL-expressible engine variant: unstemmed tokens, no simhash stage,
    quality pinned at 1.0 — every remaining stage (lexical docid rank,
    empty filter, sha256 dedup, analyze, stats, prune, BM25+cosine blend,
    top-k) is mirrored term-for-term by the engine_topk_flat oracle."""
    key = (sf_dir, "flat")
    if key not in _TABLES_CACHE:
        from searchengine_spark.index import build_tables

        corpus = _documents_as_corpus(spark, sf_dir)
        _TABLES_CACHE[key] = build_tables(
            spark, corpus, compute_quality=False, stem=False, near_dup=False
        )
    return _TABLES_CACHE[key]


def _run_engine_flat(spark: SparkSession, sf_dir: str, queries, k=10) -> DataFrame:
    from searchengine_spark.query.scoring import score_queries

    tables = _engine_tables_flat(spark, sf_dir)
    res = score_queries(spark, queries, tables, k=k, stem=False)
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _run_engine_ondisk_flat(
    spark: SparkSession, sf_dir: str, queries, k=10
) -> DataFrame:
    """The flat variant served from the compressed on-disk index — same
    oracle as _run_engine_flat, proving write_index/fetch_postings
    end-to-end against DuckDB."""
    from searchengine_spark.index.shards import load_index, write_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    tables = _engine_tables_flat(spark, sf_dir)
    d = _index_cache_dir(sf_dir, "engineflat")
    write_index(spark, tables, d)
    shards = load_index(spark, d)
    res = score_queries_ondisk(spark, queries, shards, k=k, stem=False)
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _run_engine_flat_bm25f(
    spark: SparkSession, sf_dir: str, queries, k=10
) -> DataFrame:
    """BM25F field-weight variant of the flat engine: tables built with
    the live importance extractor (path/def/sig-line priorities,
    text/importance.py) and scored with params.IMPORTANCE multipliers —
    the reference's per-tag machinery (lib/queryproc.py:74) switched ON
    instead of the parity constant-0.  Checked end-to-end by the
    importance-extended full-chain DuckDB oracle."""
    from searchengine_spark.query.scoring import score_queries

    res = score_queries(
        spark, queries, _engine_tables_flatimp(spark, sf_dir), k=k,
        stem=False, importance=True,
    )
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _engine_tables_flatimp(spark, sf_dir):
    """Flat tables with the live importance extractor — shared by the
    in-memory and on-disk BM25F twins."""
    key = (sf_dir, "flatimp")
    if key not in _TABLES_CACHE:
        from searchengine_spark.index import build_tables
        from searchengine_spark.text.importance import (
            extract_importance_text,
        )

        corpus = _documents_as_corpus(spark, sf_dir)
        _TABLES_CACHE[key] = build_tables(
            spark, corpus, compute_quality=False, stem=False,
            near_dup=False, importance_fn=extract_importance_text,
        )
    return _TABLES_CACHE[key]


def _run_engine_ondisk_bm25f(
    spark: SparkSession, sf_dir: str, queries, k=10
) -> DataFrame:
    """The BM25F variant served from the compressed on-disk index: the
    importance-payload format (write_index(store_importance=True) —
    field priorities in the payload's trailing varbyte section,
    importance-scaled block maxima) scored by the same BM25F chain as
    the flat twin, under the SAME importance-extended full-chain
    DuckDB oracle — closing the round-3 'BM25F is in-memory-only'
    parity gap."""
    from searchengine_spark.index.shards import load_index, write_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    tables = _engine_tables_flatimp(spark, sf_dir)
    d = _index_cache_dir(sf_dir, "engineflatimp")
    write_index(spark, tables, d, store_importance=True)
    shards = load_index(spark, d)
    res = score_queries_ondisk(
        spark, queries, shards, k=k, stem=False, importance=True
    )
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _engine_tables_stem(spark, sf_dir):
    """Stemmed SQL-expressible variant: the flat configuration with the
    REAL Porter analyze chain switched on — the oracle mirrors the stem
    via an interpolated (term, stem) VALUES map (_testdata_stem_pairs),
    so the flagship stemmed analyze path gets a full-chain SQL check."""
    key = (sf_dir, "stem")
    if key not in _TABLES_CACHE:
        from searchengine_spark.index import build_tables

        corpus = _documents_as_corpus(spark, sf_dir)
        _TABLES_CACHE[key] = build_tables(
            spark, corpus, compute_quality=False, stem=True,
            near_dup=False,
        )
    return _TABLES_CACHE[key]


def _run_engine_stem(spark: SparkSession, sf_dir: str, queries,
                     k=10) -> DataFrame:
    from searchengine_spark.query.scoring import score_queries

    tables = _engine_tables_stem(spark, sf_dir)
    res = score_queries(spark, queries, tables, k=k, stem=True)
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _run_engine_ondisk_stem(
    spark: SparkSession, sf_dir: str, queries, k=10
) -> DataFrame:
    """The stemmed variant served from the compressed on-disk index —
    same oracle, proving write_index/fetch_postings over the STEMMED
    term dictionary (different bucket keys than the flat twin)."""
    from searchengine_spark.index.shards import load_index, write_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    tables = _engine_tables_stem(spark, sf_dir)
    d = _index_cache_dir(sf_dir, "enginestem")
    write_index(spark, tables, d)
    shards = load_index(spark, d)
    res = score_queries_ondisk(spark, queries, shards, k=k, stem=True)
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _run_engine_segments_flat(
    spark: SparkSession, sf_dir: str, queries, k=10
) -> DataFrame:
    """The flat engine served from a 2-GENERATION segmented index
    (index/segments.py): the corpus splits at its lexical midpoint,
    seg=0 is built from the first half, seg=1 is APPENDED from the
    second (cross-segment sha256 dedup, dense docids continuing across
    the boundary), and queries run over the segment union.

    Because lexical docid assignment per half reproduces the monolithic
    ranks exactly (the halves are contiguous in the global order) and
    append-time dedup keeps the same keep-lowest-docid rule, the result
    is semantically identical to the monolithic flat index — so the
    SAME full-chain DuckDB oracle checks it.  That invariance is the
    point: segments change the physical layout, never the answers.

    (The midpoint split uses a global row_number window — fine for a
    correctness harness at driver scale; production appends arrive
    pre-batched by time, no global sort exists in the serving path.)
    """
    from searchengine_spark.index.segments import load_segments
    from searchengine_spark.query.scoring import score_queries_ondisk

    d = _segmented_flat_dir(spark, sf_dir)
    shards = load_segments(spark, d)
    res = score_queries_ondisk(spark, queries, shards, k=k, stem=False)
    return res.select(
        "qid", "rank", "docid", F.round("score", 6).alias("score")
    )


def _segmented_flat_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse from cache) the 2-generation flat segmented
    index used by segments_topk_flat / index_stats_flat."""
    import os
    import shutil

    from pyspark.sql.window import Window

    from searchengine_spark.index import build_tables
    from searchengine_spark.index.segments import (
        append_segment,
        init_segmented,
    )

    # "2": store_content added round 3 — old caches lack the sidecar
    d = _index_cache_dir(sf_dir, "engineflatseg2")
    meta_ok = False
    meta_path = os.path.join(d, "segments.json")
    if os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta_ok = len(json.load(f)["segments"]) == 2
    if not meta_ok:
        shutil.rmtree(d, ignore_errors=True)  # half-built cache
        corpus = _documents_as_corpus(spark, sf_dir)
        ranked = corpus.withColumn(
            "_rk",
            F.row_number().over(Window.orderBy("repo", "path", "commit")),
        ).persist()
        half = ranked.count() // 2
        kwargs = dict(compute_quality=False, stem=False, near_dup=False)
        init_segmented(
            spark,
            build_tables(
                spark, ranked.filter(F.col("_rk") <= half).drop("_rk"),
                **kwargs,
            ),
            d,
            store_content=True,
        )
        append_segment(
            spark, d, ranked.filter(F.col("_rk") > half).drop("_rk"),
            store_content=True,
            **kwargs,
        )
        ranked.unpersist()
    return d


def _index_stats_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """index_stats over the 2-generation flat segmented index, reduced
    to the TOTAL serving row (+ the generation count).  The oracle
    recomputes every column from the raw documents table with the flat
    chain fragments — n_stored/n_live = sha-dedup survivors, token_sum
    = Σ distinct-term doc lengths, n_terms = distinct terms — proving
    the stored mergeinfo/termdict metadata agrees with the data."""
    from searchengine_spark.index.segments import index_stats

    d = _segmented_flat_dir(spark, sf_dir)
    st = index_stats(spark, d)
    nseg = st.filter(F.col("segment") != "TOTAL").count()
    return st.filter(F.col("segment") == "TOTAL").select(
        F.lit(nseg).cast("long").alias("n_segments"),
        "n_total",
        "n_stored",
        "n_tombstoned",
        "n_live",
        "token_sum",
        "avgdl",
        "n_terms",
    )


def _stored_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stored-fields sidecar (index/stored.py) in the driver contract:
    read the 2-generation flat segmented index's ``stored/`` sidecars
    back through Spark, mask liveness by the serving docs view (the
    same rule every query surface uses), and sha256 the content.  The
    oracle recomputes the live set (lexical ids → empty filter → sha
    dedup) from the raw documents table — equality proves the sidecar
    holds exactly the survivors' bytes, byte-for-byte, across the
    cross-segment dedup."""
    import os
    from functools import reduce

    from searchengine_spark.index.segments import _read_meta, load_segments
    from searchengine_spark.index.stored import STORED_DIR

    d = _segmented_flat_dir(spark, sf_dir)
    stored = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(os.path.join(d, s, STORED_DIR))
            for s in _read_meta(d)["segments"]
        ],
    )
    docs = load_segments(spark, d).docs
    return stored.join(docs.select("docid"), "docid", "left_semi").select(
        "docid", F.sha2("content", 256).alias("content_sha")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _run_engine(spark, SF0001, FLAGSHIP_QUERIES, k=10)


def _events_windowed(spark, sf):
    """Batch twin of the watermarked streaming window aggregation
    (streaming/windows.py) — epoch-aligned 1-hour tumbling windows over
    the events table; TIMESTAMP_NTZ end to end, so the formatted
    window_start is timezone-independent and DuckDB's
    date_trunc('hour') is the exact oracle."""
    from searchengine_spark.streaming.windows import events_windowed

    return events_windowed(spark, sf)


def _user_sessions(spark, sf):
    """Sessionization via F.session_window (streaming/windows.py);
    oracled by the gaps-and-islands SQL rewrite."""
    from searchengine_spark.streaming.windows import user_sessions

    return user_sessions(spark, sf)


def _event_bursts(spark, sf):
    """Per-type hourly z-score burst detection (streaming/windows.py);
    exact-integer moment sums make the doubles bit-identical across
    engines before the 6dp round."""
    from searchengine_spark.streaming.windows import event_bursts

    return event_bursts(spark, sf)


def _warc_roundtrip(spark, sf):
    """WARC source-adapter roundtrip (corpus/warc.py): the documents
    table is serialized into deterministic .warc chunks once (cached
    by the sf fingerprint, completeness marker last), then parsed back
    through the DISTRIBUTED adapter (binaryFile → mapInPandas,
    shuffle-free).  The oracle recomputes (url, byte length, md5) from
    the documents table directly — equality proves the adapter
    preserves every record byte-exactly through serialize + parse."""
    import os

    from searchengine_spark.corpus.warc import read_warc, write_warc_dir

    d = _index_cache_dir(sf, "warc")
    marker = os.path.join(d, "_complete")
    if not os.path.exists(marker):
        rows = [
            (f"http://{r['source']}/doc/{r['doc_id']}",
             r["text"].encode("utf-8"))
            for r in spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "source", "text")
            .collect()
        ]
        write_warc_dir(rows, d, n_files=4)
        with open(marker, "w"):
            pass
    recs = read_warc(spark, os.path.join(d, "*.warc"))
    return recs.select(
        F.regexp_extract("url", r"/doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "url",
        "n_bytes",
        F.md5("payload").alias("content_md5"),
    ).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from searchengine_spark.ops import textops as T
    from searchengine_spark.ops import vectors as V
    from searchengine_spark.ops import dedup as D
    from searchengine_spark.ops import multimodal as M
    from searchengine_spark.ops import prep as P
    from searchengine_spark.ops import mix as X
    from searchengine_spark.ops import search as S
    from searchengine_spark.ops import passages as PSG
    from searchengine_spark.ops import scrub as SC

    def _docs(spark, sf):
        return spark.read.parquet(f"{sf}/documents.parquet")

    return {
        "dedup_minhash": lambda spark, sf: D.minhash_pairs(_docs(spark, sf)),
        "topk_overlap_pairs": lambda spark, sf: D.topk_overlap_pairs(
            _docs(spark, sf)
        ),
        "ngram_jaccard": lambda spark, sf: D.jaccard_pairs(
            _docs(spark, sf), threshold=0.5
        ),
        "dupgraph_triangles": lambda spark, sf: D.dupgraph_triangles(
            _docs(spark, sf), threshold=0.5
        ),
        "embedding_neardup": V.embedding_neardup,
        "embedding_neardup_lsh": V.embedding_neardup_lsh,
        "ann_ivf_topk": V.ann_ivf_topk,
        "ann_filtered_topk": V.ann_filtered_topk,
        "ann_recall": V.ann_recall,
        "ann_recall_curve": V.ann_recall_curve,
        "ann_ivf_kmeans_topk": V.ann_ivf_kmeans_topk,
        "ivf_stats": V.ivf_stats,
        "pq_codes": V.pq_codes,
        "ann_ivf_pq_topk": V.ann_ivf_pq_topk,
        "ann_ivf_pq_rerank_topk": V.ann_ivf_pq_rerank_topk,
        "ann_ivf_pq_trained_topk": V.ann_ivf_pq_trained_topk,
        "lang_id": T.lang_id,
        "token_counts": T.token_counts,
        "media_stats": M.media_stats,
        "media_features": M.media_features,
        "media_frames": M.media_frames,
        "term_tf": T.term_tf,
        "doc_length": T.doc_length,
        "term_dict": T.term_dict,
        "corpus_stats": T.corpus_stats,
        "warc_roundtrip": _warc_roundtrip,
        "dedup_exact": T.dedup_exact,
        "bm25_topk": T.bm25_topk,
        "stemmed_topk": T.stemmed_topk,
        "wand_topk": T.wand_topk,
        "wand_or_topk": T.wand_or_topk,
        "bm25_not_topk": T.bm25_not_topk,
        "lm_dirichlet_topk": T.lm_dirichlet_topk,
        "match_counts": T.match_counts,
        "hashed_tfidf_topk": T.hashed_tfidf_topk,
        "wand_topk_filtered": T.wand_topk_filtered,
        "hybrid_rrf_topk": T.hybrid_rrf_topk,
        "bm25_snippets": T.bm25_snippets,
        "ann_sq8_topk": V.ann_sq8_topk,
        "ann_ivf_persisted_topk": V.ann_ivf_persisted_topk,
        "ann_ivf_append_topk": V.ann_ivf_append_topk,
        "ann_ivf_maint_topk": V.ann_ivf_maint_topk,
        "dup_clusters": lambda spark, sf: D.dup_clusters(
            D.jaccard_pairs(_docs(spark, sf), threshold=0.5)
        ),
        "span_dedup": lambda spark, sf: D.span_dedup(_docs(spark, sf)),
        "winnow_fingerprints": lambda spark, sf: D.winnow_fingerprints(
            _docs(spark, sf)
        ),
        "winnow_matches": lambda spark, sf: D.winnow_matches(
            _docs(spark, sf)
        ),
        "strip_dup_spans": lambda spark, sf: D.strip_dup_spans(
            _docs(spark, sf)
        ),
        "fuzzy_terms": T.fuzzy_terms,
        "phrase_suggest": T.phrase_suggest,
        "tfidf_keywords": T.tfidf_keywords,
        "more_like_this": T.more_like_this,
        "rocchio_topk": T.rocchio_topk,
        "mmr_topk": T.mmr_topk,
        "result_clusters": T.result_clusters,
        "search_eval_ndcg": T.search_eval_ndcg,
        "search_eval_map_mrr": T.search_eval_map_mrr,
        "hard_negatives": T.hard_negatives,
        "ltr_features": T.ltr_features,
        "term_vectors": T.term_vectors,
        "pagerank_dupgraph": lambda spark, sf: D.pagerank_dupgraph(
            _docs(spark, sf)
        ),
        "training_data_prep": P.training_data_prep,
        "decontaminate": X.decontaminate,
        "contamination_report": X.contamination_report,
        "stratified_sample": X.stratified_sample,
        "corpus_mixture": X.corpus_mixture,
        "temperature_mixture": X.temperature_mixture,
        "temperature_sample": X.temperature_sample,
        "unigram_logprob": X.unigram_logprob,
        "corpus_split": X.corpus_split,
        "source_caps": X.source_caps,
        "training_shuffle": X.training_shuffle,
        "pii_counts": SC.pii_counts,
        "pii_scrub": SC.pii_scrub,
        "pii_summary": SC.pii_summary,
        "bigram_logprob": X.bigram_logprob,
        "collocations": X.collocations,
        "kmv_distinct": X.kmv_distinct,
        "cms_heavy_hitters": X.cms_heavy_hitters,
        "weighted_sample": X.weighted_sample,
        "events_windowed": _events_windowed,
        "user_sessions": _user_sessions,
        "event_bursts": _event_bursts,
        "value_histogram": __import__(
            "searchengine_spark.ops.events", fromlist=["value_histogram"]
        ).value_histogram,
        "funnel_conversion": __import__(
            "searchengine_spark.ops.events",
            fromlist=["funnel_conversion"],
        ).funnel_conversion,
        "funnel_latency": __import__(
            "searchengine_spark.ops.events",
            fromlist=["funnel_latency"],
        ).funnel_latency,
        "retention_cohorts": __import__(
            "searchengine_spark.ops.events",
            fromlist=["retention_cohorts"],
        ).retention_cohorts,
        "event_transitions": __import__(
            "searchengine_spark.ops.events",
            fromlist=["event_transitions"],
        ).event_transitions,
        "props_stats": __import__(
            "searchengine_spark.ops.events", fromlist=["props_stats"]
        ).props_stats,
        "asof_attribution": __import__(
            "searchengine_spark.ops.events",
            fromlist=["asof_attribution"],
        ).asof_attribution,
        "burst_pairs": __import__(
            "searchengine_spark.ops.events", fromlist=["burst_pairs"]
        ).burst_pairs,
        # relational OLAP over the TPC-H-shaped tables
        # (ops/relational.py): exact-integer-unit money sums
        "tpch_q1": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q1"]
        ).tpch_q1,
        "tpch_q3": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q3"]
        ).tpch_q3,
        "tpch_q5": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q5"]
        ).tpch_q5,
        "tpch_q14": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q14"]
        ).tpch_q14,
        "tpch_q4": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q4"]
        ).tpch_q4,
        "tpch_q17": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q17"]
        ).tpch_q17,
        "tpch_q6": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q6"]
        ).tpch_q6,
        "tpch_q19": __import__(
            "searchengine_spark.ops.relational", fromlist=["tpch_q19"]
        ).tpch_q19,
        "pricing_rollup": __import__(
            "searchengine_spark.ops.relational",
            fromlist=["pricing_rollup"],
        ).pricing_rollup,
        "bucketed_revenue": __import__(
            "searchengine_spark.ops.relational",
            fromlist=["bucketed_revenue"],
        ).bucketed_revenue,
        "value_percentiles": __import__(
            "searchengine_spark.ops.events",
            fromlist=["value_percentiles"],
        ).value_percentiles,
        "lang_counts": T.lang_counts,
        "phrase_match": T.phrase_match,
        "phrase_match_indexed": T.phrase_match_indexed,
        "proximity_topk": T.proximity_topk,
        "span_near_topk": T.span_near_topk,
        "phrase_slop": T.phrase_slop,
        "corrected_topk": T.corrected_topk,
        "text_quality": T.text_quality,
        "top_terms_per_lang": T.top_terms_per_lang,
        "df_histogram": T.df_histogram,
        "significant_terms": T.significant_terms,
        "kwic": T.kwic,
        "gopher_quality": T.gopher_quality,
        "perplexity_buckets": X.perplexity_buckets,
        "substring_search": T.substring_search,
        "substring_search_persisted": T.substring_search_persisted,
        "regex_search": T.regex_search,
        "regex_search_persisted": T.regex_search_persisted,
        "regex_alt_search": T.regex_alt_search,
        "regex_alt_search_persisted": T.regex_alt_search_persisted,
        "doc_fingerprint": T.doc_fingerprint,
        "repetition_stats": T.repetition_stats,
        "ann_cosine_topk": T.ann_cosine_topk,
        "engine_topk": lambda spark, sf: _run_engine(
            spark, sf, FLAGSHIP_QUERIES, k=10
        ),
        "engine_topk_ondisk": lambda spark, sf: _run_engine_ondisk(
            spark, sf, FLAGSHIP_QUERIES, k=10
        ),
        "engine_topk_flat": lambda spark, sf: _run_engine_flat(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        "engine_topk_ondisk_flat": lambda spark, sf: _run_engine_ondisk_flat(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        "segments_topk_flat": lambda spark, sf: _run_engine_segments_flat(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        "index_stats_flat": _index_stats_flat,
        "stored_fields": _stored_fields,
        "engine_topk_flat_bm25f": lambda spark, sf: _run_engine_flat_bm25f(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        "engine_topk_ondisk_bm25f": lambda spark, sf: (
            _run_engine_ondisk_bm25f(spark, sf, ENGINE_FLAT_QUERIES, k=10)
        ),
        "engine_topk_stem": lambda spark, sf: _run_engine_stem(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        "engine_topk_ondisk_stem": lambda spark, sf: _run_engine_ondisk_stem(
            spark, sf, ENGINE_FLAT_QUERIES, k=10
        ),
        # query-surface family (ops/search.py): prefix expansion,
        # facets, diversification, synonym groups, the mini query
        # language, and PMI related-terms — all pinned-constant ops
        # whose oracles are built from the same constants
        "prefix_topk": S.prefix_topk,
        "facet_counts": S.facet_counts,
        "relaxed_topk": S.relaxed_topk,
        "msm_topk": S.msm_topk,
        "diversified_topk": S.diversified_topk,
        "synonym_topk": S.synonym_topk,
        "query_topk": S.query_topk,
        "query_source_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_SOURCE
        ),
        "query_or_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_OR
        ),
        "query_boost_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_BOOST
        ),
        "query_or_filter_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_OR_FILTER
        ),
        "query_or_not_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_OR_NOT
        ),
        "query_or_boost_topk": lambda spark, sf: S.query_topk(
            spark, sf, q=S.QL_QUERY_OR_BOOST
        ),
        "related_terms": S.related_terms,
        "suffix_topk": S.suffix_topk,
        "search_after_topk": S.search_after_topk,
        "explain_score": S.explain_score,
        "percolate": S.percolate,
        "percolate_rich": S.percolate_rich,
        "percolate_or": S.percolate_or,
        # passage/chunk family (ops/passages.py): RAG chunking,
        # passage-level BM25, positions-based best-window snippets —
        # pinned-constant ops with same-constant oracle builders
        "chunk_docs": PSG.chunk_docs,
        "passage_topk": PSG.passage_topk,
        "window_snippets": PSG.window_snippets,
        "highlight_topk": PSG.highlight_topk,
        "dup_chunks": PSG.dup_chunks,
        "pack_sequences": P.pack_sequences,
        "bpe_train": __import__(
            "searchengine_spark.ops.bpe", fromlist=["bpe_train"]
        ).bpe_train,
        "bpe_encode": __import__(
            "searchengine_spark.ops.bpe", fromlist=["bpe_encode"]
        ).bpe_encode,
        "bpe_fertility": __import__(
            "searchengine_spark.ops.bpe", fromlist=["bpe_fertility"]
        ).bpe_fertility,
    }


_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
    "FROM documents"
)

# distinct 3-token shingles per doc (dedup.py determinism contract)
_SHINGLES = """
    toks AS (SELECT doc_id,
                    regexp_extract_all(lower(text), '[a-z0-9]+') AS t
             FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 2)) AS i
      ) g
      WHERE len(t) >= 3
    )
"""

_COS = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)

# product-quantization CTEs (ops/vectors.py PQ_M=8 subspaces of 8 dims,
# PQ_CODES=16, PQ_STRIDE=29, PQ_ROUND=6 — change Spark and SQL
# together): codebook from fixed-stride rows, per-subspace argmin of
# the 6dp-rounded squared L2 (tie → lowest code).  Shared by the
# pq_codes / ann_ivf_pq_topk / ann_ivf_pq_rerank_topk oracles.
_PQ_CTES = """
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ms AS (SELECT unnest(range(8)) AS m),
    cb AS (
      SELECT (vec_id // 29)::INT AS c, ms.m,
             v[ms.m*8+1 : ms.m*8+8] AS cv
      FROM emb CROSS JOIN ms
      WHERE vec_id % 29 = 0 AND vec_id < 16 * 29
    ),
    subs AS (
      SELECT e.vec_id, ms.m, e.v[ms.m*8+1 : ms.m*8+8] AS xv
      FROM emb e CROSS JOIN ms
    ),
    coded AS (
      SELECT vec_id, m, c FROM (
        SELECT s.vec_id, s.m, b.c,
               row_number() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY round(
                   list_dot_product(s.xv, s.xv)
                   - 2 * list_dot_product(s.xv, b.cv)
                   + list_dot_product(b.cv, b.cv), 6) ASC,
                 b.c ASC) AS rn
        FROM subs s JOIN cb b USING (m)
      ) WHERE rn = 1
    )
"""

# ADC scoring over the stride-IVF probes (the cent/scored/assigned/
# probes CTEs mirror ann_ivf_topk's; q = the query vector, vec_id 0)
_PQ_ADC = f"""
    q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
    lut AS (
      SELECT b.m, b.c,
             list_dot_product(q.qv[b.m*8+1 : b.m*8+8], b.cv) AS dq,
             list_dot_product(b.cv, b.cv) AS cc
      FROM cb b CROSS JOIN q
    ),
    cent AS (SELECT vec_id AS cid, v AS cv FROM emb
             WHERE vec_id % 50 = 0),
    scored AS (
      SELECT e.vec_id, c.cid,
             {_COS.format(a="e.v", b="c.cv")} AS ccos
      FROM emb e CROSS JOIN cent c
    ),
    assigned AS (
      SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        FROM scored) WHERE rn = 1
    ),
    probes AS (
      SELECT cid FROM cent CROSS JOIN q
      ORDER BY {_COS.format(a="qv", b="cv")} DESC, cid
      LIMIT 3
    ),
    adc AS (
      SELECT cd.vec_id,
             round(sum(l.dq) / (
               sqrt((SELECT list_dot_product(qv, qv) FROM q))
               * sqrt(sum(l.cc))), 5) AS pq_score
      FROM coded cd
      JOIN lut l ON l.m = cd.m AND l.c = cd.c
      JOIN assigned a ON a.vec_id = cd.vec_id
      JOIN probes p ON p.cid = a.cid
      WHERE cd.vec_id != 0
      GROUP BY cd.vec_id
    )
"""

# jaccard pair graph over `sh` (_SHINGLES): shared by the dup_clusters
# and pagerank_dupgraph oracles so the threshold/edge definition can
# only change in ONE place (ops/dedup.jaccard_pairs is the Spark twin;
# ngram_jaccard's oracle keeps its own copy because the jaccard VALUE
# is its output, not just the >= threshold cut)
_PAIRS_EDGES = """
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
      FROM sh x JOIN sh y
        ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
    ),
    pairs AS (
      SELECT a, b FROM inter
      JOIN sizes sa ON sa.doc_id = a
      JOIN sizes sb ON sb.doc_id = b
      WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5
    ),
    edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    )
"""


def _neardup_lsh_oracle_sql() -> str:
    """DuckDB mirror of ops.vectors.embedding_neardup_lsh: identical
    Rademacher hyperplane literals (shared generator), identical band
    keys, identical exact-cosine filter."""
    from searchengine_spark.ops.vectors import (
        EMB_DIM,
        LSH_BANDS,
        LSH_BITS,
        hyperplanes,
    )

    planes = hyperplanes(LSH_BANDS * LSH_BITS, EMB_DIM)

    def plane_lit(p):
        return "[" + ", ".join(str(x) for x in p) + "]"

    band_rows = []
    for bd in range(LSH_BANDS):
        bits = " + ".join(
            f"(CASE WHEN list_dot_product(v, {plane_lit(planes[bd * LSH_BITS + t])}) > 0 "
            f"THEN {1 << t} ELSE 0 END)"
            for t in range(LSH_BITS)
        )
        band_rows.append(f"({bd}, {bits})")
    bands_values = ",\n            ".join(band_rows)
    return f"""
        WITH emb AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        bands AS (
          SELECT vec_id, v, bk.band, bk.key
          FROM emb, LATERAL (VALUES
            {bands_values}
          ) bk(band, key)
        ),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id
        )
        SELECT a, b, cosine FROM (
          SELECT c.a, c.b,
                 round({_COS.format(a="ea.v", b="eb.v")}, 5) AS cosine
          FROM cand c
          JOIN emb ea ON ea.vec_id = c.a
          JOIN emb eb ON eb.vec_id = c.b
        ) WHERE cosine >= 0.4
    """


def _ivf_kmeans_oracle_sql(train_pred: str = "TRUE",
                           serve_pred: str = "TRUE") -> str:
    """DuckDB mirror of ops.vectors.ann_ivf_kmeans_topk: the k-means
    iterations are unrolled into chained CTEs (stride init, max-cosine
    assignment with lowest-cid tie-break, per-dimension mean rounded to
    KMEANS_ROUND — the same cross-engine determinism contract the Spark
    trainer implements), then the standard IVF probe/scan.

    ``train_pred`` restricts the TRAINING set (init + iteration
    assignments); the final assignment pass always covers all vectors —
    the append-path oracle (ann_ivf_append_topk) trains on the even
    vec_ids and assigns everything, exactly what build-on-evens +
    append-odds computes.  ``serve_pred`` restricts SERVING eligibility
    (the maintenance oracle excludes tombstoned ids — deletion and
    compaction must change storage, never surviving answers)."""
    from searchengine_spark.ops.vectors import (
        CENTROID_STRIDE,
        KMEANS_ITERS,
        KMEANS_ROUND,
        NPROBE,
    )

    cos = _COS
    parts = [f"""
        emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        trainemb AS (SELECT * FROM emb WHERE {train_pred}),
        cent0 AS (
          SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cid,
                 v AS cv
          FROM trainemb WHERE vec_id % {CENTROID_STRIDE} = 0
        )"""]
    for i in range(1, KMEANS_ITERS + 1):
        prev = f"cent{i - 1}"
        parts.append(f"""
        asg{i} AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {cos.format(a="e.v", b="c.cv")} DESC, c.cid
                   ) AS rn
            FROM trainemb e CROSS JOIN {prev} c) WHERE rn = 1
        ),
        m{i} AS (
          SELECT cid, pos, round(avg(v[pos]), {KMEANS_ROUND}) AS m
          FROM asg{i}, LATERAL (
            SELECT unnest(generate_series(1, len(v))) AS pos) g
          GROUP BY cid, pos
        ),
        u{i} AS (SELECT cid, list(m ORDER BY pos) AS cv
                 FROM m{i} GROUP BY cid),
        cent{i} AS (
          SELECT p.cid, coalesce(u.cv, p.cv) AS cv
          FROM {prev} p LEFT JOIN u{i} u ON p.cid = u.cid
        )""")
    last = f"cent{KMEANS_ITERS}"
    parts.append(f"""
        asgf AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY {cos.format(a="e.v", b="c.cv")} DESC, c.cid
                   ) AS rn
            FROM emb e CROSS JOIN {last} c) WHERE rn = 1
        ),
        q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        probes AS (
          SELECT cid FROM {last} CROSS JOIN q
          ORDER BY {cos.format(a="qv", b="cv")} DESC, cid
          LIMIT {NPROBE}
        )""")
    body = ",".join(parts)
    return f"""
        WITH {body}
        SELECT a.vec_id,
               round({cos.format(a="a.v", b="q.qv")}, 5) AS cosine
        FROM asgf a JOIN probes USING (cid) CROSS JOIN q
        WHERE a.vec_id != 0 AND ({serve_pred.replace("vec_id", "a.vec_id")})
        ORDER BY cosine DESC, a.vec_id LIMIT 10
    """


def _ivf_stats_oracle_sql() -> str:
    """DuckDB mirror of ops.vectors.ivf_stats: the SAME unrolled
    k-means training + final assignment CTEs as the kmeans oracle
    (everything up to and including asgf — probes/q unused), then one
    per-cell count with the exact-integer round-6 fraction."""
    base = _ivf_kmeans_oracle_sql()
    # reuse the kmeans oracle's CTE body verbatim: take everything up
    # to the final SELECT (the CTEs are a prefix of the text by
    # construction) — guarantees the two oracles cannot drift
    cte_end = base.rindex("SELECT a.vec_id")
    ctes = base[:cte_end]
    return f"""{ctes}
        SELECT cid::BIGINT AS cid, count(*)::BIGINT AS n_vecs,
               round(count(*)::DOUBLE /
                     (SELECT count(*) FROM emb)::DOUBLE, 6) AS frac
        FROM asgf GROUP BY cid ORDER BY cid
    """


def _pq_trained_oracle_sql() -> str:
    """DuckDB mirror of ops.vectors.ann_ivf_pq_trained_topk: the
    per-subspace k-means iterations are unrolled into chained CTEs
    (stride-codebook init; assignment by the encoder's rounded
    squared-L2 rule, tie → lowest code; per-(m, c, pos) means rounded
    to KMEANS_ROUND; empty codes keep their previous entry), then the
    standard encode → ADC-shortlist → exact round-5 rerank over the
    stride-IVF probes."""
    from searchengine_spark.ops.vectors import (
        CENTROID_STRIDE,
        KMEANS_ROUND,
        NPROBE,
        PQ_CODES,
        PQ_KMEANS_ITERS,
        PQ_M,
        PQ_RERANK,
        PQ_ROUND,
        PQ_STRIDE,
        PQ_SUB,
    )

    dist = (f"round(list_dot_product(s.xv, s.xv)"
            f" - 2 * list_dot_product(s.xv, b.cv)"
            f" + list_dot_product(b.cv, b.cv), {PQ_ROUND})")
    parts = [f"""
        emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        ms AS (SELECT unnest(range({PQ_M})) AS m),
        cb0 AS (
          SELECT (vec_id // {PQ_STRIDE})::INT AS c, ms.m,
                 v[ms.m*{PQ_SUB}+1 : ms.m*{PQ_SUB}+{PQ_SUB}] AS cv
          FROM emb CROSS JOIN ms
          WHERE vec_id % {PQ_STRIDE} = 0
            AND vec_id < {PQ_CODES} * {PQ_STRIDE}
        ),
        subs AS (
          SELECT e.vec_id, ms.m,
                 e.v[ms.m*{PQ_SUB}+1 : ms.m*{PQ_SUB}+{PQ_SUB}] AS xv
          FROM emb e CROSS JOIN ms
        )"""]
    for i in range(1, PQ_KMEANS_ITERS + 1):
        prev = f"cb{i - 1}"
        parts.append(f"""
        pasg{i} AS (
          SELECT vec_id, m, xv, c FROM (
            SELECT s.vec_id, s.m, s.xv, b.c,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.m
                     ORDER BY {dist} ASC, b.c ASC) AS rn
            FROM subs s JOIN {prev} b USING (m)) WHERE rn = 1
        ),
        pm{i} AS (
          SELECT m, c, pos,
                 round(avg(xv[pos]), {KMEANS_ROUND}) AS mn
          FROM pasg{i}, LATERAL (
            SELECT unnest(generate_series(1, len(xv))) AS pos) g
          GROUP BY m, c, pos
        ),
        pu{i} AS (SELECT m, c, list(mn ORDER BY pos) AS cv
                  FROM pm{i} GROUP BY m, c),
        cb{i} AS (
          SELECT p.m, p.c, coalesce(u.cv, p.cv) AS cv
          FROM {prev} p LEFT JOIN pu{i} u
            ON u.m = p.m AND u.c = p.c
        )""")
    last = f"cb{PQ_KMEANS_ITERS}"
    parts.append(f"""
        coded AS (
          SELECT vec_id, m, c FROM (
            SELECT s.vec_id, s.m, b.c,
                   row_number() OVER (
                     PARTITION BY s.vec_id, s.m
                     ORDER BY {dist} ASC, b.c ASC) AS rn
            FROM subs s JOIN {last} b USING (m)) WHERE rn = 1
        ),
        q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        lut AS (
          SELECT b.m, b.c,
                 list_dot_product(
                   q.qv[b.m*{PQ_SUB}+1 : b.m*{PQ_SUB}+{PQ_SUB}], b.cv
                 ) AS dq,
                 list_dot_product(b.cv, b.cv) AS cc
          FROM {last} b CROSS JOIN q
        ),
        cent AS (SELECT vec_id AS cid, v AS cv FROM emb
                 WHERE vec_id % {CENTROID_STRIDE} = 0),
        scored AS (
          SELECT e.vec_id, c.cid,
                 {_COS.format(a="e.v", b="c.cv")} AS ccos
          FROM emb e CROSS JOIN cent c
        ),
        assigned AS (
          SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
            FROM scored) WHERE rn = 1
        ),
        probes AS (
          SELECT cid FROM cent CROSS JOIN q
          ORDER BY {_COS.format(a="qv", b="cv")} DESC, cid
          LIMIT {NPROBE}
        ),
        adc AS (
          SELECT cd.vec_id,
                 round(sum(l.dq) / (
                   sqrt((SELECT list_dot_product(qv, qv) FROM q))
                   * sqrt(sum(l.cc))), 5) AS pq_score
          FROM coded cd
          JOIN lut l ON l.m = cd.m AND l.c = cd.c
          JOIN assigned a ON a.vec_id = cd.vec_id
          JOIN probes p ON p.cid = a.cid
          WHERE cd.vec_id != 0
          GROUP BY cd.vec_id
        ),
        short AS (
          SELECT vec_id FROM adc
          ORDER BY pq_score DESC, vec_id LIMIT {PQ_RERANK}
        )""")
    body = ",".join(parts)
    return f"""
        WITH {body}
        SELECT s.vec_id,
               round({_COS.format(a="e.v", b="q.qv")}, 5) AS cosine
        FROM short s JOIN emb e USING (vec_id) CROSS JOIN q
        ORDER BY cosine DESC, s.vec_id LIMIT 10
    """


def _engine_flat_oracle_sql(importance: bool = False,
                            stem: bool = False,
                            full: bool = False,
                            with_url: bool = False):
    """ANSI-SQL mirror of the ENTIRE flat engine: corpus mapping → lexical
    docid rank → empty filter → sha256 dedup → unstemmed analyze → stats →
    query prune (abort + stopword-heap readmission, lib/queryproc.py:195-233)
    → BM25 (north rule) → query cosine → per-qid L2 norms → blend → top-k.

    Float literals are interpolated with repr() so DuckDB parses the exact
    same IEEE doubles the Spark engine uses; scores are rounded to 6
    decimals on both sides (sum-order ulp noise).

    ``importance=True`` mirrors the BM25F field-weight variant: per
    (doc, term) priorities — path tokens = 1, def-line tokens = 2,
    sig-line tokens = 5, min wins (text/importance.py semantics in SQL)
    — multiply each hit's BM25 through params.IMPORTANCE, feeding both
    the accumulation and the doc-vector cosine like the reference's
    doc_tfidfs (lib/queryproc.py:74).

    ``stem=True`` mirrors the STEMMED engine (the flagship analyze
    chain): corpus AND query tokens pass through a (term, stem) VALUES
    map computed by the in-repo porter_stem over the test corpora's
    vocabulary plus the pinned query tokens (the stemmed_topk oracle
    technique — DuckDB has no Porter; the SQL proves the pipeline
    around the stemmer).  Stopword/prune checks run on the STEMMED
    term exactly like prune_query_terms does (frequencies come from
    analyze(stem=True)).  Returns None when the test corpora are
    absent (entry stays rows-only).

    ``full=True`` mirrors the FLAGSHIP engine itself (implies stem):
    hash-order docids (interpolated unsigned xxh64 of the corpus key —
    the in-repo implementation is parity-tested against F.xxhash64),
    64-bit simhash near-dup with the banded local-min rule computed as
    integer arithmetic from interpolated per-term CRC-64 sign weights,
    FLAGSHIP_QUERIES, and the empty-edge-graph quality constants
    (pr = 1 - damping for every doc, hub = auth = 0 — verified
    preconditions, _testdata_full_maps).  ``with_url`` appends the url
    column (engine_topk's shape).  Returns None when any full-mode
    precondition fails.
    """
    assert not (importance and (stem or full)), \
        "variants are exercised separately"
    if full:
        stem = True
    from searchengine_spark.params import (
        AUTH_FACTOR,
        BM25_B,
        BM25_K1,
        COSINE_FACTOR,
        COSINE_GATE,
        HUB_FACTOR,
        NET_RELEVANCE_FACTOR,
        PR_FACTOR,
        PRUNE_ABORT_RATIO,
        QUALITY_FACTOR,
        STOPWORD_SIGNIFICANCE,
        TFIDF_FACTOR,
    )
    from searchengine_spark.text.stopwords import STOPWORDS

    sw = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(STOPWORDS)
    )
    queryset = FLAGSHIP_QUERIES if full else ENGINE_FLAT_QUERIES
    qvals = ", ".join(
        f"({qid}, '{text}')" for qid, text in queryset
    )
    k1, b = repr(BM25_K1), repr(BM25_B)
    k1p1, one_minus_b = repr(BM25_K1 + 1), repr(1 - BM25_B)

    imp_ctes = ""
    imp_mult = ""
    if importance:
        from searchengine_spark.params import IMPORTANCE
        from searchengine_spark.text.importance import (
            DEF_PRIORITY,
            PATH_PRIORITY,
            SIG_PRIORITY,
        )

        defpat = (
            r"(?i)^\s*(def|class|function|struct|interface|public"
            r"|protected|private)\b"
        )
        sigpat = r"(?i)^\s*(static|void|const|export|module)\b"
        mult_case = "CASE coalesce(i.pr, 0) " + " ".join(
            f"WHEN {p} THEN {repr(float(m))}"
            for p, m in enumerate(IMPORTANCE)
        ) + f" ELSE {repr(float(IMPORTANCE[0]))} END"
        from searchengine_spark.text.importance import TITLE_TOKENS

        imp_ctes = f"""
        imp_src AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(path), '[a-z0-9]+')) AS term,
                 {PATH_PRIORITY} AS pr
          FROM alive
          UNION ALL
          SELECT docid,
                 unnest(regexp_extract_all(
                   lower(content), '[a-z0-9]+')[1:{TITLE_TOKENS}]) AS term,
                 {PATH_PRIORITY} AS pr
          FROM alive
          UNION ALL
          SELECT docid,
                 unnest(regexp_extract_all(lower(line), '[a-z0-9]+')) AS term,
                 CASE WHEN regexp_matches(line, '{defpat}')
                      THEN {DEF_PRIORITY} ELSE {SIG_PRIORITY} END AS pr
          FROM (
            SELECT docid, unnest(string_split(content, chr(10))) AS line
            FROM alive
          )
          WHERE regexp_matches(line, '{defpat}')
             OR regexp_matches(line, '{sigpat}')
        ),
        imp AS (
          SELECT docid, term, min(pr) AS pr
          FROM imp_src GROUP BY docid, term
        ),"""
        imp_mult = f" * ({mult_case})"
    imp_join = (
        " LEFT JOIN imp i ON i.docid = t.docid AND i.term = t.term"
        if importance
        else ""
    )
    smap_cte = ""
    toks_cte = """toks AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
          FROM alive
        ),"""
    qtok_cte = """qtok AS (
          SELECT qid,
                 unnest(regexp_extract_all(lower(qtext), '[a-z0-9]+')) AS term
          FROM qraw
        ),"""
    if stem:
        import re as _re

        qtoks = set()
        for _qid, text in queryset:
            qtoks.update(_re.findall(r"[a-z0-9]+", text.lower()))
        pairs = _testdata_stem_pairs(qtoks)
        if pairs is None:
            return None
        mapvals = ", ".join(f"('{t}', '{s}')" for t, s in pairs)
        smap_cte = (
            f"smap AS (SELECT * FROM (VALUES {mapvals})"
            " AS v(term, stem)),\n        "
        )
        toks_cte = """rawtoks AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
          FROM alive
        ),
        toks AS (
          SELECT r.docid, s.stem AS term
          FROM rawtoks r JOIN smap s USING (term)
        ),"""
        qtok_cte = """qtok0 AS (
          SELECT qid,
                 unnest(regexp_extract_all(lower(qtext), '[a-z0-9]+')) AS term
          FROM qraw
        ),
        qtok AS (
          SELECT q.qid, s.stem AS term
          FROM qtok0 q JOIN smap s USING (term)
        ),"""

    corpus_cols = """source AS repo,
                 'doc/' || doc_id::VARCHAR AS path,
                 substr(sha256(source || '|' || doc_id::VARCHAR), 1, 40) AS cmt,
                 text AS content"""
    ids_cte = """ids AS (
          SELECT row_number() OVER (ORDER BY repo, path, cmt) AS docid,
                 path, content
          FROM corpus
        ),"""
    alive_cols = "docid, path, content"
    dedup_ctes = ""
    docs_src = "alive"
    norms_last = "sqrt(count(*)::DOUBLE) AS one_norm"
    qual_sql = f"""{repr(PR_FACTOR)} * (CASE WHEN n.one_norm > 0
                        THEN 1.0 / n.one_norm ELSE 0.0 END)
                   + {repr(HUB_FACTOR)} * (CASE WHEN n.one_norm > 0
                        THEN 1.0 / n.one_norm ELSE 0.0 END)
                   + {repr(AUTH_FACTOR)} * (CASE WHEN n.one_norm > 0
                        THEN 1.0 / n.one_norm ELSE 0.0 END)"""
    url_col = ""
    url_join = ""
    if full:
        from searchengine_spark.params import (
            PR_DAMPING,
            SIMHASH_HAMMING,
        )

        maps = _testdata_full_maps()
        if maps is None:
            return None
        hrows, crc_rows = maps
        hvals = ", ".join(f"({d}, '{r}', {u})" for d, r, u in hrows)
        chvals = ", ".join(
            f"('{t}', {bp}, {pm})" for t, bp, pm in crc_rows
        )
        prc = repr(1.0 - PR_DAMPING)
        corpus_cols = "doc_id,\n                 " + corpus_cols
        ids_cte = f"""hmap AS (SELECT * FROM (VALUES {hvals})
                      AS v(doc_id, repo, u)),
        ids AS (
          SELECT row_number() OVER (
                   ORDER BY h.u, c.repo, c.path, c.cmt) AS docid,
                 c.repo, c.path, c.cmt, c.content
          FROM corpus c JOIN hmap h USING (doc_id, repo)
        ),"""
        alive_cols = "docid, repo, path, cmt, content"
        dedup_ctes = f"""
        chbits AS (SELECT * FROM (VALUES {chvals}) AS v(term, bp, pm)),
        duptoks AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
          FROM alive
        ),
        dupbits AS (
          SELECT docid, bp, (sum(tf * pm) > 0) AS bit
          FROM (SELECT docid, term, count(*) AS tf FROM duptoks
                GROUP BY docid, term)
               JOIN chbits USING (term)
          GROUP BY docid, bp
        ),
        dupbands AS (
          SELECT docid, bp // 16 AS band_id,
                 sum(CASE WHEN bit THEN 1 << (15 - (bp % 16))
                          ELSE 0 END) AS band_val
          FROM dupbits GROUP BY docid, bp // 16
        ),
        duppairs AS (
          SELECT DISTINCT a.docid AS da, b.docid AS db
          FROM dupbands a JOIN dupbands b
            ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.docid < b.docid
        ),
        dupham AS (
          SELECT p.da, p.db,
                 sum(CASE WHEN x.bit != y.bit THEN 1 ELSE 0 END) AS d
          FROM duppairs p
               JOIN dupbits x ON x.docid = p.da
               JOIN dupbits y ON y.docid = p.db AND y.bp = x.bp
          GROUP BY p.da, p.db
        ),
        alive2 AS (
          SELECT * FROM alive
          WHERE docid NOT IN (SELECT db FROM dupham
                              WHERE d <= {SIMHASH_HAMMING})
        ),"""
        docs_src = "alive2"
        toks_cte = """rawtoks AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(content), '[a-z0-9]+')) AS term
          FROM alive2
        ),
        toks AS (
          SELECT r.docid, s.stem AS term
          FROM rawtoks r JOIN smap s USING (term)
        ),"""
        norms_last = f"sqrt(sum({prc} * {prc})) AS pr_norm"
        # hub = auth = 0.0 on the empty edge graph: their _safe terms
        # are exactly 0.0 (0-norm guard), so only the PR term remains
        qual_sql = f"""{repr(PR_FACTOR)} * (CASE WHEN n.pr_norm > 0
                        THEN {prc} / n.pr_norm ELSE 0.0 END)"""
        if with_url:
            url_col = "u.url, "
            url_join = (
                " JOIN (SELECT docid, repo || '/' || path || '@' || cmt"
                " AS url FROM alive2) u USING (docid)"
            )
    return f"""
        WITH corpus AS (
          SELECT {corpus_cols}
          FROM documents
        ),
        {ids_cte}
        nonempty AS (
          SELECT * FROM ids
          WHERE length(regexp_replace(content, '\\s', '', 'g')) > 0
        ),
        alive AS (
          SELECT {alive_cols} FROM (
            SELECT *, row_number() OVER (
              PARTITION BY sha256(content) ORDER BY docid) AS rk
            FROM nonempty) WHERE rk = 1
        ),{dedup_ctes}{imp_ctes}
        {smap_cte}{toks_cte}
        tf AS (SELECT docid, term, count(*) AS tf FROM toks GROUP BY docid, term),
        dl AS (SELECT docid, count(*) AS total_tokens FROM tf GROUP BY docid),
        docs AS (
          SELECT a.docid, coalesce(dl.total_tokens, 0) AS total_tokens
          FROM {docs_src} a LEFT JOIN dl USING (docid)
        ),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM docs),
        termdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qraw AS (SELECT * FROM (VALUES {qvals}) v(qid, qtext)),
        {qtok_cte}
        qfreq AS (SELECT qid, term, count(*) AS qtf FROM qtok GROUP BY qid, term),
        qdf AS (
          SELECT q.qid, q.term, q.qtf, coalesce(t.df, 0) AS df,
                 q.term IN ({sw}) AS is_stop
          FROM qfreq q LEFT JOIN termdf t USING (term)
        ),
        qstats AS (
          SELECT qid,
                 sum(CASE WHEN df = 0 THEN qtf ELSE 0 END) AS prune_count,
                 sum(CASE WHEN df > 0 THEN qtf ELSE 0 END) AS valid_count,
                 sum(CASE WHEN df > 0 THEN 1 ELSE 0 END) AS n_valid_uniq,
                 sum(CASE WHEN df > 0 AND is_stop THEN 1 ELSE 0 END) AS n_stop
          FROM qdf GROUP BY qid
        ),
        qok AS (
          SELECT qid, n_stop, n_valid_uniq FROM qstats
          WHERE prune_count <= {PRUNE_ABORT_RATIO} * valid_count
        ),
        qterms AS (
          SELECT d.qid, d.term, d.qtf, d.df
          FROM qdf d JOIN qok USING (qid)
          WHERE d.df > 0 AND NOT d.is_stop
          UNION ALL
          SELECT qid, term, qtf, df FROM (
            SELECT d.qid, d.term, d.qtf, d.df, o.n_stop, o.n_valid_uniq,
                   row_number() OVER (PARTITION BY d.qid
                                      ORDER BY d.df, d.qtf, d.term) AS rn
            FROM qdf d JOIN qok o USING (qid)
            WHERE d.df > 0 AND d.is_stop)
          WHERE n_stop > 0
                AND NOT (n_stop < {repr(STOPWORD_SIGNIFICANCE)} * n_valid_uniq)
                AND rn <= floor(log2(n_stop))
        ),
        qplan AS (
          SELECT qid, term, df,
                 qtf::DOUBLE / sum(qtf) OVER (PARTITION BY qid) AS qfrac,
                 count(*) OVER (PARTITION BY qid) AS nterms
          FROM qterms
        ),
        qw AS (
          SELECT q.qid, q.term, q.nterms,
                 ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0) AS idf,
                 q.qfrac * ln((s.n - q.df + 0.5) / (q.df + 0.5) + 1.0)
                   AS qweight
          FROM qplan q CROSS JOIN stats s
        ),
        qmeta AS (
          SELECT qid, max(nterms) AS nterms,
                 sqrt(sum(qweight * qweight)) AS qnorm
          FROM qw GROUP BY qid
        ),
        hits AS (
          SELECT w.qid, t.docid, w.qweight,
                 w.idf * t.tf * {k1p1}
                   / (t.tf + {k1} * ({one_minus_b}
                                     + {b} * d.total_tokens / s.avgdl))
                 {imp_mult} AS bm25
          FROM tf t JOIN qw w USING (term) JOIN docs d USING (docid)
               CROSS JOIN stats s{imp_join}
        ),
        perdoc AS (
          SELECT qid, docid, count(*) AS nmatch,
                 sum(bm25) AS bm25_sum,
                 sum(bm25 * qweight) AS dot,
                 sum(bm25 * bm25) AS dnorm2
          FROM hits GROUP BY qid, docid
        ),
        cand AS (
          SELECT p.qid, p.docid, p.bm25_sum,
                 p.dot / (sqrt(p.dnorm2) * m.qnorm) AS cosine
          FROM perdoc p JOIN qmeta m USING (qid)
          WHERE p.nmatch = m.nterms
        ),
        norms AS (
          SELECT qid,
                 sqrt(sum(bm25_sum * bm25_sum)) AS sum_norm,
                 sqrt(sum(cosine * cosine)) AS cos_norm,
                 {norms_last}
          FROM cand GROUP BY qid
        ),
        scored AS (
          SELECT c.qid, c.docid,
                 {repr(NET_RELEVANCE_FACTOR)} * (CASE WHEN c.cosine > {repr(COSINE_GATE)} THEN
                     {repr(TFIDF_FACTOR)} * (CASE WHEN n.sum_norm > 0
                        THEN c.bm25_sum / n.sum_norm ELSE 0.0 END)
                   + {repr(COSINE_FACTOR)} * (CASE WHEN n.cos_norm > 0
                        THEN c.cosine / n.cos_norm ELSE 0.0 END)
                   ELSE 0.0 END)
                 + {repr(QUALITY_FACTOR)} * (
                     {qual_sql}) AS score
          FROM cand c JOIN norms n USING (qid)
        )
        SELECT qid, rank::INTEGER AS rank, docid, {url_col}round(score, 6) AS score
        FROM (
          SELECT qid, docid, score,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, docid) AS rank
          FROM scored){url_join}
        WHERE rank <= 10
    """


def _pagerank_dupgraph_oracle_sql(n_iter: int = 5) -> str:
    """DuckDB mirror of ops.dedup.pagerank_dupgraph: the jaccard-pair
    CTE (same fragment as ngram_jaccard) builds the undirected dup
    graph, then n_iter UNROLLED PageRank stages — each rK is one
    pagerank_df loop body.  repr() float literals keep the teleport
    constant (1.0 - 0.85 = 0.15000000000000002) bit-identical."""
    from searchengine_spark.params import PR_DAMPING

    d = repr(PR_DAMPING)
    tp = repr(1.0 - PR_DAMPING)
    iters = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        # round(…, 6) per iteration — matches pagerank_df(round_to=6)
        iters.append(f"""
        r{k} AS (
          SELECT u.doc_id,
                 round({tp} + {d} * coalesce(s.c, 0), 6) AS r
          FROM u LEFT JOIN (
            SELECT e.dst AS doc_id, sum(p.r / o.od) AS c
            FROM edges e
            JOIN {prev} p ON p.doc_id = e.src
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst) s USING (doc_id)
        )""")
        prev = f"r{k}"
    return f"""
        WITH {_SHINGLES},
        {_PAIRS_EDGES},
        outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        u AS (SELECT doc_id FROM documents),
        n AS (SELECT count(*)::DOUBLE AS nn FROM u),
        r0 AS (SELECT doc_id, 1.0 / n.nn AS r FROM u CROSS JOIN n),
        {",".join(iters)}
        SELECT doc_id, r AS pr FROM r{n_iter}
    """


def _span_dedup_oracle_sql() -> str:
    """DuckDB mirror of ops.dedup.span_dedup: w-token windows, a window
    duplicated iff its shingle has >= 2 total corpus occurrences; per-doc
    duplicated-window count and covered-token fraction (round 6dp)."""
    from searchengine_spark.ops.dedup import SPAN_W as W

    return f"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                      FROM documents),
        wins AS (
          SELECT doc_id, i AS s, array_to_string(t[i:i+{W - 1}], ' ') AS sh
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {W - 1})) AS i) g
          WHERE len(t) >= {W}
        ),
        dupsh AS (SELECT sh FROM wins GROUP BY sh HAVING count(*) >= 2),
        dupocc AS (SELECT w.doc_id, w.s FROM wins w JOIN dupsh USING (sh)),
        spans AS (SELECT doc_id, count(*)::BIGINT AS dup_spans
                  FROM dupocc GROUP BY doc_id),
        cov AS (SELECT doc_id, count(DISTINCT p)::BIGINT AS dup_tokens
                FROM dupocc, LATERAL (
                  SELECT unnest(generate_series(s, s + {W - 1})) AS p) g
                GROUP BY doc_id)
        SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
               coalesce(s.dup_spans, 0)::BIGINT AS dup_spans,
               CASE WHEN len(t.t) > 0
                    THEN round(coalesce(c.dup_tokens, 0)::DOUBLE / len(t.t), 6)
                    ELSE 0.0 END AS dup_token_frac
        FROM toks t
        LEFT JOIN spans s USING (doc_id)
        LEFT JOIN cov c USING (doc_id)
    """


def _strip_dup_spans_oracle_sql() -> str:
    """DuckDB mirror of ops.dedup.strip_dup_spans: canonical occurrence
    per duplicated shingle = row_number 1 over (doc_id, start); every
    other occurrence removes its w positions; clean_text reassembles
    surviving tokens in order."""
    from searchengine_spark.ops.dedup import SPAN_W as W

    return f"""
        WITH toks AS (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                      FROM documents),
        tokpos AS (
          SELECT doc_id, g.p, t[g.p] AS term
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS p) g
        ),
        wins AS (
          SELECT doc_id, i AS s, array_to_string(t[i:i+{W - 1}], ' ') AS sh
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {W - 1})) AS i) g
          WHERE len(t) >= {W}
        ),
        dupocc AS (
          SELECT doc_id, s,
                 row_number() OVER (
                   PARTITION BY sh ORDER BY doc_id, s) AS rn,
                 count(*) OVER (PARTITION BY sh) AS occ
          FROM wins
        ),
        rem AS (
          SELECT DISTINCT doc_id, p
          FROM dupocc, LATERAL (
            SELECT unnest(generate_series(s, s + {W - 1})) AS p) g
          WHERE occ >= 2 AND rn >= 2
        ),
        kept AS (
          SELECT tp.doc_id, tp.p, tp.term
          FROM tokpos tp ANTI JOIN rem r
            ON tp.doc_id = r.doc_id AND tp.p = r.p
        ),
        agg AS (
          SELECT doc_id, count(*)::BIGINT AS n_kept,
                 string_agg(term, ' ' ORDER BY p) AS clean_text
          FROM kept GROUP BY doc_id
        )
        SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
               (len(t.t) - coalesce(a.n_kept, 0))::BIGINT AS n_removed,
               coalesce(a.clean_text, '') AS clean_text
        FROM toks t LEFT JOIN agg a USING (doc_id)
    """


def _tfidf_keywords_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.tfidf_keywords: tf * ln(N/df)
    rounded to 6dp BEFORE the per-doc rank (rounded-rank contract),
    ties -> term asc."""
    from searchengine_spark.ops.textops import MLT_KEYWORDS

    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        stats AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 round(tf.tf * ln(stats.n::DOUBLE / dft.df), 6) AS tfidf
          FROM tf JOIN dft USING (term) CROSS JOIN stats
        )
        SELECT doc_id, term, tfidf, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY tfidf DESC, term)::BIGINT AS rank
          FROM scored)
        WHERE rank <= {MLT_KEYWORDS}
    """


def _more_like_this_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.more_like_this: the pinned source
    doc's top keywords -> disjunctive BM25 (the wand_or scorer, no
    nmatch gate), source excluded, corpus-global stats."""
    from searchengine_spark.ops.textops import MLT_DOC_ID, MLT_KEYWORDS

    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        dft_all AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf GROUP BY term),
        kscored AS (
          SELECT tf.term,
                 round(tf.tf * ln(stats.n::DOUBLE / dft_all.df), 6)
                   AS tfidf
          FROM tf JOIN dft_all USING (term) CROSS JOIN stats
          WHERE tf.doc_id = {MLT_DOC_ID}
        ),
        kws AS (
          SELECT term FROM (
            SELECT *, row_number() OVER (
              ORDER BY tfidf DESC, term) AS rk FROM kscored)
          WHERE rk <= {MLT_KEYWORDS}
        ),
        scored AS (
          SELECT tf.doc_id,
                 sum( ln((stats.n - dft_all.df + 0.5)
                         / (dft_all.df + 0.5) + 1.0)
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75
                         * dl.total_tokens / stats.avgdl))
                 ) AS s
          FROM tf JOIN kws USING (term) JOIN dft_all USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS score FROM scored
        WHERE doc_id != {MLT_DOC_ID}
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _rocchio_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.rocchio_topk: conjunctive seed
    pass -> top-R feedback docs (rounded score desc, doc_id) ->
    Rocchio centroid weights round(sum(tf * ln(N/df)) / R, 6), seed
    terms excluded, top-E by (w desc, term) -> weighted disjunctive
    BM25 (seed wt 1.0, expansion wt beta), round-6 after the sum."""
    from searchengine_spark.ops.textops import (
        ROCCHIO_BETA,
        ROCCHIO_EXPAND,
        ROCCHIO_FB_DOCS,
        ROCCHIO_TERMS,
    )

    seed_vals = ", ".join(f"('{t}')" for t in ROCCHIO_TERMS)
    seed_list = ", ".join(f"'{t}'" for t in ROCCHIO_TERMS)
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        dft_all AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf GROUP BY term),
        seed AS (SELECT * FROM (VALUES {seed_vals}) AS v(term)),
        base AS (
          SELECT tf.doc_id,
                 round(sum( ln((stats.n - dft_all.df + 0.5)
                               / (dft_all.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score
          FROM tf JOIN seed USING (term) JOIN dft_all USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
          HAVING count(*) = {len(set(ROCCHIO_TERMS))}
        ),
        fb AS (SELECT doc_id FROM base
               ORDER BY score DESC, doc_id LIMIT {ROCCHIO_FB_DOCS}),
        fbn AS (SELECT count(*) AS r FROM fb),
        expw AS (
          SELECT tf.term,
                 round(sum(tf.tf * ln(stats.n::DOUBLE / dft_all.df))
                       / fbn.r, 6) AS w
          FROM tf JOIN fb USING (doc_id) JOIN dft_all USING (term)
               CROSS JOIN stats CROSS JOIN fbn
          WHERE tf.term NOT IN ({seed_list})
          GROUP BY tf.term, fbn.r
        ),
        expn AS (
          SELECT term FROM (
            SELECT *, row_number() OVER (ORDER BY w DESC, term) AS rk
            FROM expw)
          WHERE rk <= {ROCCHIO_EXPAND}
        ),
        qw AS (
          SELECT term, 1.0::DOUBLE AS wt FROM seed
          UNION ALL
          SELECT term, {ROCCHIO_BETA!r}::DOUBLE AS wt FROM expn
        ),
        scored AS (
          SELECT tf.doc_id,
                 sum( qw.wt
                      * ln((stats.n - dft_all.df + 0.5)
                           / (dft_all.df + 0.5) + 1.0)
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75
                         * dl.total_tokens / stats.avgdl))
                 ) AS s
          FROM tf JOIN qw USING (term) JOIN dft_all USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS score FROM scored
        ORDER BY score DESC, doc_id LIMIT 10
    """


def _result_clusters_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.result_clusters: disjunctive BM25
    top-depth -> per-doc top-n tf-idf keywords (rounded-rank) ->
    edges at >= min_shared shared keywords -> EXACT connected
    components via the recursive-reachability CTE (the dup_clusters
    pattern) -> singletons of themselves."""
    from searchengine_spark.ops.textops import (
        MLT_KEYWORDS,
        RC_DEPTH,
        RC_MIN_SHARED,
        RC_TERMS,
    )

    tlist = ", ".join(f"'{t}'" for t in RC_TERMS)
    return f"""
        WITH RECURSIVE toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT unnest([{tlist}]) AS term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 round(sum( ln((stats.n - dft.df + 0.5)
                               / (dft.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        ),
        res AS (SELECT doc_id, score FROM scored
                ORDER BY score DESC, doc_id LIMIT {RC_DEPTH}),
        nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
        dfa AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf GROUP BY term),
        kscored AS (
          SELECT tf.doc_id, tf.term,
                 round(tf.tf * ln(nn.n::DOUBLE / dfa.df), 6) AS tfidf
          FROM tf JOIN dfa USING (term) CROSS JOIN nn
               JOIN res USING (doc_id)
        ),
        kws AS (
          SELECT doc_id, term FROM (
            SELECT *, row_number() OVER (
              PARTITION BY doc_id
              ORDER BY tfidf DESC, term) AS rk
            FROM kscored)
          WHERE rk <= {MLT_KEYWORDS}
        ),
        e0 AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM kws x JOIN kws y
            ON x.term = y.term AND x.doc_id < y.doc_id
          GROUP BY x.doc_id, y.doc_id
          HAVING count(*) >= {RC_MIN_SHARED}
        ),
        edges AS (SELECT a AS src, b AS dst FROM e0
                  UNION SELECT b, a FROM e0),
        reach AS (
          SELECT src AS node, src AS lab FROM edges
          UNION
          SELECT e.dst AS node, r.lab AS lab
          FROM reach r JOIN edges e ON e.src = r.node
        ),
        lab AS (SELECT node AS doc_id, min(lab) AS cluster_id
                FROM reach GROUP BY node),
        clus AS (SELECT doc_id, cluster_id,
                        count(*) OVER (
                          PARTITION BY cluster_id)::BIGINT
                          AS cluster_size
                 FROM lab),
        allc AS (
          SELECT * FROM clus
          UNION ALL
          SELECT r.doc_id, r.doc_id AS cluster_id, 1::BIGINT
          FROM res r ANTI JOIN clus c ON r.doc_id = c.doc_id
        )
        SELECT a.cluster_id, a.doc_id, r.score, a.cluster_size
        FROM allc a JOIN res r USING (doc_id)
        ORDER BY a.cluster_id, a.doc_id
    """


def _mmr_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.mmr_topk: the greedy MMR selection
    unrolled as one CTE stage per pick (the trained-k-means pattern) —
    pool = top-N rounded-5 cosine, sims = pool-vs-pool rounded-5
    cosine, pick i = argmax round(lam*rel - (1-lam)*max sim-to-
    selected, 6) with vec_id tie-break.  lam AND 1-lam interpolate via
    repr (the bigram_logprob exact-double rule)."""
    from searchengine_spark.ops.textops import (
        MMR_K,
        MMR_LAMBDA,
        MMR_POOL,
    )

    lam, oml = repr(MMR_LAMBDA), repr(1.0 - MMR_LAMBDA)
    parts = [
        f"""q AS (SELECT embedding::DOUBLE[] AS qv
                  FROM embeddings WHERE vec_id = 0),
        pool AS (
          SELECT e.vec_id,
                 round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                       / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                e.embedding::DOUBLE[]))
                          * sqrt(list_dot_product(q.qv, q.qv))), 5)
                   AS rel
          FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
          ORDER BY rel DESC, e.vec_id LIMIT {MMR_POOL}),
        pv AS (SELECT p.vec_id, p.rel, e.embedding::DOUBLE[] AS v
               FROM pool p JOIN embeddings e USING (vec_id)),
        sims AS (
          SELECT x.vec_id AS a, y.vec_id AS b,
                 round(list_dot_product(x.v, y.v)
                       / (sqrt(list_dot_product(x.v, x.v))
                          * sqrt(list_dot_product(y.v, y.v))), 5) AS sim
          FROM pv x JOIN pv y ON x.vec_id != y.vec_id),
        r1 AS (SELECT 1::BIGINT AS rank, vec_id,
                      round({lam} * rel, 6) AS mmr
               FROM pv ORDER BY mmr DESC, vec_id LIMIT 1),
        sel1 AS (SELECT vec_id FROM r1)"""
    ]
    for i in range(2, MMR_K + 1):
        parts.append(
            f"""c{i} AS (
          SELECT p.vec_id,
                 round({lam} * p.rel - {oml} * max(s.sim), 6) AS mmr
          FROM pv p JOIN sims s ON s.a = p.vec_id
               JOIN sel{i - 1} t ON s.b = t.vec_id
          WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
          GROUP BY p.vec_id, p.rel),
        r{i} AS (SELECT {i}::BIGINT AS rank, vec_id, mmr FROM c{i}
                 ORDER BY mmr DESC, vec_id LIMIT 1),
        sel{i} AS (SELECT vec_id FROM sel{i - 1}
                   UNION ALL SELECT vec_id FROM r{i})"""
        )
    union = " UNION ALL ".join(
        f"SELECT * FROM r{i}" for i in range(1, MMR_K + 1)
    )
    return (
        "WITH " + ",\n        ".join(parts)
        + f" SELECT rank, vec_id, mmr FROM ({union}) ORDER BY rank"
    )


def _search_eval_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.search_eval_ndcg: disjunctive BM25
    per pinned query, rel = distinct query terms in the doc,
    gain 2^rel - 1, ranking over the rounded score, NDCG@10."""
    from searchengine_spark.ops.textops import EVAL_QUERIES

    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in EVAL_QUERIES for t in terms
    )
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT * FROM (VALUES {qvals}) AS v(qid, term)),
        dft AS (SELECT term, count(DISTINCT tf.doc_id) AS df
                FROM tf JOIN (SELECT DISTINCT term FROM qterms)
                  USING (term)
                GROUP BY term),
        cand AS (
          SELECT q.qid, tf.doc_id,
                 round(sum( ln((stats.n - dft.df + 0.5)
                               / (dft.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score,
                 count(*) AS rel
          FROM tf JOIN qterms q USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY q.qid, tf.doc_id
        ),
        dcg AS (
          SELECT qid, sum((power(2, rel) - 1)
                          / log2(rank + 1)) AS dcg
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
                FROM cand)
          WHERE rank <= 10 GROUP BY qid
        ),
        idcg AS (
          SELECT qid, sum((power(2, rel) - 1)
                          / log2(irank + 1)) AS idcg
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY rel DESC, doc_id) AS irank
                FROM cand)
          WHERE irank <= 10 GROUP BY qid
        )
        SELECT d.qid::BIGINT AS qid, round(d.dcg / i.idcg, 6) AS ndcg
        FROM dcg d JOIN idcg i USING (qid)
        ORDER BY qid
    """


def _ltr_features_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.ltr_features: the eval family's
    candidate CTE extended with sum_tf/dl, rounded-rank pool cut, and
    the span_near anchor-join min cover computed ONLY for pool docs
    (coalesce 0 for partial matches)."""
    from searchengine_spark.ops.textops import EVAL_QUERIES, LTR_POOL

    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in EVAL_QUERIES for t in terms
    )
    ntvals = ", ".join(
        f"({qid}, {len(terms)})" for qid, terms in EVAL_QUERIES
    )
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT * FROM (VALUES {qvals}) AS v(qid, term)),
        nt AS (SELECT * FROM (VALUES {ntvals}) AS v(qid, nterms)),
        dft AS (SELECT term, count(DISTINCT tf.doc_id) AS df
                FROM tf JOIN (SELECT DISTINCT term FROM qterms)
                  USING (term)
                GROUP BY term),
        cand AS (
          SELECT q.qid, tf.doc_id,
                 round(sum( ln((stats.n - dft.df + 0.5)
                               / (dft.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score,
                 count(*) AS nmatch,
                 sum(tf.tf)::BIGINT AS sum_tf,
                 max(dl.total_tokens)::BIGINT AS dl
          FROM tf JOIN qterms q USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY q.qid, tf.doc_id
        ),
        pooled AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (
              PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
            FROM cand)
          WHERE rank <= {LTR_POOL}
        ),
        ptoks AS (
          SELECT t.doc_id, i AS pos, t.t[i] AS term
          FROM (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents) t, LATERAL (
            SELECT unnest(generate_series(1, len(t.t))) AS i) g
        ),
        qpos AS (
          SELECT p.qid, p.doc_id, pt.pos, pt.term
          FROM pooled p
          JOIN qterms q ON q.qid = p.qid
          JOIN ptoks pt ON pt.doc_id = p.doc_id
                       AND pt.term = q.term
        ),
        anchors AS (SELECT DISTINCT qid, doc_id, pos FROM qpos),
        nxt AS (
          SELECT a.qid, a.doc_id, a.pos AS p, q.term,
                 min(q.pos) AS np
          FROM anchors a JOIN qpos q
            ON q.qid = a.qid AND q.doc_id = a.doc_id
           AND q.pos >= a.pos
          GROUP BY a.qid, a.doc_id, a.pos, q.term
        ),
        cover AS (
          SELECT n.qid, n.doc_id, n.p, max(n.np) AS e
          FROM nxt n JOIN nt ON nt.qid = n.qid
          GROUP BY n.qid, n.doc_id, n.p, nt.nterms
          HAVING count(DISTINCT n.term) = nt.nterms
        ),
        win AS (
          SELECT qid, doc_id, min(e - p + 1)::BIGINT AS min_win
          FROM cover GROUP BY qid, doc_id)
        SELECT p.qid::BIGINT AS qid, p.doc_id,
               p.rank::BIGINT AS rank,
               p.nmatch::BIGINT AS nmatch, p.sum_tf, p.dl,
               p.score AS bm25,
               coalesce(w.min_win, 0)::BIGINT AS min_win
        FROM pooled p LEFT JOIN win w USING (qid, doc_id)
        ORDER BY p.qid, p.rank
    """


def _search_eval_map_mrr_oracle_sql(k: int = 10) -> str:
    """DuckDB mirror of ops.textops.search_eval_map_mrr: binary
    relevance = conjunctive match (rel == nterms), rank over the
    rounded score, AP@k with the min(R, k) denominator, MRR@k."""
    from searchengine_spark.ops.textops import EVAL_QUERIES

    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in EVAL_QUERIES for t in terms
    )
    ntvals = ", ".join(
        f"({qid}, {len(terms)})" for qid, terms in EVAL_QUERIES
    )
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT * FROM (VALUES {qvals}) AS v(qid, term)),
        nterms AS (SELECT * FROM (VALUES {ntvals}) AS v(qid, nterms)),
        dft AS (SELECT term, count(DISTINCT tf.doc_id) AS df
                FROM tf JOIN (SELECT DISTINCT term FROM qterms)
                  USING (term)
                GROUP BY term),
        cand AS (
          SELECT q.qid, tf.doc_id,
                 round(sum( ln((stats.n - dft.df + 0.5)
                               / (dft.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score,
                 count(*) AS rel
          FROM tf JOIN qterms q USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY q.qid, tf.doc_id
        ),
        flag AS (
          SELECT c.*, (c.rel = n.nterms)::BIGINT AS is_rel
          FROM cand c JOIN nterms n USING (qid)
        ),
        rt AS (SELECT qid, sum(is_rel) AS r_total
               FROM flag GROUP BY qid),
        ranked AS (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
                 ) AS rank,
                 sum(is_rel) OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
                 ) AS cum_rel
          FROM flag
        ),
        perq AS (
          SELECT qid,
                 sum(CASE WHEN is_rel = 1
                          THEN cum_rel::DOUBLE / rank
                          ELSE 0.0::DOUBLE END) AS ap_num,
                 max(CASE WHEN is_rel = 1
                          THEN 1.0::DOUBLE / rank
                          ELSE 0.0::DOUBLE END) AS mrr_raw
          FROM ranked WHERE rank <= {k} GROUP BY qid
        )
        SELECT p.qid::BIGINT AS qid,
               round(p.ap_num
                     / greatest(least(r.r_total, {k})::DOUBLE, 1.0),
                     6) AS ap,
               round(p.mrr_raw, 6) AS mrr
        FROM perq p JOIN rt r USING (qid)
        ORDER BY qid
    """


_TESTDATA_VOCAB_CACHE = None
_FULL_MAPS_CACHE = None   # (hrows, crc_rows) | False (precondition failed)


def _testdata_stem_pairs(extra_tokens=()):
    """Sorted (term, stem) pairs over the UNION of the test corpora's
    vocabularies plus ``extra_tokens``, computed by the in-repo
    pure-Python stemmer (adjudicated against the published Porter
    vectors) — covers whichever SF the driver compares at.  None when
    no test corpus is present (stemmed oracles then stay rows-only).
    DuckDB has no Porter offline; interpolating this map lets the SQL
    prove the distributed pipeline AROUND the stemmer, which keeps its
    own vector gate."""
    global _TESTDATA_VOCAB_CACHE

    import os

    import duckdb

    from searchengine_spark.text.porter import porter_stem

    if _TESTDATA_VOCAB_CACHE is None:
        vocab, found = set(), False
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            p = f"/root/testdata/{sf}/documents.parquet"
            if not os.path.exists(p):
                continue
            found = True
            con = duckdb.connect()
            rows = con.sql(
                "SELECT DISTINCT unnest(regexp_extract_all(lower(text),"
                f" '[a-z0-9]+')) AS t FROM '{p}'"
            ).fetchall()
            con.close()
            vocab.update(r[0] for r in rows)
        _TESTDATA_VOCAB_CACHE = vocab if found else False
    if _TESTDATA_VOCAB_CACHE is False:
        return None
    allv = _TESTDATA_VOCAB_CACHE | set(extra_tokens)
    return sorted((t, porter_stem(t)) for t in allv)


def _testdata_full_maps():
    """Interpolated inputs for the FULL flagship oracle, or None when
    any precondition fails (the flagship twins then stay rows-only):

     * (doc_id, repo, unsigned-xxh64) rows over sf0.001 + sf0.01 — the
       hash-order docid key, computed by the in-repo xxh64 (parity-
       tested against F.xxhash64 with Spark's multi-column seed chain);
     * (term, bit-pos, ±1) rows — each vocabulary term's CRC-64 bit
       pattern as sign weights (text/simhash.py semantics), so the SQL
       computes the 64-bit simhash as integer arithmetic;
     * preconditions: no import-pattern lines in any corpus (edges must
       be empty so quality is the (1-d)/0/0 constant), and every doc
       has >= 1 token (a token-less doc would silently skip the
       fingerprint join).

    The doc-hash map covers sf0.001 and sf0.01 (the driver's
    correctness gate runs at sf0.01); an sf0.1 compare would inner-join
    drop rows and fail loudly rather than pass wrongly."""
    global _FULL_MAPS_CACHE
    if _FULL_MAPS_CACHE is not None:
        return _FULL_MAPS_CACHE or None
    import hashlib
    import os
    import re

    import duckdb

    from searchengine_spark.index.xxhash64 import xxh64
    from searchengine_spark.text.simhash import crc64

    imp_re = re.compile(r"^import\s+\S+:\S+\s*$", re.M)
    hash_rows = {}
    vocab = set()
    found = False
    for sf in ("sf0.001", "sf0.01"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        found = True
        con = duckdb.connect()
        docs = con.sql(
            f"SELECT doc_id, source, lower(text) AS t FROM '{p}'"
        ).fetchall()
        con.close()
        for doc_id, source, t in docs:
            toks = re.findall(r"[a-z0-9]+", t)
            if not toks or imp_re.search(t):
                _FULL_MAPS_CACHE = False
                return None
            vocab.update(toks)
            path = f"doc/{doc_id}"
            cmt = hashlib.sha256(
                f"{source}|{doc_id}".encode()
            ).hexdigest()[:40]
            h = 42
            for v in (source, path, cmt):
                h = xxh64(v.encode("utf-8"), seed=h)
            hash_rows[(int(doc_id), source)] = h
    if not found:
        _FULL_MAPS_CACHE = False
        return None
    crc_rows = []
    for term in sorted(vocab):
        ch = crc64(term.encode("utf-8"))
        for bp in range(64):
            pm = 1 if (ch >> (63 - bp)) & 1 else -1
            crc_rows.append((term, bp, pm))
    hrows = sorted(
        (doc_id, repo, u) for (doc_id, repo), u in hash_rows.items()
    )
    _FULL_MAPS_CACHE = (hrows, crc_rows)
    return hrows, crc_rows


def _stemmed_topk_oracle_sql():
    """DuckDB mirror of ops.textops.stemmed_topk, or None when the
    test corpora are absent (the entry then stays rows-only).  The
    stem map enters as a VALUES table (_testdata_stem_pairs)."""
    from searchengine_spark.ops.textops import STEM_K, STEM_QUERY
    from searchengine_spark.text.porter import porter_stem

    pairs = _testdata_stem_pairs(STEM_QUERY)
    if pairs is None:
        return None
    mapvals = ", ".join(f"('{t}', '{s}')" for t, s in pairs)
    qstems = sorted({porter_stem(t) for t in STEM_QUERY})
    qlist = ", ".join(f"'{s}'" for s in qstems)
    return f"""
        WITH toks AS ({_TOKS}),
        smap AS (SELECT * FROM (VALUES {mapvals}) AS v(term, stem)),
        stoks AS (SELECT doc_id, stem AS term
                  FROM toks JOIN smap USING (term)),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
               GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf
               GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT unnest([{qlist}]) AS term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                      * tf.tf * 2.2
                      / (tf.tf + 1.2 * (0.25 + 0.75
                         * dl.total_tokens / stats.avgdl))
                 ) AS s,
                 count(*) AS nmatch
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS score FROM scored
        WHERE nmatch = {len(qstems)}
        ORDER BY score DESC, doc_id LIMIT {STEM_K}
    """


def _hard_negatives_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.hard_negatives: rounded-rank pool
    of the eval candidates, negatives = rel < nterms, re-ranked among
    themselves; HN_POOL / HN_K interpolated."""
    from searchengine_spark.ops.textops import (
        EVAL_QUERIES,
        HN_K,
        HN_POOL,
    )

    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in EVAL_QUERIES for t in terms
    )
    ntvals = ", ".join(
        f"({qid}, {len(terms)})" for qid, terms in EVAL_QUERIES
    )
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term),
        dl AS (SELECT doc_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT * FROM (VALUES {qvals}) AS v(qid, term)),
        nterms AS (SELECT * FROM (VALUES {ntvals}) AS v(qid, nterms)),
        dft AS (SELECT term, count(DISTINCT tf.doc_id) AS df
                FROM tf JOIN (SELECT DISTINCT term FROM qterms)
                  USING (term)
                GROUP BY term),
        cand AS (
          SELECT q.qid, tf.doc_id,
                 round(sum( ln((stats.n - dft.df + 0.5)
                               / (dft.df + 0.5) + 1.0)
                            * tf.tf * 2.2
                            / (tf.tf + 1.2 * (0.25 + 0.75
                               * dl.total_tokens / stats.avgdl))
                 ), 6) AS score,
                 count(*) AS rel
          FROM tf JOIN qterms q USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY q.qid, tf.doc_id
        ),
        ranked AS (
          SELECT c.*, n.nterms,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
                 )::BIGINT AS rank
          FROM cand c JOIN nterms n USING (qid)
        ),
        negs AS (
          SELECT qid, doc_id, rank, score,
                 row_number() OVER (
                   PARTITION BY qid ORDER BY score DESC, doc_id
                 )::BIGINT AS neg_rank
          FROM ranked WHERE rank <= {HN_POOL} AND rel != nterms
        )
        SELECT qid::BIGINT AS qid, neg_rank, doc_id, rank, score
        FROM negs WHERE neg_rank <= {HN_K}
    """


def _term_vectors_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.term_vectors: 1-based positions
    from generate_series over the token array (the kwic pattern),
    position list comma-joined in position order."""
    from searchengine_spark.ops.textops import TV_DOC_IDS

    ids = ", ".join(str(int(d)) for d in TV_DOC_IDS)
    return f"""
        WITH rawtoks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents WHERE doc_id IN ({ids})),
        pos AS (
          SELECT doc_id, t[i] AS term, i AS pos
          FROM rawtoks, LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS i) g)
        SELECT doc_id, term, count(*)::BIGINT AS tf,
               min(pos)::BIGINT AS first_pos,
               string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
        FROM pos GROUP BY doc_id, term
    """


def _fuzzy_terms_oracle_sql() -> str:
    """DuckDB mirror of ops.textops.fuzzy_terms — brute-force: every
    (probe, dict term) pair at levenshtein <= 1, ranked (dist, df desc,
    term).  Spark prunes candidates via symmetric deletes; identical
    output here proves that pruning lossless."""
    from searchengine_spark.ops.textops import (
        FUZZY_MIN_LEN,
        FUZZY_Q,
        FUZZY_TOPN,
    )

    return f"""
        WITH toks AS ({_TOKS}),
        dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                 FROM toks GROUP BY term),
        probes AS (
          SELECT DISTINCT substr(term, 1, 1) || substr(term, 3) AS q
          FROM (SELECT term FROM dict
                WHERE length(term) >= {FUZZY_MIN_LEN}
                ORDER BY df DESC, term LIMIT {FUZZY_Q})
        ),
        cand AS (
          SELECT p.q, d.term, d.df,
                 levenshtein(p.q, d.term)::BIGINT AS dist
          FROM probes p CROSS JOIN dict d
          WHERE levenshtein(p.q, d.term) <= 1
        )
        SELECT q, term, df, dist, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY q ORDER BY dist, df DESC, term)::BIGINT AS rank
          FROM cand)
        WHERE rank <= {FUZZY_TOPN}
    """


def oracle_sql() -> dict[str, str]:
    from searchengine_spark.ops.textops import LANG_MARKERS, QUALITY_STOPWORDS
    from searchengine_spark.ops.prep import (
        PREP_BUDGET_FRAC,
        PREP_MAX_STOPWORD_RATIO,
        PREP_MIN_TOKENS,
    )
    from searchengine_spark.ops import relational as _REL
    from searchengine_spark.ops.dedup import OVR_K as _OVR_K
    from searchengine_spark.ops.mix import (
        DECON_EVAL_MOD,
        DECON_MAX_SHINGLE_DF,
        DECON_NGRAM,
        SAMPLE_RATES,
        _rate_threshold_hex,
    )

    from searchengine_spark.ops.mix import (
        BIGRAM_LAMBDA as _BG_LAM,
        COLLOC_MIN_COUNT,
        COLLOC_TOPN,
        KMV_K,
        MIX_TEMP_ALPHA as _mix_alpha,
        PPL_BUCKETS as _PPL_B,
        SHUFFLE_SEED as _SHUF_SEED,
        SOURCE_CAP as _SRC_CAP,
        SPLIT_FRACS,
        WS_N,
        cms_heavy_hitters_oracle_sql as _cms_hh_oracle_sql,
        kmv_u32_sql,
    )
    from searchengine_spark.ops.scrub import (
        PII_EMAIL_RE as _PII_E,
        PII_INJECT_SQL as _PII_INJ,
        PII_IP_RE as _PII_I,
        PII_NUM_RE as _PII_N,
    )
    from searchengine_spark.ops.textops import LM_K, LM_MU, LM_TERMS
    from searchengine_spark.ops.textops import (
        FUZZY_MIN_LEN as _SG_MINLEN,
        SUGG_EDIT_LP as _SG_LP,
        SUGG_LAMBDA as _SG_LAM,
        SUGG_TOPN as _SG_TOPN,
    )

    _split_thr_test = _rate_threshold_hex(SPLIT_FRACS["test"])
    _split_thr_val = _rate_threshold_hex(
        SPLIT_FRACS["test"] + SPLIT_FRACS["val"]
    )
    _sample_whens = " ".join(
        f"WHEN '{lang}' THEN '{_rate_threshold_hex(SAMPLE_RATES[lang])}'"
        for lang in sorted(SAMPLE_RATES)
    )
    _sample_thr = f"CASE lang {_sample_whens} ELSE '' END"

    # event-time constants interpolated from streaming/windows.py so the
    # oracle can't silently desynchronize from the Spark definitions;
    # date_trunc only expresses 1-unit tumbling windows, hence the guard
    from searchengine_spark.streaming.windows import (
        BURST_TOPN as _BURST_TOPN,
        SESSION_GAP,
        WINDOW,
    )
    from searchengine_spark.ops.events import (
        ASOF_SRC as _ASOF_SRC,
        ASOF_TGT as _ASOF_TGT,
        BP_GAP_SEC as _BP_GAP,
        FUNNEL_PCTS as _FUNNEL_PCTS,
        FUNNEL_STEPS as _FUNNEL,
        HIST_BINS as _HIST_BINS,
        PCTS as _PCTS,
        RET_MAX_DAYS as _RET_MAX,
    )
    from searchengine_spark.ops.vectors import (
        ANN_CURVE_MAX_NPROBE as _ANN_CURVE_MAX,
        ANN_FILTER_LABELS as _ANN_FILTER_LABELS,
        SQ_BINS as _SQ_BINS,
        SQ_QUERY_VEC as _SQ_QV,
        SQ_RERANK as _SQ_RERANK,
    )

    # temperature-mixture CTE core ending in tm(lang, n_tokens, share,
    # weight, rate) — shared by temperature_mixture and its composed
    # sampling application so the two oracles cannot desynchronize
    _TM_CORE = f"""per AS (
              SELECT lang,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                       AS n
              FROM documents
            ),
            g AS (SELECT lang, sum(n)::BIGINT AS n_tokens
                  FROM per GROUP BY lang),
            t AS (SELECT sum(n_tokens)::DOUBLE AS tot FROM g),
            sh AS (SELECT lang, n_tokens, n_tokens / tot AS share,
                          pow(n_tokens / tot, {_mix_alpha!r}) AS p
                   FROM g CROSS JOIN t),
            sump AS (SELECT list_reduce(list(p ORDER BY lang),
                                        (acc, x) -> acc + x) AS s
                     FROM sh),
            b AS (SELECT lang, n_tokens, share, p / s AS weight,
                         (p / s) / share AS boost
                  FROM sh CROSS JOIN sump),
            mx AS (SELECT max(boost) AS m FROM b),
            tm AS (SELECT lang, n_tokens, round(share, 6) AS share,
                          round(weight, 6) AS weight,
                          round(boost / m, 6) AS rate
                   FROM b CROSS JOIN mx)"""

    _PCT_VALS = ", ".join(
        f"({label}, {p!r})" for label, p in _PCTS
    )

    # ordered-funnel CTE chain from the pinned FUNNEL_STEPS: step i's
    # first-match min(ts) is taken over events strictly after the
    # user's step-(i-1) match
    _fun_ctes = []
    for _i, _s in enumerate(_FUNNEL):
        if _i == 0:
            _fun_ctes.append(
                f"s1 AS (SELECT user_id, min(ts) AS t FROM events "
                f"WHERE event_type = '{_s}' GROUP BY user_id)"
            )
        else:
            _fun_ctes.append(
                f"s{_i + 1} AS (SELECT e.user_id, min(e.ts) AS t "
                f"FROM events e JOIN s{_i} p ON e.user_id = p.user_id "
                f"AND e.ts > p.t WHERE e.event_type = '{_s}' "
                f"GROUP BY e.user_id)"
            )
    _fun_union = " UNION ALL ".join(
        f"SELECT {_i + 1} AS step, '{_s}' AS event_type, "
        f"(SELECT count(*) FROM s{_i + 1}) AS n_users"
        for _i, _s in enumerate(_FUNNEL)
    )

    _win_n, _win_unit = WINDOW.split()
    assert _win_n == "1", "events_windowed oracle needs a 1-unit window"
    _gap_n, _gap_unit = SESSION_GAP.split()
    _gap_sql = f"INTERVAL {_gap_n} {_gap_unit.rstrip('s').upper()}"

    _stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)

    lang_score = ", ".join(
        "sum(CASE WHEN term IN ({m}) THEN 1 ELSE 0 END) AS s_{lang}".format(
            m=", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang=lang
        )
        for lang in sorted(LANG_MARKERS)
    )
    lang_max = "greatest(" + ", ".join(
        f"s_{lang}" for lang in sorted(LANG_MARKERS)
    ) + ")"
    lang_case = "CASE WHEN mx = 0 THEN 'unknown' " + " ".join(
        f"WHEN s_{lang} = mx THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    ) + " END"

    # interpolated-bigram LM CTEs (ops/mix.bigram_logprob semantics),
    # shared by the bigram_logprob and perplexity_buckets oracles so
    # the LM definition cannot drift between them
    _bg_ctes = f"""rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            ptoks AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            ),
            pairs AS (
              SELECT doc_id, prev, term FROM (
                SELECT doc_id, term,
                       lag(term) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS prev
                FROM ptoks)
              WHERE prev IS NOT NULL
            ),
            c2 AS (SELECT prev, term, count(*) AS c2
                   FROM pairs GROUP BY prev, term),
            c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY prev),
            cu AS (SELECT term, count(*) AS cu FROM ptoks GROUP BY term),
            t AS (SELECT sum(cu)::DOUBLE AS tot FROM cu),
            nlls AS (
              SELECT doc_id, count(*)::BIGINT AS n_bigrams,
                     round(-avg(ln({_BG_LAM} * c2 / c1
                                   + {1.0 - _BG_LAM} * cu / tot)), 6)
                       AS nll
              FROM pairs JOIN c2 USING (prev, term) JOIN c1 USING (prev)
                   JOIN cu USING (term) CROSS JOIN t
              GROUP BY doc_id
            )"""

    d = {
        # top-k overlap set-similarity join (ops/dedup.
        # topk_overlap_pairs): the oracle is the BRUTE-FORCE all-pairs
        # shared-bigram count — equality proves the prefix filter
        # lossless (the substring_search pattern); OVR_K interpolated
        "topk_overlap_pairs": f"""
            WITH t AS (
              SELECT doc_id, i AS pos, tk[i] AS term
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[a-z0-9]+')
                             AS tk
                    FROM documents) d,
              LATERAL (
                SELECT unnest(generate_series(1, len(tk))) AS i) g),
            bg AS (
              SELECT DISTINCT doc_id,
                     term || ' ' || lead(term) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS s
              FROM t
              QUALIFY lead(term) OVER (
                PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
            ov AS (
              SELECT x.doc_id AS a, y.doc_id AS b,
                     count(*)::BIGINT AS overlap
              FROM bg x JOIN bg y
                ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
            SELECT a, b, overlap FROM (
              SELECT *, row_number() OVER (
                       ORDER BY overlap DESC, a, b) AS rn
              FROM ov) WHERE rn <= {_OVR_K}
            ORDER BY overlap DESC, a, b
        """,
        "dedup_minhash": f"""
            WITH {_SHINGLES},
            sig AS (
              SELECT doc_id, seed,
                     min(md5(seed::varchar || '|' || shingle)) AS sig
              FROM sh CROSS JOIN (
                SELECT unnest(generate_series(0, 7)) AS seed) seeds
              GROUP BY doc_id, seed
            ),
            bands AS (
              SELECT doc_id, seed // 2 AS band,
                     md5(string_agg(sig, '' ORDER BY seed)) AS key
              FROM sig GROUP BY doc_id, seed // 2
            )
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM bands x JOIN bands y
              ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        """,
        # span-level exact dedup (ops/dedup.span_dedup): every SPAN_W-token
        # window with >= 2 corpus occurrences is duplicated text; per-doc
        # duplicated-window count + covered-token fraction.  Same rule
        # verbatim; Spark's shingle-hash shuffle vs this window function.
        "span_dedup": _span_dedup_oracle_sql(),
        # the actionable half: strip every non-canonical duplicated-span
        # occurrence (canonical = smallest (doc_id, start) per shingle)
        # and reassemble the surviving tokens.  Spark picks the canonical
        # via a min-struct agg (skew-safe); row_number here is the same
        # argmin.
        "strip_dup_spans": _strip_dup_spans_oracle_sql(),
        # SymSpell fuzzy correction (ops/textops.fuzzy_terms): brute-force
        # cross join + levenshtein here proves Spark's symmetric-delete
        # candidate pruning lossless for ed <= 1.
        "fuzzy_terms": _fuzzy_terms_oracle_sql(),
        # per-doc keyword extraction + Lucene-style more-like-this
        # (keywords of the pinned source doc -> disjunctive BM25,
        # source excluded, stats corpus-global)
        "tfidf_keywords": _tfidf_keywords_oracle_sql(),
        "more_like_this": _more_like_this_oracle_sql(),
        "rocchio_topk": _rocchio_oracle_sql(),
        "mmr_topk": _mmr_oracle_sql(),
        "result_clusters": _result_clusters_oracle_sql(),
        # retrieval-quality evaluation: NDCG@10 of the disjunctive BM25
        # ranking vs term-overlap graded relevance (lexical ann_recall)
        "search_eval_ndcg": _search_eval_oracle_sql(),
        # binary-relevance twin: MAP@10 / MRR@10 vs conjunctive-match
        # qrels (ops/textops.search_eval_map_mrr)
        "search_eval_map_mrr": _search_eval_map_mrr_oracle_sql(),
        # DPR-style hard-negative mining from the eval retrieval pool
        "hard_negatives": _hard_negatives_oracle_sql(),
        "ltr_features": _ltr_features_oracle_sql(),
        # ES _termvectors-shape surface: per pinned doc, each term's
        # tf / first position / full 1-based position list
        # (ops/textops.term_vectors; TV_DOC_IDS interpolated)
        "term_vectors": _term_vectors_oracle_sql(),
        # the composed training-data pipeline: exact dedup → minhash
        # near-dup (local-min) → one-pass token features → quality gate
        # → token-budget prefix cut.  Same shingle/signature/lang/quality
        # fragments as the per-operator oracles above/below — this entry
        # checks their COMPOSITION end-to-end (ops/prep.py).
        "training_data_prep": f"""
            WITH alive0 AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text, row_number() OVER (
                  PARTITION BY sha256(text) ORDER BY doc_id) AS _rk
                FROM documents) WHERE _rk = 1
            ),
            toks0 AS (SELECT doc_id,
                             regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                      FROM alive0),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
              FROM toks0, LATERAL (
                SELECT unnest(generate_series(1, len(t) - 2)) AS i
              ) g
              WHERE len(t) >= 3
            ),
            sig AS (
              SELECT doc_id, seed,
                     min(md5(seed::varchar || '|' || shingle)) AS sig
              FROM sh CROSS JOIN (
                SELECT unnest(generate_series(0, 7)) AS seed) seeds
              GROUP BY doc_id, seed
            ),
            bands AS (
              SELECT doc_id, seed // 2 AS band,
                     md5(string_agg(sig, '' ORDER BY seed)) AS key
              FROM sig GROUP BY doc_id, seed // 2
            ),
            nd AS (
              SELECT DISTINCT y.doc_id
              FROM bands x JOIN bands y
                ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
            ),
            alive AS (
              SELECT a.doc_id, a.text FROM alive0 a
              WHERE a.doc_id NOT IN (SELECT doc_id FROM nd)
            ),
            toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM alive
            ),
            feat AS (
              SELECT doc_id, count(*) AS n_tokens,
                     round(sum(CASE WHEN term IN ({_stop_list}) THEN 1
                               ELSE 0 END) / count(*), 6) AS stopword_ratio,
                     sum(ceil(length(term) / 4.0)::bigint)::BIGINT
                       AS n_pieces_bpe,
                     {lang_score}
              FROM toks GROUP BY doc_id
            ),
            pred AS (SELECT *, {lang_max} AS mx FROM feat),
            kept AS (
              SELECT doc_id, coalesce({lang_case}, 'unknown') AS lang_pred,
                     n_tokens, n_pieces_bpe, stopword_ratio
              FROM pred
              WHERE n_tokens >= {PREP_MIN_TOKENS}
                AND stopword_ratio <= {PREP_MAX_STOPWORD_RATIO!r}
            ),
            cum AS (
              SELECT *, sum(n_pieces_bpe) OVER (
                ORDER BY stopword_ratio, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              )::BIGINT AS cum_tokens FROM kept
            ),
            tot AS (
              SELECT floor(sum(n_pieces_bpe) * {PREP_BUDGET_FRAC!r})::BIGINT
                       AS budget
              FROM kept
            )
            SELECT doc_id, lang_pred, n_tokens::BIGINT AS n_tokens,
                   n_pieces_bpe, stopword_ratio, cum_tokens
            FROM cum CROSS JOIN tot WHERE cum_tokens <= budget
        """,
        # GPT-3-style n-gram eval decontamination (ops/mix.decontaminate):
        # same shingle fragment as dedup, n = DECON_NGRAM, hot-shingle cap
        # mirrored on the train side
        "decontaminate": f"""
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                          FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     array_to_string(t[i:i+{DECON_NGRAM - 1}], ' ') AS shingle
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(t) - {DECON_NGRAM - 1}))
                         AS i
              ) g
              WHERE len(t) >= {DECON_NGRAM}
            ),
            ev AS (SELECT DISTINCT shingle FROM sh
                   WHERE doc_id % {DECON_EVAL_MOD} = 0),
            tr AS (SELECT doc_id, shingle FROM sh
                   WHERE doc_id % {DECON_EVAL_MOD} <> 0),
            hot AS (
              SELECT shingle FROM (
                SELECT shingle, count(*) AS c FROM tr GROUP BY shingle)
              WHERE c > {DECON_MAX_SHINGLE_DF}
            ),
            tr2 AS (SELECT * FROM tr
                    WHERE shingle NOT IN (SELECT shingle FROM hot))
            SELECT doc_id, count(*)::BIGINT AS n_overlap
            FROM tr2 JOIN ev USING (shingle)
            GROUP BY doc_id ORDER BY doc_id
        """,
        # eval-side contamination audit (ops/mix.contamination_report):
        # same constants/cap, built by the module's oracle builder
        "contamination_report": __import__(
            "searchengine_spark.ops.mix", fromlist=["x"]
        ).contamination_report_oracle_sql(),
        # deterministic hash-threshold sampling (ops/mix.stratified_sample):
        # thresholds are Python-computed hex literals shared with the Spark
        # builder; lowercase-hex string compare is engine-identical
        "stratified_sample": f"""
            SELECT doc_id, lang,
                   substr(md5(doc_id::VARCHAR), 1, 8) AS sample_key
            FROM documents
            WHERE {_sample_thr} <> ''
              AND substr(md5(doc_id::VARCHAR), 1, 8) <= {_sample_thr}
        """,
        "corpus_mixture": """
            WITH per AS (
              SELECT lang,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                       AS n
              FROM documents
            ),
            g AS (SELECT lang, count(*)::BIGINT AS n_docs,
                         sum(n)::BIGINT AS n_tokens
                  FROM per GROUP BY lang),
            t AS (SELECT sum(n_tokens)::DOUBLE AS tot,
                         count(*)::DOUBLE AS nl FROM g)
            SELECT lang, n_docs, n_tokens,
                   round(n_tokens / tot, 6) AS token_share,
                   CASE WHEN n_tokens > 0 THEN
                     round((1.0 / nl) / (n_tokens / tot), 6)
                   END AS epochs
            FROM g CROSS JOIN t
        """,
        # XLM-R alpha-sampling (ops/mix.temperature_mixture): weight ∝
        # share^alpha; Σp is the lang-ordered sequential fold on both
        # engines (list_reduce == F.aggregate with exact 0.0 init);
        # MIX_TEMP_ALPHA interpolated via repr — change both together
        "temperature_mixture": f"""
            WITH {_TM_CORE}
            SELECT lang, n_tokens, share, weight, rate FROM tm
        """,
        # the COMPOSED application (ops/mix.temperature_sample): the
        # data-derived rate (bit-identical cross-engine) converts to a
        # 32-bit hex threshold INSIDE both engines — strict < compare
        # on the md5 prefix; rate >= 1.0 keeps everything
        "temperature_sample": f"""
            WITH {_TM_CORE},
            keyd AS (
              SELECT d.doc_id, d.lang,
                     substr(md5(d.doc_id::VARCHAR), 1, 8) AS sample_key,
                     tm.rate
              FROM documents d JOIN tm USING (lang)
            )
            SELECT doc_id, lang, sample_key FROM keyd
            WHERE rate >= 1.0
               OR sample_key < lpad(lower(hex(
                    (floor(rate * 4294967296.0))::UBIGINT)), 8, '0')
        """,
        # corpus-unigram self-perplexity proxy (ops/mix.unigram_logprob):
        # natural log, mean, one 6-decimal rounding (cross-engine float
        # contract)
        "unigram_logprob": f"""
            WITH toks AS ({_TOKS}),
            tfd AS (SELECT doc_id, term, count(*) AS tf
                    FROM toks GROUP BY doc_id, term),
            cfd AS (SELECT term, sum(tf) AS cf FROM tfd GROUP BY term),
            t AS (SELECT sum(cf)::DOUBLE AS tot FROM cfd)
            SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
                   round(-sum(tf * ln(cf / tot)) / sum(tf), 6) AS nll
            FROM tfd JOIN cfd USING (term) CROSS JOIN t
            GROUP BY doc_id
        """,
        # deterministic train/val/test split (ops/mix.corpus_split):
        # CUMULATIVE md5 hash thresholds — test is a stable prefix
        "corpus_split": f"""
            SELECT doc_id,
                   CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8)
                             <= '{_split_thr_test}' THEN 'test'
                        WHEN substr(md5(doc_id::VARCHAR), 1, 8)
                             <= '{_split_thr_val}' THEN 'val'
                        ELSE 'train' END AS split,
                   substr(md5(doc_id::VARCHAR), 1, 8) AS split_key
            FROM documents
        """,
        # per-source contribution caps (ops/mix.source_caps): hash-rank
        # row_number here == the Spark op's two-phase prefix count minus
        # broadcast per-source offsets — same argmin order, skew-safe plan
        "source_caps": f"""
            SELECT doc_id, source, src_rank FROM (
              SELECT doc_id, source,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY substr(md5(doc_id::VARCHAR), 1, 8), doc_id
                     )::BIGINT AS src_rank
              FROM documents)
            WHERE src_rank <= {_SRC_CAP}
            ORDER BY source, src_rank
        """,
        # deterministic epoch shuffle (ops/mix.training_shuffle): global
        # row_number over the seed-keyed md5 == the two-phase prefix count
        "training_shuffle": f"""
            SELECT doc_id,
                   md5('{_SHUF_SEED}:' || doc_id::VARCHAR) AS shuffle_key,
                   row_number() OVER (
                     ORDER BY md5('{_SHUF_SEED}:' || doc_id::VARCHAR), doc_id
                   )::BIGINT AS pos
            FROM documents
        """,
        # PII family (ops/scrub.py): patterns stay in the Java/RE2-identical
        # subset; injection CASE is the module's PII_INJECT_SQL — the Spark
        # expression and this SQL share one definition and cannot desync
        "pii_counts": f"""
            WITH t AS (SELECT doc_id, {_PII_INJ} AS tt FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(tt, '{_PII_E}'))::BIGINT AS n_email,
                   len(regexp_extract_all(tt, '{_PII_I}'))::BIGINT AS n_ip,
                   len(regexp_extract_all(tt, '{_PII_N}'))::BIGINT AS n_num
            FROM t
        """,
        "pii_scrub": f"""
            WITH t AS (SELECT doc_id, {_PII_INJ} AS tt FROM documents)
            SELECT doc_id,
                   (len(regexp_extract_all(tt, '{_PII_E}'))
                    + len(regexp_extract_all(tt, '{_PII_I}'))
                    + len(regexp_extract_all(tt, '{_PII_N}')))::BIGINT
                     AS n_redactions,
                   regexp_replace(regexp_replace(regexp_replace(
                     tt, '{_PII_E}', '<EMAIL>', 'g'),
                         '{_PII_I}', '<IP>', 'g'),
                         '{_PII_N}', '<NUM>', 'g') AS clean_text
            FROM t
        """,
        "pii_summary": f"""
            WITH t AS (SELECT doc_id, source, {_PII_INJ} AS tt
                       FROM documents),
            per AS (
              SELECT source,
                     len(regexp_extract_all(tt, '{_PII_E}'))::BIGINT AS e,
                     len(regexp_extract_all(tt, '{_PII_I}'))::BIGINT AS i,
                     len(regexp_extract_all(tt, '{_PII_N}'))::BIGINT AS n
              FROM t)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(CASE WHEN e + i + n > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS docs_with_pii,
                   sum(e)::BIGINT AS n_email,
                   sum(i)::BIGINT AS n_ip,
                   sum(n)::BIGINT AS n_num
            FROM per GROUP BY source
            ORDER BY source
        """,
        # interpolated-bigram self-perplexity (ops/mix.bigram_logprob):
        # P(b|a) = lam·c2/c1 + (1−lam)·cu/tot; ln, mean, one round-6
        "bigram_logprob": f"""
            WITH {_bg_ctes}
            SELECT doc_id, n_bigrams, nll FROM nlls
        """,
        # CCNet head/middle/tail: per-lang ntile over (nll, doc_id) —
        # the Spark op computes the identical cut arithmetically from
        # a two-phase range-partition rank (never a per-lang window)
        "perplexity_buckets": f"""
            WITH {_bg_ctes}
            SELECT n.doc_id, d.lang, n.nll,
                   ntile({_PPL_B}) OVER (
                     PARTITION BY d.lang
                     ORDER BY n.nll, n.doc_id)::BIGINT AS bucket
            FROM nlls n JOIN documents d ON n.doc_id = d.doc_id
            ORDER BY n.doc_id
        """,
        # adjacent-bigram PMI collocations (ops/mix.collocations):
        # marginals/Npairs over the FULL pair stream, min_count floors
        # candidates only; counts integral → pmi = ln of an exact
        # ratio; rank (rounded pmi desc, lhs, rhs)
        "collocations": f"""
            WITH rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            ptoks AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            ),
            pairs AS (
              SELECT lhs, rhs FROM (
                SELECT lag(term) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS lhs,
                       term AS rhs
                FROM ptoks)
              WHERE lhs IS NOT NULL
            ),
            c2 AS (SELECT lhs, rhs, count(*) AS n
                   FROM pairs GROUP BY lhs, rhs),
            cl AS (SELECT lhs, sum(n)::BIGINT AS cl FROM c2 GROUP BY lhs),
            cr AS (SELECT rhs, sum(n)::BIGINT AS cr FROM c2 GROUP BY rhs),
            t AS (SELECT sum(n)::DOUBLE AS npairs FROM c2)
            SELECT lhs, rhs, n::BIGINT AS n,
                   round(ln(n * npairs / (cl * cr)), 6) AS pmi
            FROM c2 JOIN cl USING (lhs) JOIN cr USING (rhs) CROSS JOIN t
            WHERE n >= {COLLOC_MIN_COUNT}
            ORDER BY pmi DESC, lhs, rhs LIMIT {COLLOC_TOPN}
        """,
        # KMV distinct-count sketch (ops/mix.kmv_distinct): k-th
        # smallest DISTINCT md5-prefix hash of the per-lang bigram set;
        # the u32 digit arithmetic is the module's shared kmv_u32_sql
        # (change once); (k-1)*2^32 interpolated as its exact double
        "kmv_distinct": f"""
            WITH rawtoks AS (
              SELECT doc_id, lang,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            ptoks AS (
              SELECT doc_id, lang, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            ),
            pairs AS (
              SELECT DISTINCT lang, lhs, rhs FROM (
                SELECT lang,
                       lag(term) OVER (
                         PARTITION BY doc_id ORDER BY pos) AS lhs,
                       term AS rhs
                FROM ptoks)
              WHERE lhs IS NOT NULL
            ),
            hs AS (
              SELECT DISTINCT lang,
                     {kmv_u32_sql("concat(lang, ':', lhs, ':', rhs)")}
                       AS u32
              FROM pairs
            ),
            ranked AS (
              SELECT lang, u32, row_number() OVER (
                       PARTITION BY lang ORDER BY u32) AS rn
              FROM hs),
            exact AS (
              SELECT lang, count(*)::BIGINT AS n_exact
              FROM pairs GROUP BY lang)
            SELECT r.lang, e.n_exact, r.u32::BIGINT AS kth,
                   round({float((KMV_K - 1) * 4294967296.0)!r} / r.u32, 6)
                     AS n_est
            FROM ranked r JOIN exact e USING (lang)
            WHERE r.rn = {KMV_K}
            ORDER BY r.lang
        """,
        # count-min heavy hitters (ops/mix.cms_heavy_hitters): the
        # identical d x w sketch built in SQL — md5-u32 buckets,
        # BIGINT counter sums, integer-division support threshold,
        # sketch-side (estimate) selection — collisions pinned exactly
        "cms_heavy_hitters": _cms_hh_oracle_sql(),
        # Efraimidis–Spirakis weighted sample (ops/mix.weighted_sample):
        # rank desc over round-6 ln(u)/w with u = (md5-u32 + 1)/2^32
        # (exact division; ln is the only transcendental), doc_id
        # tie-break; the Spark rank is the two-phase _prefix_sum scan
        "weighted_sample": f"""
            WITH u AS (
              SELECT doc_id, n_chars AS w,
                     round(
                       ln(({kmv_u32_sql("concat('ws:', doc_id)")} + 1)
                          / 4294967296.0)
                       / n_chars, 6) AS skey
              FROM documents),
            r AS (
              SELECT doc_id, w, skey,
                     row_number() OVER (ORDER BY skey DESC, doc_id)
                       ::BIGINT AS pos
              FROM u)
            SELECT doc_id, w, skey, pos FROM r
            WHERE pos <= {WS_N} ORDER BY pos
        """,
        # noisy-channel phrase suggester (ops/textops.phrase_suggest):
        # shares the interpolated-bigram CTEs; candidates by brute-force
        # levenshtein <= 1 (losslessness proof of the symmetric-delete
        # join); unseen bigram -> unigram backoff alone
        "phrase_suggest": f"""
            WITH {_bg_ctes},
            top1 AS (
              SELECT prev, term FROM c2
              WHERE length(prev) >= {_SG_MINLEN}
                AND length(term) >= {_SG_MINLEN} AND prev != term
              ORDER BY c2 DESC, prev, term LIMIT 1),
            probes AS (
              SELECT 1 AS slot,
                     substr(prev, 1, 1) || substr(prev, 3) AS q FROM top1
              UNION ALL
              SELECT 2, substr(term, 1, 1) || substr(term, 3) FROM top1),
            dict AS (SELECT DISTINCT term FROM cu),
            cand AS (
              SELECT p.slot, d.term,
                     levenshtein(p.q, d.term)::BIGINT AS dist
              FROM probes p JOIN dict d
                ON levenshtein(p.q, d.term) <= 1),
            pp AS (
              SELECT a.term AS term1, a.dist AS d1,
                     b.term AS term2, b.dist AS d2
              FROM cand a JOIN cand b ON a.slot = 1 AND b.slot = 2),
            scored AS (
              SELECT pp.term1, pp.term2,
                     round( ln(u1.cu / t.tot)
                          + ln(CASE WHEN bc.c2 IS NOT NULL
                               THEN {_SG_LAM} * bc.c2 / cx.c1
                                    + {1.0 - _SG_LAM} * u2.cu / t.tot
                               ELSE {1.0 - _SG_LAM} * u2.cu / t.tot END)
                          + {_SG_LP} * (pp.d1 + pp.d2), 6) AS score
              FROM pp
              JOIN cu u1 ON u1.term = pp.term1
              JOIN cu u2 ON u2.term = pp.term2
              LEFT JOIN c2 bc
                ON bc.prev = pp.term1 AND bc.term = pp.term2
              LEFT JOIN c1 cx ON cx.prev = pp.term1
              CROSS JOIN t)
            SELECT rank, term1, term2, score FROM (
              SELECT *, row_number() OVER (
                ORDER BY score DESC, term1, term2)::BIGINT AS rank
              FROM scored)
            WHERE rank <= {_SG_TOPN} ORDER BY rank
        """,
        "events_windowed": f"""
            SELECT strftime(date_trunc('{_win_unit}', ts),
                            '%Y-%m-%d %H:%M:%S')
                     AS window_start,
                   event_type,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        # per-type hourly burst z-scores (streaming/windows.event_bursts):
        # BIGINT moment sums (HUGEINT cast back) -> identical double
        # arithmetic on both engines; rounded-rank over z; BURST_TOPN
        # interpolated — change Spark and SQL together
        "event_bursts": f"""
            WITH hourly AS (
              SELECT strftime(date_trunc('{_win_unit}', ts),
                              '%Y-%m-%d %H:%M:%S') AS window_start,
                     event_type, count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2),
            mom AS (
              SELECT event_type, sum(n)::BIGINT AS s1,
                     sum(n * n)::BIGINT AS s2, count(*)::BIGINT AS c
              FROM hourly GROUP BY event_type),
            j AS (
              SELECT h.event_type, h.window_start, h.n,
                     m.s1::DOUBLE / m.c::DOUBLE AS mean,
                     (m.s2::DOUBLE - (m.s1::DOUBLE * m.s1::DOUBLE)
                        / m.c::DOUBLE)
                       / (m.c::DOUBLE - 1.0) AS var
              FROM hourly h JOIN mom m USING (event_type)
              WHERE m.c >= 2),
            scored AS (
              SELECT event_type, window_start, n,
                     round((n::DOUBLE - mean) / sqrt(var), 6) AS z
              FROM j WHERE var > 0)
            SELECT rank, event_type, window_start, n, z FROM (
              SELECT *, row_number() OVER (
                ORDER BY z DESC, event_type, window_start
              )::BIGINT AS rank
              FROM scored)
            WHERE rank <= {_BURST_TOPN} ORDER BY rank
        """,
        # value-column analytics (ops/events.py): HIST_BINS / PCTS
        # interpolated — change Spark and SQL together.  Histogram
        # edges from the global min/max (identical double arithmetic);
        # percentiles are exact nearest-rank with the ceil taken over
        # the DOUBLE product on BOTH engines (a DECIMAL product would
        # diverge when p*n is integral in decimal but not in binary)
        "value_histogram": f"""
            WITH rng AS (SELECT min(value) AS lo, max(value) AS hi
                         FROM events)
            SELECT event_type,
                   least(floor((value - lo)
                               / ((hi - lo) / {float(_HIST_BINS)!r}::DOUBLE)),
                         {_HIST_BINS - 1})::BIGINT AS bin,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events CROSS JOIN rng
            GROUP BY 1, 2
        """,
        "value_percentiles": f"""
            WITH ranked AS (
              SELECT event_type, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS rn
              FROM events),
            counts AS (SELECT event_type, count(*) AS n FROM events
                       GROUP BY 1),
            targets AS (
              SELECT event_type, pct::BIGINT AS pct,
                     ceil(p::DOUBLE * n)::BIGINT AS rn
              FROM counts CROSS JOIN (VALUES {_PCT_VALS}) v(pct, p)
            )
            SELECT r.event_type, t.pct, r.value
            FROM ranked r JOIN targets t USING (event_type, rn)
            ORDER BY r.event_type, t.pct
        """,
        # ordered funnel (ops/events.funnel_conversion): FUNNEL_STEPS
        # interpolated; first-match sequential semantics via chained
        # min-ts CTEs; conv = exact BIGINT counts divided as doubles
        "funnel_conversion": f"""
            WITH {", ".join(_fun_ctes)},
            n AS ({_fun_union})
            SELECT step::BIGINT AS step, event_type,
                   n_users::BIGINT AS n_users,
                   round(n_users::DOUBLE
                         / (SELECT count(*) FROM s1), 6) AS conv
            FROM n ORDER BY step
        """,
        # time-to-convert (ops/events.funnel_latency): exact integer
        # microsecond durations (date_diff vs timestampdiff — tz-free
        # on NTZ), nearest-rank over (delta, user_id) with the pinned
        # double-product ceil; FUNNEL_PCTS interpolated
        "funnel_latency": f"""
            WITH {", ".join(_fun_ctes)},
            conv AS (
              SELECT s1.user_id,
                     date_diff('microsecond', s1.t,
                               s{len(_FUNNEL)}.t)::BIGINT AS delta_us
              FROM s1 JOIN s{len(_FUNNEL)}
                ON s1.user_id = s{len(_FUNNEL)}.user_id),
            ranked AS (
              SELECT delta_us, row_number() OVER (
                       ORDER BY delta_us, user_id) AS rn
              FROM conv),
            nn AS (SELECT count(*)::BIGINT AS n FROM conv),
            targets AS (
              SELECT n, pct::BIGINT AS pct,
                     ceil(p::DOUBLE * n)::BIGINT AS rn
              FROM nn CROSS JOIN (VALUES {", ".join(
                  f"({label}, {p!r})" for label, p in _FUNNEL_PCTS
              )}) v(pct, p))
            SELECT n AS n_converters,
                   max(CASE WHEN pct = 50 THEN delta_us END)::BIGINT
                     AS p50_us,
                   max(CASE WHEN pct = 90 THEN delta_us END)::BIGINT
                     AS p90_us
            FROM ranked JOIN targets USING (rn)
            GROUP BY n
        """,
        # retention triangle (ops/events.retention_cohorts): RET_MAX_DAYS
        # interpolated; cohort = first-activity day (tz-free NTZ
        # bucketing), retention divides by the k=0 cohort size
        "retention_cohorts": f"""
            WITH act AS (
              SELECT DISTINCT user_id,
                     date_trunc('day', ts)::DATE AS day
              FROM events),
            fst AS (SELECT user_id, min(day) AS cohort
                    FROM act GROUP BY user_id),
            ks AS (
              SELECT f.cohort,
                     date_diff('day', f.cohort, a.day)::BIGINT AS k
              FROM act a JOIN fst f USING (user_id)
              WHERE date_diff('day', f.cohort, a.day) <= {_RET_MAX}),
            counts AS (SELECT cohort, k, count(*)::BIGINT AS n_active
                       FROM ks GROUP BY cohort, k),
            base AS (SELECT cohort, n_active AS nc
                     FROM counts WHERE k = 0)
            SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort, c.k,
                   c.n_active,
                   round(c.n_active::DOUBLE / b.nc, 6) AS retention
            FROM counts c JOIN base b USING (cohort)
            ORDER BY cohort, c.k
        """,
        # first-order event path matrix (ops/events.event_transitions):
        # per-user (ts, event_id)-ordered lag pairs; p divides exact
        # BIGINT counts as doubles, round-6
        "event_transitions": """
            WITH pairs AS (
              SELECT src, event_type AS dst FROM (
                SELECT user_id, event_type,
                       lag(event_type) OVER (
                         PARTITION BY user_id
                         ORDER BY ts, event_id) AS src
                FROM events)
              WHERE src IS NOT NULL),
            c2 AS (SELECT src, dst, count(*)::BIGINT AS n
                   FROM pairs GROUP BY src, dst),
            c1 AS (SELECT src, sum(n)::BIGINT AS ns
                   FROM c2 GROUP BY src)
            SELECT c2.src, c2.dst, c2.n,
                   round(c2.n::DOUBLE / c1.ns, 6) AS p
            FROM c2 JOIN c1 USING (src)
            ORDER BY c2.src, c2.dst
        """,
        # JSON props analytics (ops/events.props_stats): $.k extracted
        # natively on both engines (get_json_object vs
        # json_extract_string — raw string, BIGINT cast); avg divides
        # exact BIGINT sums as doubles, round-6
        "props_stats": """
            WITH x AS (
              SELECT event_type,
                     json_extract_string(props, '$.k')::BIGINT AS kv
              FROM events)
            SELECT event_type,
                   count(*)::BIGINT AS n_events,
                   count(kv)::BIGINT AS n_with_k,
                   sum(kv)::BIGINT AS sum_k,
                   round(sum(kv)::DOUBLE / count(kv)::DOUBLE, 6)
                     AS avg_k,
                   min(kv)::BIGINT AS min_k,
                   max(kv)::BIGINT AS max_k
            FROM x GROUP BY event_type
            ORDER BY event_type
        """,
        # as-of attribution (ops/events.asof_attribution): the oracle
        # states the SPEC as the brute-force inequality join +
        # row_number argmax over (ts DESC, event_id DESC); the Spark
        # kernel is the single-pass per-user merge scan and must stay
        # equivalent.  ASOF_SRC/ASOF_TGT interpolated; <= inclusive;
        # unmatched -> click_id 0 / lag_us -1; exact microsecond lags
        "asof_attribution": f"""
            WITH p AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = '{_ASOF_TGT}'),
            c AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = '{_ASOF_SRC}'),
            j AS (
              SELECT p.event_id, c.event_id AS cid, c.ts AS cts,
                     p.ts AS pts,
                     row_number() OVER (
                       PARTITION BY p.event_id
                       ORDER BY c.ts DESC, c.event_id DESC) AS rn
              FROM p JOIN c
                ON p.user_id = c.user_id AND c.ts <= p.ts)
            SELECT p.event_id, p.user_id,
                   coalesce(j.cid, 0)::BIGINT AS click_id,
                   coalesce(
                     date_diff('microsecond', j.cts, j.pts),
                     -1)::BIGINT AS lag_us
            FROM p LEFT JOIN (SELECT * FROM j WHERE rn = 1) j
              ON p.event_id = j.event_id
            ORDER BY p.event_id
        """,
        # bucketed range self-join (ops/events.burst_pairs): the
        # oracle is the brute-force inequality join; the Spark kernel
        # is the 2-bucket equi-join and must stay pair-complete —
        # sum_delta_us pins the matched pair SET.  BP_GAP_SEC
        # interpolated; strict lower bound, inclusive upper
        "burst_pairs": f"""
            SELECT a.event_type,
                   count(*)::BIGINT AS n_pairs,
                   sum(date_diff('microsecond', a.ts, b.ts))::BIGINT
                     AS sum_delta_us
            FROM events a JOIN events b
              ON a.event_type = b.event_type
             AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL {_BP_GAP} SECOND
            GROUP BY a.event_type
            ORDER BY a.event_type
        """,
        "tpch_q1": _REL.tpch_q1_oracle_sql(),
        "tpch_q3": _REL.tpch_q3_oracle_sql(),
        "tpch_q5": _REL.tpch_q5_oracle_sql(),
        "tpch_q14": _REL.tpch_q14_oracle_sql(),
        "tpch_q4": _REL.tpch_q4_oracle_sql(),
        "tpch_q17": _REL.tpch_q17_oracle_sql(),
        "tpch_q6": _REL.tpch_q6_oracle_sql(),
        "tpch_q19": _REL.tpch_q19_oracle_sql(),
        "pricing_rollup": _REL.pricing_rollup_oracle_sql(),
        "bucketed_revenue": _REL.bucketed_revenue_oracle_sql(),
        "user_sessions": f"""
            WITH ordered AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL OR
                               ts - lag(ts) OVER w > {_gap_sql}
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            labeled AS (
              SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS sess
              FROM ordered
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')
                     AS session_start,
                   count(*)::BIGINT AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM labeled GROUP BY user_id, sess
        """,
        # PageRank over the undirected near-dup graph
        # (ops/dedup.pagerank_dupgraph): the jaccard-pair CTE feeds a
        # 5-iteration UNROLLED PageRank — each rK stage is exactly one
        # pagerank_df loop body (teleport (1-d) + d·Σ rank/outdeg),
        # damping interpolated via repr() so the float literal matches
        # Spark's 1.0 - 0.85 bit for bit
        "pagerank_dupgraph": _pagerank_dupgraph_oracle_sql(),
        # triangle counts + clustering coefficients over the dup graph
        # (ops/dedup.dupgraph_triangles): brute-force doc_id-ordered
        # 3-way join states the spec; the Spark kernel is the
        # degree-ordered wedge algorithm and must count the identical
        # triangle set.  Shares the _PAIRS_EDGES pair definition.
        "dupgraph_triangles": f"""
            WITH {_SHINGLES},
            {_PAIRS_EDGES},
            tri AS (
              SELECT e1.a AS u, e1.b AS v, e2.b AS w
              FROM pairs e1
              JOIN pairs e2 ON e2.a = e1.b
              JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b),
            tn AS (
              SELECT node, count(*)::BIGINT AS n_tri FROM (
                SELECT u AS node FROM tri
                UNION ALL SELECT v FROM tri
                UNION ALL SELECT w FROM tri)
              GROUP BY node),
            deg AS (
              SELECT node, count(*)::BIGINT AS degree FROM (
                SELECT a AS node FROM pairs
                UNION ALL SELECT b FROM pairs)
              GROUP BY node)
            SELECT d.node AS doc_id, d.degree,
                   coalesce(tn.n_tri, 0)::BIGINT AS n_tri,
                   CASE WHEN d.degree >= 2 THEN
                     round(2.0 * coalesce(tn.n_tri, 0)
                           / (d.degree * (d.degree - 1))::DOUBLE, 6)
                   ELSE 0.0 END AS clust
            FROM deg d LEFT JOIN tn ON tn.node = d.node
            ORDER BY doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_SHINGLES},
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
              FROM sh x JOIN sh y
                ON x.shingle = y.shingle AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT a, b,
                   round(i / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.5
        """,
        "embedding_neardup": f"""
            SELECT * FROM (
              SELECT x.vec_id AS a, y.vec_id AS b,
                     round({_COS.format(a="x.embedding::DOUBLE[]",
                                        b="y.embedding::DOUBLE[]")}, 5)
                       AS cosine
              FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
            ) WHERE cosine >= 0.4
        """,
        "ann_ivf_topk": f"""
            WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings),
            cent AS (SELECT vec_id AS cid, v AS cv FROM emb
                     WHERE vec_id % 50 = 0),
            scored AS (
              SELECT e.vec_id, e.v, c.cid,
                     {_COS.format(a="e.v", b="c.cv")} AS ccos
              FROM emb e CROSS JOIN cent c
            ),
            assigned AS (
              SELECT vec_id, v, cid FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
                FROM scored) WHERE rn = 1
            ),
            q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
            probes AS (
              SELECT cid FROM cent CROSS JOIN q
              ORDER BY {_COS.format(a="qv", b="cv")} DESC, cid
              LIMIT 3
            )
            SELECT a.vec_id,
                   round({_COS.format(a="a.v", b="q.qv")}, 5) AS cosine
            FROM assigned a JOIN probes USING (cid) CROSS JOIN q
            WHERE a.vec_id != 0
            ORDER BY cosine DESC, a.vec_id LIMIT 10
        """,
        # filtered vector search (ops/vectors.ann_filtered_topk):
        # probes chosen by query geometry alone, label predicate drops
        # candidates before rescoring, survivor cosines unchanged
        "ann_filtered_topk": f"""
            WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
                         FROM embeddings),
            cent AS (SELECT vec_id AS cid, v AS cv FROM emb
                     WHERE vec_id % 50 = 0),
            scored AS (
              SELECT e.vec_id, e.label, e.v, c.cid,
                     {_COS.format(a="e.v", b="c.cv")} AS ccos
              FROM emb e CROSS JOIN cent c
            ),
            assigned AS (
              SELECT vec_id, label, v, cid FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
                FROM scored) WHERE rn = 1
            ),
            q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
            probes AS (
              SELECT cid FROM cent CROSS JOIN q
              ORDER BY {_COS.format(a="qv", b="cv")} DESC, cid
              LIMIT 3
            )
            SELECT a.vec_id, a.label::BIGINT AS label,
                   round({_COS.format(a="a.v", b="q.qv")}, 5) AS cosine
            FROM assigned a JOIN probes USING (cid) CROSS JOIN q
            WHERE a.vec_id != 0
              AND a.label IN {tuple(_ANN_FILTER_LABELS)}
            ORDER BY cosine DESC, a.vec_id LIMIT 10
        """,
        # recall@10 of the stride-IVF search vs the exact ranking, per
        # query (vec_id % 25): both rankings use the pinned round-5
        # cosine + (cosine desc, vec_id) tie-break so the rank-k cut is
        # engine-identical (ops/vectors.ann_recall)
        "ann_recall": f"""
            WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings),
            cent AS (SELECT vec_id AS cid, v AS cv FROM emb
                     WHERE vec_id % 50 = 0),
            scored AS (
              SELECT e.vec_id, e.v, c.cid,
                     {_COS.format(a="e.v", b="c.cv")} AS ccos
              FROM emb e CROSS JOIN cent c
            ),
            assigned AS (
              SELECT vec_id, v, cid FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
                FROM scored) WHERE rn = 1
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM emb
                  WHERE vec_id % 25 = 0),
            pr AS (
              SELECT q.qid, c.cid,
                     {_COS.format(a="q.qv", b="c.cv")} AS qcos
              FROM q CROSS JOIN cent c
            ),
            probes AS (
              SELECT qid, cid FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY qcos DESC, cid) AS rn
                FROM pr) WHERE rn <= 3
            ),
            ivf_sc AS (
              SELECT p.qid, a.vec_id,
                     round({_COS.format(a="a.v", b="q.qv")}, 5) AS cosine
              FROM assigned a JOIN probes p USING (cid)
              JOIN q ON q.qid = p.qid
              WHERE a.vec_id != p.qid
            ),
            ivf_k AS (
              SELECT qid, vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
                FROM ivf_sc) WHERE rn <= 10
            ),
            ex_sc AS (
              SELECT q.qid, e.vec_id,
                     round({_COS.format(a="e.v", b="q.qv")}, 5) AS cosine
              FROM emb e CROSS JOIN q
              WHERE e.vec_id != q.qid
            ),
            ex_k AS (
              SELECT qid, vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
                FROM ex_sc) WHERE rn <= 10
            ),
            hits AS (
              SELECT i.qid, count(*) AS n_hits
              FROM ivf_k i JOIN ex_k x
                ON x.qid = i.qid AND x.vec_id = i.vec_id
              GROUP BY i.qid
            )
            SELECT q.qid AS query_vec_id,
                   coalesce(h.n_hits, 0)::BIGINT AS n_hits,
                   round(coalesce(h.n_hits, 0) / 10, 6) AS recall
            FROM q LEFT JOIN hits h ON h.qid = q.qid
        """,
        # nprobe↔recall tradeoff curve (ops/vectors.ann_recall_curve):
        # one-pass monotone-membership argument (docstring) — a truth
        # top-k vector enters ivf-topk(p) iff its cell's probe rank
        # <= p; exact integer hit counts, one round-6 division/point
        "ann_recall_curve": f"""
            WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v
                         FROM embeddings),
            cent AS (SELECT vec_id AS cid, v AS cv FROM emb
                     WHERE vec_id % 50 = 0),
            scored AS (
              SELECT e.vec_id, e.v, c.cid,
                     {_COS.format(a="e.v", b="c.cv")} AS ccos
              FROM emb e CROSS JOIN cent c
            ),
            assigned AS (
              SELECT vec_id, cid FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
                FROM scored) WHERE rn = 1
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM emb
                  WHERE vec_id % 25 = 0),
            pranks AS (
              SELECT qid, cid, row_number() OVER (
                       PARTITION BY qid ORDER BY qcos DESC, cid
                     ) AS prank
              FROM (
                SELECT q.qid, c.cid,
                       {_COS.format(a="q.qv", b="c.cv")} AS qcos
                FROM q CROSS JOIN cent c)
            ),
            ex_sc AS (
              SELECT q.qid, e.vec_id,
                     round({_COS.format(a="e.v", b="q.qv")}, 5) AS cosine
              FROM emb e CROSS JOIN q
              WHERE e.vec_id != q.qid
            ),
            ex_k AS (
              SELECT qid, vec_id FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
                FROM ex_sc) WHERE rn <= 10
            ),
            minp AS (
              SELECT x.qid, pr.prank
              FROM ex_k x
              JOIN assigned a ON a.vec_id = x.vec_id
              JOIN pranks pr ON pr.qid = x.qid AND pr.cid = a.cid
            ),
            nq AS (SELECT count(*)::BIGINT AS n FROM q),
            points AS (SELECT unnest(generate_series(
                         1, {_ANN_CURVE_MAX})) AS nprobe)
            SELECT p.nprobe::BIGINT AS nprobe,
                   round(
                     (SELECT count(*) FROM minp m
                      WHERE m.prank <= p.nprobe)::DOUBLE
                     / (nq.n * 10)::DOUBLE, 6) AS recall
            FROM points p CROSS JOIN nq
            ORDER BY nprobe
        """,
        # PQ codes: per-subspace nearest codebook entry (squared L2,
        # 6dp-rounded before the argmin, tie → lowest code) against the
        # fixed-stride codebook (ops/vectors.PQ_* constants — change
        # Spark and SQL together)
        "pq_codes": f"""
            WITH {_PQ_CTES}
            SELECT vec_id,
                   {", ".join(
                       f"max(CASE WHEN m = {m} THEN c END)::INT AS m{m}"
                       for m in range(8)
                   )}
            FROM coded GROUP BY vec_id
        """,
        # IVF-PQ ADC ranking: probe the stride-IVF lists (identical
        # CTEs to ann_ivf_topk), score candidates from the per-query
        # lookup table of subspace dot products — the quantized cosine
        # cos(q, x̂) with x̂ reconstructed from the codes
        "ann_ivf_pq_topk": f"""
            WITH {_PQ_CTES},
            {_PQ_ADC}
            SELECT vec_id, pq_score FROM adc
            ORDER BY pq_score DESC, vec_id LIMIT 10
        """,
        # IVF-PQ with exact reranking: ADC shortlists 32 candidates,
        # the shortlist alone is rescored with the exact round-5 cosine
        "ann_ivf_pq_rerank_topk": f"""
            WITH {_PQ_CTES},
            {_PQ_ADC},
            short AS (
              SELECT vec_id FROM adc
              ORDER BY pq_score DESC, vec_id LIMIT 32
            )
            SELECT s.vec_id,
                   round({_COS.format(a="e.v", b="q.qv")}, 5) AS cosine
            FROM short s JOIN emb e USING (vec_id) CROSS JOIN q
            ORDER BY cosine DESC, s.vec_id LIMIT 10
        """,
        "ann_ivf_pq_trained_topk": _pq_trained_oracle_sql(),
        "lang_id": f"""
            WITH toks AS ({_TOKS}),
            per AS (
              SELECT doc_id, {lang_score} FROM toks GROUP BY doc_id
            ),
            m AS (SELECT *, {lang_max} AS mx FROM per)
            SELECT d.doc_id,
                   coalesce({lang_case}, 'unknown') AS lang_pred
            FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
        """,
        "media_stats": """
            SELECT doc_id,
                   CASE lang
                     WHEN 'c' THEN 'text/x-c'
                     WHEN 'java' THEN 'text/x-java'
                     WHEN 'js' THEN 'text/javascript'
                     WHEN 'md' THEN 'text/markdown'
                     WHEN 'python' THEN 'text/x-python'
                     ELSE 'application/octet-stream' END AS media_type,
                   octet_length(encode(text)) AS n_bytes,
                   sha256(text) AS sha,
                   (octet_length(encode(text)) * 10)::int AS duration_ms
            FROM documents
        """,
        # the mapInPandas decode stub recomputed in SQL: big-endian
        # uint32 slices of sha256 / 2^32, rounded through float32 like
        # the array<float> schema (::REAL), widened back exactly
        "media_features": f"""
            SELECT doc_id,
                   CASE lang
                     WHEN 'c' THEN 'text/x-c'
                     WHEN 'java' THEN 'text/x-java'
                     WHEN 'js' THEN 'text/javascript'
                     WHEN 'md' THEN 'text/markdown'
                     WHEN 'python' THEN 'text/x-python'
                     ELSE 'application/octet-stream' END AS media_type,
                   octet_length(encode(text)) AS n_bytes,
                   {", ".join(
                       "((('0x' || substr(sha256(text), "
                       f"{8 * i + 1}, 8))::UBIGINT) / 4294967296.0)"
                       f"::REAL::DOUBLE AS f{i}"
                       for i in range(8)
                   )}
            FROM documents
        """,
        # duration-derived frame-sampling plan (decode-late explode);
        # floor() mirrors Spark's truncating double→int cast
        "media_frames": """
            WITH m AS (
              SELECT doc_id,
                     (octet_length(encode(text)) * 10)::INT AS duration_ms
              FROM documents
            ),
            n AS (SELECT doc_id,
                         greatest(1, floor(duration_ms / 1000.0)::INT) AS nf
                  FROM m)
            SELECT doc_id, i::INT AS frame_idx, (i * 1000)::INT AS t_ms
            FROM n, LATERAL (
              SELECT unnest(generate_series(0, nf - 1)) AS i
            ) g
        """,
        "token_counts": f"""
            WITH toks AS ({_TOKS}),
            per AS (
              SELECT doc_id, count(*) AS n_words,
                     sum(length(term))::BIGINT AS n_token_chars,
                     sum(ceil(length(term) / 4.0)::bigint)::BIGINT AS n_pieces_bpe
              FROM toks GROUP BY doc_id
            )
            -- ::BIGINT everywhere: DuckDB sum(INTEGER) yields HUGEINT which
            -- lands in pandas as float64 and breaks the driver's value hash
            SELECT d.doc_id, coalesce(n_words, 0)::BIGINT AS n_words,
                   coalesce(n_token_chars, 0)::BIGINT AS n_token_chars,
                   coalesce(n_pieces_bpe, 0)::BIGINT AS n_pieces_bpe
            FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
        """,
        "term_tf": f"""
            WITH toks AS ({_TOKS})
            SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        """,
        "doc_length": f"""
            WITH toks AS ({_TOKS})
            SELECT doc_id, count(DISTINCT term) AS total_tokens
            FROM toks GROUP BY doc_id
        """,
        "term_dict": f"""
            WITH toks AS ({_TOKS})
            SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
            FROM toks GROUP BY term
        """,
        "corpus_stats": f"""
            WITH toks AS ({_TOKS}),
            dl AS (SELECT doc_id, count(DISTINCT term) AS t FROM toks GROUP BY doc_id)
            SELECT (SELECT count(*) FROM dl) AS n_docs,
                   (SELECT count(DISTINCT term) FROM toks) AS n_terms,
                   (SELECT count(*) FROM toks) AS n_tokens,
                   (SELECT round(avg(t), 6) FROM dl) AS avgdl
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM documents GROUP BY sha256(text)
        """,
        # WARC adapter roundtrip (corpus/warc.py): byte length + md5
        # recomputed straight from documents — DuckDB strlen/md5 hash
        # the UTF-8 bytes, exactly the payload the fixture serialized
        "warc_roundtrip": """
            SELECT doc_id,
                   'http://' || source || '/doc/' || doc_id::VARCHAR
                     AS url,
                   strlen(text)::BIGINT AS n_bytes,
                   md5(text) AS content_md5
            FROM documents ORDER BY doc_id
        """,
        "bm25_topk": f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query', 'join']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score FROM scored WHERE nmatch = 3
            ORDER BY score DESC, doc_id LIMIT 10
        """,
        # boolean NOT: conjunctive BM25 minus docs containing any
        # excluded term (eligibility-only — stats stay corpus-global,
        # so surviving scores equal the unexcluded ones)
        "bm25_not_topk": f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            excl AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ('hash')),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score FROM scored
            WHERE nmatch = 2
              AND doc_id NOT IN (SELECT doc_id FROM excl)
            ORDER BY score DESC, doc_id LIMIT 10
        """,
        # total-hits counts, both modes (ops/textops.match_counts):
        # the batch twin of LocalSearcher.count — COUNT_TERMS pinned
        # in the module's oracle builder
        "match_counts": __import__(
            "searchengine_spark.ops.textops",
            fromlist=["match_counts_oracle_sql"],
        ).match_counts_oracle_sql(),
        # hashing-trick tf-idf featurization + cosine retrieval
        # (ops/textops.hashed_tfidf_topk): order-pinned folds end to
        # end; bucket = shared md5-u32 snippet mod HV_DIM
        "hashed_tfidf_topk": __import__(
            "searchengine_spark.ops.textops",
            fromlist=["hashed_tfidf_topk_oracle_sql"],
        ).hashed_tfidf_topk_oracle_sql(),
        # query-likelihood ranking, Dirichlet smoothing (ops/textops
        # .lm_dirichlet_topk): per term ln(1 + tf/(mu·cf/T)) +
        # ln(mu/(dl+mu)); dl = occurrence count (true LM length, NOT
        # the distinct-term quirk); conjunctive; round-6 after the sum
        "lm_dirichlet_topk": f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl
                   FROM tf GROUP BY doc_id),
            tot AS (SELECT sum(tf)::DOUBLE AS t_total FROM tf),
            qterms AS (SELECT unnest([{", ".join(
                "'" + t + "'" for t in LM_TERMS)}]) AS term),
            cf AS (SELECT term, sum(tf)::DOUBLE AS cf
                   FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln(1.0 + tf.tf
                             / ({repr(LM_MU)} * cf.cf / tot.t_total))
                          + ln({repr(LM_MU)} / (dl.dl + {repr(LM_MU)}))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN cf USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN tot
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score FROM scored
            WHERE nmatch = {len(LM_TERMS)}
            ORDER BY score DESC, doc_id LIMIT {LM_K}
        """,
        "lang_counts": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        """,
        "phrase_match": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            pos AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            )
            SELECT a.doc_id, count(*) AS n_occurrences
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
            WHERE a.term = 'table' AND b.term = 'hash'
            GROUP BY a.doc_id
            ORDER BY n_occurrences DESC, a.doc_id LIMIT 20
        """,
        "text_quality": f"""
            WITH toks AS ({_TOKS}),
            per AS (
              SELECT doc_id, count(*) AS n_tokens,
                     round(avg(length(term)), 6) AS avg_token_len,
                     round(sum(CASE WHEN term IN ('the','a','an','and','or','of',
                       'to','in','is','it','for','on','with','as','at','by','be',
                       'this','that','are') THEN 1 ELSE 0 END) / count(*), 6)
                       AS stopword_ratio
              FROM toks GROUP BY doc_id
            )
            SELECT per.doc_id, n_tokens, length(d.text) AS n_chars,
                   avg_token_len, stopword_ratio
            FROM per JOIN documents d ON per.doc_id = d.doc_id
        """,
        "doc_fingerprint": """
            SELECT doc_id,
                   md5(array_to_string(
                       regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')) AS fp
            FROM documents
        """,
        "repetition_stats": """
            WITH t AS (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                       FROM documents),
            g2 AS (SELECT doc_id, array_to_string(t[i: i+1], ' ') AS g
                   FROM t, LATERAL (SELECT unnest(
                     generate_series(1, len(t) - 1)) AS i) s),
            c2 AS (SELECT doc_id, g, count(*) AS c FROM g2
                   GROUP BY doc_id, g),
            a2 AS (SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)
                     AS f2 FROM c2 GROUP BY doc_id),
            g3 AS (SELECT doc_id, array_to_string(t[i: i+2], ' ') AS g
                   FROM t, LATERAL (SELECT unnest(
                     generate_series(1, len(t) - 2)) AS i) s),
            c3 AS (SELECT doc_id, g, count(*) AS c FROM g3
                   GROUP BY doc_id, g),
            a3 AS (SELECT doc_id,
                   sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / sum(c)
                     AS f3 FROM c3 GROUP BY doc_id)
            SELECT d.doc_id, round(coalesce(a2.f2, 0), 6) AS dup_frac_2,
                   round(coalesce(a3.f3, 0), 6) AS dup_frac_3
            FROM documents d LEFT JOIN a2 USING (doc_id)
                 LEFT JOIN a3 USING (doc_id)
            ORDER BY doc_id
        """,
        # scalar-quantization ANN (ops/vectors.ann_sq8_topk): SQ_*
        # interpolated — per-dim global ranges, uint8 codes, asymmetric
        # reconstruction cosine (round-6) shortlist, exact round-5
        # cosine rerank.  The approx/rerank arithmetic mirrors the
        # Spark expressions term for term (0.5::DOUBLE etc.)
        "ann_sq8_topk": f"""
            WITH dims AS (
              SELECT vec_id, i AS d, embedding[i]::DOUBLE AS v
              FROM embeddings, LATERAL (
                SELECT unnest(generate_series(1, len(embedding))) AS i) g),
            rng AS (SELECT d, min(v) AS lo, max(v) AS hi
                    FROM dims GROUP BY d),
            q AS (SELECT d, v AS qv FROM dims
                  WHERE vec_id = {_SQ_QV}),
            qn AS (SELECT sqrt(sum(qv * qv)) AS n FROM q),
            codes AS (
              SELECT vec_id, d, lo, hi,
                     (CASE WHEN hi = lo THEN 0
                           ELSE least(floor((v - lo)
                                  / ((hi - lo) / {float(_SQ_BINS)!r}::DOUBLE)),
                                {_SQ_BINS - 1})
                      END)::BIGINT AS code
              FROM dims JOIN rng USING (d)
              WHERE vec_id != {_SQ_QV}),
            recon AS (
              SELECT vec_id, d,
                     CASE WHEN hi = lo THEN lo
                          ELSE lo + (code + 0.5::DOUBLE)
                               * ((hi - lo) / {float(_SQ_BINS)!r}::DOUBLE)
                     END AS r
              FROM codes),
            ap AS (SELECT c.vec_id, sum(r * qv) AS num,
                          sum(r * r) AS nn
                   FROM recon c JOIN q USING (d) GROUP BY c.vec_id),
            short AS (
              SELECT vec_id,
                     round(num / (sqrt(nn) * (SELECT n FROM qn)), 6)
                       AS approx
              FROM ap ORDER BY approx DESC, vec_id LIMIT {_SQ_RERANK}),
            qv2 AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings
                    WHERE vec_id = {_SQ_QV})
            SELECT s.vec_id, s.approx,
                   round(list_dot_product(e.embedding::DOUBLE[], q2.qvec)
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(q2.qvec, q2.qvec))),
                         5) AS cosine
            FROM short s JOIN embeddings e USING (vec_id)
                 CROSS JOIN qv2 q2
            ORDER BY cosine DESC, s.vec_id LIMIT 10
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(
                     list_dot_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cosine
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != 0
            ORDER BY cosine DESC, e.vec_id LIMIT 10
        """,
    }
    # WAND is a lossless accelerator: same query, same oracle as the
    # exhaustive conjunctive BM25 — rank- and score-identity is the check
    d["wand_topk"] = d["bm25_topk"]
    # disjunctive (classic-WAND) variant: exhaustive OR scorer in SQL —
    # the conjunctive oracle minus its nmatch filter
    d["wand_or_topk"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query', 'join']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score FROM scored
            ORDER BY score DESC, doc_id LIMIT 10
        """
    # filtered search: same conjunctive scorer, eligibility restricted to
    # lang='en' docs AFTER scoring (per-doc scores don't depend on other
    # docs' eligibility; stats stay corpus-global by contract)
    d["wand_topk_filtered"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query', 'join']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score FROM scored
            WHERE nmatch = 3
              AND doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
            ORDER BY score DESC, doc_id LIMIT 10
        """
    # snippet enrichment: bm25_topk plus an 80-char window centered on
    # the first occurrence of the rarest query term (min df, tie lexic.)
    d["bm25_snippets"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query', 'join']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            ),
            top AS (
              SELECT doc_id, round(s, 6) AS score FROM scored
              WHERE nmatch = 3 ORDER BY score DESC, doc_id LIMIT 10
            ),
            rare AS (SELECT term FROM dft ORDER BY df, term LIMIT 1)
            SELECT t.doc_id, t.score,
                   substr(d.text,
                          greatest(1, strpos(lower(d.text), r.term) - 40),
                          80) AS snippet
            FROM top t JOIN documents d ON d.doc_id = t.doc_id
            CROSS JOIN rare r
            ORDER BY t.score DESC, t.doc_id
        """
    # a persisted IVF index must answer EXACTLY like the per-query
    # trained path — same oracle proves the build/serve split is pure
    # layout (the vector-side segments_topk_flat analogue)
    d["ann_ivf_persisted_topk"] = _ivf_kmeans_oracle_sql()
    # incremental IVF append: quantizer trained on the even vec_ids
    # (build half), one assignment pass over ALL vectors (build half +
    # appended half share the stored centroids) — append must change
    # when vectors arrived, never the answer
    d["ann_ivf_append_topk"] = _ivf_kmeans_oracle_sql(
        train_pred="vec_id % 2 = 0"
    )
    # full maintenance cycle: build evens + append odds (quantizer
    # trained on evens), tombstone vec_id % 7 = 3, compact — storage
    # churn must be invisible in surviving answers
    d["ann_ivf_maint_topk"] = _ivf_kmeans_oracle_sql(
        train_pred="vec_id % 2 = 0", serve_pred="vec_id % 7 != 3"
    )
    # hybrid retrieval: RRF over the bm25_topk and ann_cosine_topk
    # rankings (ranks over ROUNDED scores, doc_id tie-break, list depth
    # 50, rrf_k 60; absent rank encoded 0 — exactly textops.hybrid_rrf_topk)
    d["hybrid_rrf_topk"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl),
            qterms AS (SELECT unnest(['spark', 'query', 'join']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            ),
            lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY round(s, 6) DESC, doc_id)
                       AS bm25_rank
              FROM scored WHERE nmatch = 3
              QUALIFY bm25_rank <= 50
            ),
            q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                  WHERE vec_id = 0),
            cosall AS (
              SELECT e.vec_id AS doc_id,
                     round({_COS.format(a="e.embedding::DOUBLE[]", b="q.qv")},
                           5) AS cosine
              FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
            ),
            vec AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY cosine DESC, doc_id)
                       AS cos_rank
              FROM cosall
              QUALIFY cos_rank <= 50
            )
            SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                   coalesce(l.bm25_rank, 0)::BIGINT AS bm25_rank,
                   coalesce(v.cos_rank, 0)::BIGINT AS cos_rank,
                   round(coalesce(1.0 / (60 + l.bm25_rank), 0.0)
                         + coalesce(1.0 / (60 + v.cos_rank), 0.0), 6)
                     AS rrf_score
            FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
            ORDER BY rrf_score DESC, doc_id LIMIT 10
        """
    # duplicate clusters: exact transitive closure of the ngram_jaccard
    # pair graph via a recursive CTE — min reachable doc_id is the
    # cluster id (textops-side: iterative min-label propagation)
    d["dup_clusters"] = f"""
            WITH RECURSIVE {_SHINGLES},
            {_PAIRS_EDGES},
            reach AS (
              SELECT src AS node, src AS lab FROM edges
              UNION
              SELECT e.dst AS node, r.lab AS lab
              FROM reach r JOIN edges e ON e.src = r.node
            ),
            lab AS (
              SELECT node AS doc_id, min(lab) AS cluster_id
              FROM reach GROUP BY node
            )
            SELECT doc_id, cluster_id,
                   count(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM lab
        """
    # the unstemmed engine twins share one full-chain oracle; the on-disk
    # variant additionally proves write_index/fetch_postings end-to-end
    d["engine_topk_flat"] = _engine_flat_oracle_sql()
    d["engine_topk_ondisk_flat"] = d["engine_topk_flat"]
    # a segmented index must answer EXACTLY like the monolithic one —
    # same oracle proves the append/union/dedup machinery end-to-end
    d["segments_topk_flat"] = d["engine_topk_flat"]
    # index observability (segments._stats analogue): the TOTAL serving
    # row recomputed from the raw documents table — stored mergeinfo /
    # termdict metadata must agree with the data (2 generations, no
    # tombstones in the flat build; n_segments is config, interpolated)
    d["index_stats_flat"] = """
        WITH corpus AS (
          SELECT source AS repo,
                 'doc/' || doc_id::VARCHAR AS path,
                 substr(sha256(source || '|' || doc_id::VARCHAR), 1, 40)
                   AS cmt,
                 text AS content
          FROM documents
        ),
        ids AS (
          SELECT row_number() OVER (ORDER BY repo, path, cmt) AS docid,
                 content
          FROM corpus
        ),
        nonempty AS (
          SELECT * FROM ids
          WHERE length(regexp_replace(content, '\\s', '', 'g')) > 0
        ),
        alive AS (
          SELECT docid, content FROM (
            SELECT *, row_number() OVER (
              PARTITION BY sha256(content) ORDER BY docid) AS rk
            FROM nonempty) WHERE rk = 1
        ),
        toks AS (
          SELECT docid,
                 unnest(regexp_extract_all(lower(content), '[a-z0-9]+'))
                   AS term
          FROM alive
        ),
        tf AS (SELECT docid, term, count(*) AS tf FROM toks
               GROUP BY docid, term),
        dl AS (SELECT docid, count(*) AS total_tokens FROM tf
               GROUP BY docid)
        SELECT 2::BIGINT AS n_segments,
               (SELECT count(*) FROM corpus)::BIGINT AS n_total,
               (SELECT count(*) FROM alive)::BIGINT AS n_stored,
               0::BIGINT AS n_tombstoned,
               (SELECT count(*) FROM alive)::BIGINT AS n_live,
               (SELECT coalesce(sum(total_tokens), 0) FROM dl)::BIGINT
                 AS token_sum,
               round((SELECT coalesce(sum(total_tokens), 0) FROM dl)::DOUBLE
                     / (SELECT count(*) FROM alive)::DOUBLE, 6) AS avgdl,
               (SELECT count(DISTINCT term) FROM tf)::BIGINT AS n_terms
    """
    # stored-fields sidecar: the segmented index's stored/ parquet must
    # hold exactly the live survivors' content, byte-for-byte (sha256
    # on both engines); the live set is the flat chain's front half
    d["stored_fields"] = """
        WITH corpus AS (
          SELECT source AS repo,
                 'doc/' || doc_id::VARCHAR AS path,
                 substr(sha256(source || '|' || doc_id::VARCHAR), 1, 40)
                   AS cmt,
                 text AS content
          FROM documents
        ),
        ids AS (
          SELECT row_number() OVER (ORDER BY repo, path, cmt) AS docid,
                 content
          FROM corpus
        ),
        nonempty AS (
          SELECT * FROM ids
          WHERE length(regexp_replace(content, '\\s', '', 'g')) > 0
        ),
        alive AS (
          SELECT docid, content FROM (
            SELECT *, row_number() OVER (
              PARTITION BY sha256(content) ORDER BY docid) AS rk
            FROM nonempty) WHERE rk = 1
        )
        SELECT docid, sha256(content) AS content_sha FROM alive
    """
    # BM25F variant: same chain with the importance extraction + per-tag
    # multipliers live (proves the carried field machinery, not just
    # the constant-0 parity path)
    d["engine_topk_flat_bm25f"] = _engine_flat_oracle_sql(importance=True)
    # the on-disk BM25F twin serves the identical contract from the
    # importance-payload index format
    d["engine_topk_ondisk_bm25f"] = d["engine_topk_flat_bm25f"]
    # STEMMED full-chain twins: the same oracle with corpus + query
    # tokens routed through the interpolated Porter stem map (None →
    # rows-only when the test corpora are absent)
    _stem_chain = _engine_flat_oracle_sql(stem=True)
    if _stem_chain is not None:
        d["engine_topk_stem"] = _stem_chain
        d["engine_topk_ondisk_stem"] = _stem_chain
    # the FLAGSHIP itself: stem + hash-order ids + simhash-64 near-dup
    # + empty-edge-graph quality, all mirrored in SQL (hash/CRC maps
    # interpolated from parity-gated pure-Python implementations);
    # None → rows-only when any full-mode precondition fails
    _full_chain = _engine_flat_oracle_sql(full=True, with_url=True)
    if _full_chain is not None:
        d["engine_topk"] = _full_chain
        d["engine_topk_ondisk"] = _engine_flat_oracle_sql(full=True)
    d["embedding_neardup_lsh"] = _neardup_lsh_oracle_sql()
    # index-served phrase search must equal the text-derived operator —
    # one oracle proves both (and the stored positions payload with it)
    d["phrase_match_indexed"] = d["phrase_match"]
    d["ann_ivf_kmeans_topk"] = _ivf_kmeans_oracle_sql()
    d["ivf_stats"] = _ivf_stats_oracle_sql()
    # proximity ranking (positions consumer #2): conjunctive BM25 +
    # 1/(1+min pair distance) boost, recomputed from text in SQL
    d["proximity_topk"] = f"""
            WITH rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            ptoks AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM ptoks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens
                   FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                      FROM dl),
            qterms AS (SELECT unnest(['table', 'hash']) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            ),
            prox AS (
              SELECT a.doc_id, min(abs(a.pos - b.pos)) AS min_dist
              FROM ptoks a JOIN ptoks b
                ON a.doc_id = b.doc_id
               AND a.term = 'table' AND b.term = 'hash'
              GROUP BY a.doc_id
            )
            SELECT s.doc_id, p.min_dist,
                   round(s.s + 1.0 / (1 + p.min_dist), 6) AS score
            FROM scored s JOIN prox p USING (doc_id)
            WHERE s.nmatch = 2
            ORDER BY score DESC, s.doc_id LIMIT 10
        """
    # span-near ranking (ops/textops.span_near_topk, positions
    # consumer #3): conjunctive BM25 (explicit left-fold in term-list
    # order — the sequential-fold float contract; a bare sum() has no
    # pinned order at 3+ terms) + len(terms)/min_win tightness boost.
    # min_win via the brute-force anchor join: an optimal cover starts
    # at a query-term occurrence; for each anchor the tightest cover
    # ends at max over terms of (smallest pos >= anchor) — quadratic
    # at sf0.01 and the losslessness proof for the searchsorted kernel
    from searchengine_spark.ops.textops import (
        SPAN_NEAR_K as _SPN_K,
        SPAN_NEAR_TERMS as _SPN_T,
    )

    _spn_list = ", ".join(f"'{t}'" for t in _SPN_T)
    _spn_w = " + ".join(
        f"w{i}.w" for i in range(len(_SPN_T))
    )  # left-assoc fold in term order
    _spn_joins = "\n".join(
        f"            JOIN per w{i} ON w{i}.doc_id = dl.doc_id"
        f" AND w{i}.term = '{t}'"
        for i, t in enumerate(_SPN_T)
    )
    d["span_near_topk"] = f"""
            WITH rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            ptoks AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            ),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM ptoks GROUP BY doc_id, term),
            dl AS (SELECT doc_id, count(*) AS total_tokens
                   FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                      FROM dl),
            qterms AS (SELECT unnest([{_spn_list}]) AS term),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN qterms USING (term) GROUP BY term),
            per AS (
              SELECT tf.doc_id, tf.term,
                     ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens
                                                     / stats.avgdl)) AS w
              FROM tf JOIN qterms USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
            ),
            qpos AS (SELECT doc_id, pos, term
                     FROM ptoks JOIN qterms USING (term)),
            anchors AS (SELECT DISTINCT doc_id, pos FROM qpos),
            nxt AS (
              SELECT a.doc_id, a.pos AS p, q.term, min(q.pos) AS np
              FROM anchors a JOIN qpos q
                ON q.doc_id = a.doc_id AND q.pos >= a.pos
              GROUP BY a.doc_id, a.pos, q.term
            ),
            cover AS (
              SELECT doc_id, p, max(np) AS e
              FROM nxt GROUP BY doc_id, p
              HAVING count(DISTINCT term) = {len(_SPN_T)}
            ),
            win AS (SELECT doc_id, min(e - p + 1)::BIGINT AS min_win
                    FROM cover GROUP BY doc_id)
            SELECT dl.doc_id, win.min_win,
                   round(({_spn_w})
                         + {float(len(_SPN_T))!r}::DOUBLE / win.min_win,
                         6) AS score
            FROM dl
{_spn_joins}
            JOIN win ON win.doc_id = dl.doc_id
            ORDER BY score DESC, dl.doc_id LIMIT {_SPN_K}
        """
    # per-language heavy hitters / df histogram (ops/textops.py)
    from searchengine_spark.ops.textops import TOPTERMS_N

    d["top_terms_per_lang"] = f"""
            WITH toks AS ({_TOKS}),
            counts AS (
              SELECT d.lang, t.term, count(*)::BIGINT AS n_occurrences
              FROM toks t JOIN documents d USING (doc_id)
              GROUP BY d.lang, t.term
            )
            SELECT lang, term, n_occurrences, rank FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang
                ORDER BY n_occurrences DESC, term)::BIGINT AS rank
              FROM counts)
            WHERE rank <= {TOPTERMS_N}
            ORDER BY lang, rank
        """
    d["df_histogram"] = f"""
            WITH toks AS ({_TOKS}),
            dft AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                    FROM toks GROUP BY term)
            SELECT floor(log2(df))::BIGINT AS bucket,
                   count(*)::BIGINT AS n_terms,
                   min(df) AS min_df, max(df) AS max_df
            FROM dft GROUP BY 1 ORDER BY bucket
        """
    # MOSS winnowing (ops/dedup.winnow_fingerprints): per (doc, win)
    # argmin over (hex-hash asc, pos desc) — min-STRUCT in Spark,
    # row_number here (the strip_dup_spans precedent); hex order IS
    # unsigned numeric order
    from searchengine_spark.ops.dedup import (
        WINNOW_K,
        WINNOW_MAX_FP_DF,
        WINNOW_MIN_MATCHES,
        WINNOW_W,
    )

    _winnow_ctes = f"""rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            grams AS (
              SELECT doc_id, i AS pos,
                     substr(md5(array_to_string(
                       t[i : i + {WINNOW_K - 1}], ' ')), 1, 8) AS h,
                     len(t) - {WINNOW_K} + 1 AS ng
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(
                  1, len(t) - {WINNOW_K} + 1)) AS i) g
              WHERE len(t) >= {WINNOW_K}
            ),
            wins AS (
              SELECT doc_id, pos, h, wv.win
              FROM grams, LATERAL (
                SELECT unnest(generate_series(
                  greatest(1, pos - {WINNOW_W} + 1),
                  least(pos, ng - {WINNOW_W} + 1))) AS win) wv
            ),
            sel AS (
              SELECT doc_id, pos, h FROM (
                SELECT doc_id, win, pos, h,
                       row_number() OVER (
                         PARTITION BY doc_id, win
                         ORDER BY h, pos DESC) AS rn
                FROM wins)
              WHERE rn = 1
            )"""
    d["winnow_fingerprints"] = f"""
            WITH {_winnow_ctes}
            SELECT DISTINCT doc_id, pos::BIGINT AS pos, h AS fp
            FROM sel ORDER BY doc_id, pos
        """
    # MOSS candidate pairs: distinct fp VALUES per doc (set
    # semantics), hot-fp cap (df > WINNOW_MAX_FP_DF removed from every
    # doc's fp set — the jaccard max_shingle_df rule, default-on in
    # winnow_matches), self-join on fp, a < b, min-match floor
    d["winnow_matches"] = f"""
            WITH {_winnow_ctes},
            fps0 AS (SELECT DISTINCT doc_id, h AS fp FROM sel),
            fps AS (
              SELECT doc_id, fp FROM fps0
              WHERE fp NOT IN (
                SELECT fp FROM fps0 GROUP BY fp
                HAVING count(*) > {WINNOW_MAX_FP_DF})
            )
            SELECT x.doc_id AS a, y.doc_id AS b,
                   count(*)::BIGINT AS n_matches
            FROM fps x JOIN fps y
              ON x.fp = y.fp AND x.doc_id < y.doc_id
            GROUP BY x.doc_id, y.doc_id
            HAVING count(*) >= {WINNOW_MIN_MATCHES}
            ORDER BY n_matches DESC, a, b
        """
    # Gopher-rules quality gate (ops/textops.gopher_quality): all
    # ratios compare their ROUNDED values; zero-token docs fail the
    # word floor (false AND null = false, coalesced FALSE)
    from searchengine_spark.ops.textops import (
        GOPHER_MAX_BULLET_FRAC,
        GOPHER_MAX_ELLIPSIS_FRAC,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MEAN_LEN_HI,
        GOPHER_MEAN_LEN_LO,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOP_TERMS,
    )

    _gstop = ", ".join(f"'{t}'" for t in GOPHER_STOP_TERMS)
    d["gopher_quality"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            per AS (
              SELECT doc_id, sum(tf)::BIGINT AS n_words,
                     sum(tf * length(term))::BIGINT AS n_chars,
                     sum(CASE WHEN term IN ({_gstop}) THEN 1
                              ELSE 0 END)::BIGINT AS n_stop_hits
              FROM tf GROUP BY doc_id),
            feats AS (
              SELECT d.doc_id,
                     coalesce(per.n_words, 0)::BIGINT AS n_words,
                     per.n_chars AS n_chars,
                     coalesce(per.n_stop_hits, 0)::BIGINT
                       AS n_stop_hits,
                     length(text) - length(replace(text, '#', ''))
                       AS hcnt,
                     (length(text)
                      - length(replace(text, '...', ''))) / 3 AS ecnt,
                     string_split(text, chr(10)) AS ls
              FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id),
            m AS (
              SELECT doc_id, n_words, n_stop_hits,
                     CASE WHEN n_words > 0
                          THEN round(n_chars / n_words, 6)
                     END AS mean_word_len,
                     CASE WHEN n_words > 0
                          THEN round((hcnt + ecnt) / n_words, 6)
                     END AS symbol_ratio,
                     round(len(list_filter(ls,
                       x -> substr(ltrim(x), 1, 1) IN ('-', '*', '•')))
                       / len(ls), 6) AS bullet_frac,
                     round(len(list_filter(ls,
                       x -> ends_with(rtrim(x), '...')))
                       / len(ls), 6) AS ellipsis_frac
              FROM feats)
            SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                   bullet_frac, ellipsis_frac, n_stop_hits,
                   coalesce(n_words >= {GOPHER_MIN_WORDS}
                            AND n_words <= {GOPHER_MAX_WORDS}
                            AND mean_word_len >= {repr(GOPHER_MEAN_LEN_LO)}
                            AND mean_word_len <= {repr(GOPHER_MEAN_LEN_HI)}
                            AND symbol_ratio
                                <= {repr(GOPHER_MAX_SYMBOL_RATIO)}
                            AND bullet_frac
                                <= {repr(GOPHER_MAX_BULLET_FRAC)}
                            AND ellipsis_frac
                                <= {repr(GOPHER_MAX_ELLIPSIS_FRAC)}
                            AND n_stop_hits >= {GOPHER_MIN_STOP_HITS},
                            FALSE) AS passes
            FROM m ORDER BY doc_id
        """
    # lift-scored significant terms (ops/textops.significant_terms):
    # lift = (fg·T_corpus)/(T_lang·bg), all integer counts → the
    # pre-round double is identical across engines
    from searchengine_spark.ops.textops import (
        KWIC_LIMIT,
        KWIC_TERM,
        KWIC_W,
        SIG_MIN_COUNT,
        SIG_TOPN,
    )

    d["significant_terms"] = f"""
            WITH toks AS ({_TOKS}),
            lt AS (SELECT t.doc_id, d.lang, t.term
                   FROM toks t JOIN documents d USING (doc_id)),
            fg AS (SELECT lang, term, count(*) AS n_fg
                   FROM lt GROUP BY lang, term),
            bg AS (SELECT term, count(*) AS n_bg FROM lt GROUP BY term),
            tl AS (SELECT lang, count(*) AS t_lang FROM lt GROUP BY lang),
            tc AS (SELECT count(*) AS t_corpus FROM lt),
            scored AS (
              SELECT lang, term, n_fg,
                     round((n_fg * t_corpus) / (t_lang * n_bg), 6) AS lift
              FROM fg JOIN bg USING (term) JOIN tl USING (lang)
                   CROSS JOIN tc
              WHERE n_fg >= {SIG_MIN_COUNT}
            )
            SELECT lang, term, n_fg::BIGINT AS n_fg, lift, rank
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY lang
                ORDER BY lift DESC, term)::BIGINT AS rank
              FROM scored)
            WHERE rank <= {SIG_TOPN}
            ORDER BY lang, rank
        """
    # keyword-in-context (ops/textops.kwic): 1-based pos on both
    # engines; DuckDB array_to_string([]) is NULL — coalesce to ''
    # to match Spark's array_join
    d["kwic"] = f"""
            WITH rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            hits AS (
              SELECT doc_id, t, i AS pos
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
              WHERE t[i] = '{KWIC_TERM}')
            SELECT doc_id, pos::BIGINT AS pos,
                   coalesce(array_to_string(
                     t[greatest(1, pos - {KWIC_W}) : pos - 1], ' '),
                     '') AS left_ctx,
                   coalesce(array_to_string(
                     t[pos + 1 : least(len(t), pos + {KWIC_W})], ' '),
                     '') AS right_ctx
            FROM hits
            ORDER BY doc_id, pos LIMIT {KWIC_LIMIT}
        """
    # Zoekt-style substring search (ops/textops.substring_search): the
    # oracle is the brute-force containment scan over the raw text —
    # equality proves the trigram candidate pruning lossless
    from searchengine_spark.ops.textops import SUBSTR_K, SUBSTR_Q

    _sq = SUBSTR_Q.lower()
    d["substring_search"] = f"""
            SELECT doc_id,
                   ((length(lower(text))
                     - length(replace(lower(text), '{_sq}', '')))
                    / {len(_sq)})::BIGINT AS n_occurrences
            FROM documents
            WHERE contains(lower(text), '{_sq}')
            ORDER BY n_occurrences DESC, doc_id LIMIT {SUBSTR_K}
        """
    # the persisted-shard path serves the identical contract
    d["substring_search_persisted"] = d["substring_search"]
    # regex search (ops/textops.regex_search): brute-force regex scan —
    # equality proves the literal-run trigram pruning lossless.  The
    # pinned pattern stays inside the Java-regex/RE2-identical subset.
    from searchengine_spark.ops.textops import REGEX_K, REGEX_Q

    d["regex_search"] = f"""
            SELECT doc_id,
                   len(regexp_extract_all(
                       lower(text), '{REGEX_Q.lower()}'))::BIGINT
                     AS n_matches
            FROM documents
            WHERE regexp_matches(lower(text), '{REGEX_Q.lower()}')
            ORDER BY n_matches DESC, doc_id LIMIT {REGEX_K}
        """
    d["regex_search_persisted"] = d["regex_search"]
    # alternation pattern (ops/textops.regex_alt_search): branch-union
    # trigram pruning vs the same brute-force scan — RE2 and Java both
    # use leftmost-first alternation, so the counts agree
    from searchengine_spark.ops.textops import REGEX_ALT_Q

    d["regex_alt_search"] = f"""
            SELECT doc_id,
                   len(regexp_extract_all(
                       lower(text), '{REGEX_ALT_Q.lower()}'))::BIGINT
                     AS n_matches
            FROM documents
            WHERE regexp_matches(lower(text), '{REGEX_ALT_Q.lower()}')
            ORDER BY n_matches DESC, doc_id LIMIT {REGEX_K}
        """
    d["regex_alt_search_persisted"] = d["regex_alt_search"]
    # sloppy ordered phrase (ops/textops.phrase_slop): the oracle is the
    # explicit ordered pair join — brute force at sf0.01, proving the
    # searchsorted window-count kernel lossless
    from searchengine_spark.ops.textops import (
        PHRASE_SLOP,
        SLOP_K,
        SLOP_TERMS,
    )

    d["phrase_slop"] = f"""
            WITH rawtoks AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS t
              FROM documents),
            pos AS (
              SELECT doc_id, i AS pos, t[i] AS term
              FROM rawtoks, LATERAL (
                SELECT unnest(generate_series(1, len(t))) AS i) g
            )
            SELECT a.doc_id, count(*)::BIGINT AS n_windows
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id
             AND b.pos > a.pos AND b.pos <= a.pos + {PHRASE_SLOP + 1}
            WHERE a.term = '{SLOP_TERMS[0]}' AND b.term = '{SLOP_TERMS[1]}'
            GROUP BY a.doc_id
            ORDER BY n_windows DESC, a.doc_id LIMIT {SLOP_K}
        """
    # spell-corrected search (ops/textops.corrected_topk): brute-force
    # lev<=1 correction (proving the symmetric-delete pruning lossless)
    # feeding the standard conjunctive-BM25 chain over corrected terms
    from searchengine_spark.ops.textops import (
        CORR_BASE_TERMS,
        CORR_K,
        CORR_PROBES,
        FUZZY_MIN_LEN as _C_MINLEN,
    )

    _corr_base = ", ".join(f"'{t}'" for t in CORR_BASE_TERMS)
    d["corrected_topk"] = f"""
            WITH toks AS ({_TOKS}),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
            dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                     FROM toks GROUP BY term),
            probes AS (
              SELECT DISTINCT substr(term, 1, 1) || substr(term, 3) AS q
              FROM (SELECT term FROM dict
                    WHERE length(term) >= {_C_MINLEN}
                    ORDER BY df DESC, term LIMIT {CORR_PROBES})
            ),
            qraw AS (
              SELECT DISTINCT q FROM (
                SELECT unnest([{_corr_base}]) AS q UNION ALL
                SELECT q FROM probes)
            ),
            cand AS (
              SELECT p.q, d.term, d.df,
                     levenshtein(p.q, d.term)::BIGINT AS dist
              FROM qraw p CROSS JOIN dict d
              WHERE levenshtein(p.q, d.term) <= 1
            ),
            corrected AS (
              SELECT DISTINCT term FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY q ORDER BY dist, df DESC, term) AS rn
                FROM cand)
              WHERE rn = 1
            ),
            dl AS (SELECT doc_id, count(*) AS total_tokens
                   FROM tf GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                      FROM dl),
            dft AS (SELECT term, count(DISTINCT doc_id) AS df
                    FROM tf JOIN corrected USING (term) GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum( ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
                          * tf.tf * 2.2
                          / (tf.tf + 1.2 * (0.25 + 0.75 * dl.total_tokens / stats.avgdl))
                     ) AS s,
                     count(*) AS nmatch
              FROM tf JOIN corrected USING (term) JOIN dft USING (term)
                   JOIN dl USING (doc_id) CROSS JOIN stats
              GROUP BY tf.doc_id
            )
            SELECT doc_id, round(s, 6) AS score
            FROM scored
            WHERE nmatch = (SELECT count(*) FROM corrected)
            ORDER BY score DESC, doc_id LIMIT {CORR_K}
        """
    # query-surface family: oracles built by ops/search.py from the SAME
    # pinned constants the Spark ops default to (they cannot desync)
    from searchengine_spark.ops import search as SRCH

    d["prefix_topk"] = SRCH.prefix_topk_oracle_sql()
    d["facet_counts"] = SRCH.facet_counts_oracle_sql()
    # AND-with-OR-fallback tiering and minimum_should_match: both rank
    # from the conjunctive scorer WITHOUT its nmatch filter (scored0) —
    # scores identical across tiers, eligibility-only semantics
    d["relaxed_topk"] = SRCH.relaxed_topk_oracle_sql()
    d["msm_topk"] = SRCH.msm_topk_oracle_sql()
    d["diversified_topk"] = SRCH.diversified_topk_oracle_sql()
    d["synonym_topk"] = SRCH.synonym_topk_oracle_sql()
    d["query_topk"] = SRCH.query_topk_oracle_sql()
    d["query_source_topk"] = SRCH.query_topk_oracle_sql(
        q=SRCH.QL_QUERY_SOURCE
    )
    d["query_or_topk"] = SRCH.query_topk_oracle_sql(q=SRCH.QL_QUERY_OR)
    d["query_or_filter_topk"] = SRCH.query_topk_oracle_sql(
        q=SRCH.QL_QUERY_OR_FILTER
    )
    d["query_boost_topk"] = SRCH.query_topk_oracle_sql(
        q=SRCH.QL_QUERY_BOOST
    )
    d["query_or_not_topk"] = SRCH.query_topk_oracle_sql(
        q=SRCH.QL_QUERY_OR_NOT
    )
    d["query_or_boost_topk"] = SRCH.query_topk_oracle_sql(
        q=SRCH.QL_QUERY_OR_BOOST
    )
    d["related_terms"] = SRCH.related_terms_oracle_sql()
    d["suffix_topk"] = SRCH.suffix_topk_oracle_sql()
    d["search_after_topk"] = SRCH.search_after_topk_oracle_sql()
    d["explain_score"] = SRCH.explain_score_oracle_sql()
    d["percolate"] = SRCH.percolate_oracle_sql()
    d["percolate_rich"] = SRCH.percolate_rich_oracle_sql()
    d["percolate_or"] = SRCH.percolate_or_oracle_sql()
    # passage/chunk family: oracles built from the same pinned constants
    from searchengine_spark.ops import passages as PSGO

    d["chunk_docs"] = PSGO.chunk_docs_oracle_sql()
    d["passage_topk"] = PSGO.passage_topk_oracle_sql()
    d["window_snippets"] = PSGO.window_snippets_oracle_sql()
    d["highlight_topk"] = PSGO.highlight_topk_oracle_sql()
    d["dup_chunks"] = PSGO.dup_chunks_oracle_sql()
    from searchengine_spark.ops.prep import pack_sequences_oracle_sql

    d["pack_sequences"] = pack_sequences_oracle_sql()
    from searchengine_spark.ops.bpe import (
        bpe_encode_oracle_sql,
        bpe_fertility_oracle_sql,
        bpe_train_oracle_sql,
    )

    d["bpe_train"] = bpe_train_oracle_sql()
    d["bpe_encode"] = bpe_encode_oracle_sql()
    d["bpe_fertility"] = bpe_fertility_oracle_sql()
    # stemmed conjunctive BM25: the stem map is interpolated (DuckDB
    # has no Porter) — None when the test corpora are absent, in which
    # case the entry stays rows-only
    _stem_sql = _stemmed_topk_oracle_sql()
    if _stem_sql is not None:
        d["stemmed_topk"] = _stem_sql
    return d
