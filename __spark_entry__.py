"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end engine (corpus ingest →
dedup → postings → PageRank/HITS → batch BM25 top-k) on the sf0.001
``documents`` table mapped into the input_hint corpus shape.

``queries()`` / ``oracle_sql()`` expose SQL-checkable operators from
SURVEY.md §2 over the driver's parquet tables; each pair is
semantically identical Spark-vs-DuckDB (same tokenizer regex, same
literals, same rounding, same column names).  Engine paths that depend
on Porter stemming are verified against the in-repo Python oracle by
pytest instead (DuckDB's stemmer is unavailable offline); ``engine_topk``
is exposed rows-only here.
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
        _TABLES_CACHE[sf_dir] = build_tables(
            spark, corpus, compute_quality=True
        )
    return _TABLES_CACHE[sf_dir]


def _run_engine(spark: SparkSession, sf_dir: str, queries, k=10) -> DataFrame:
    from searchengine_spark.query.scoring import score_queries

    tables = _engine_tables(spark, sf_dir)
    res = score_queries(spark, queries, tables, k=k)
    urls = tables.docs.select("docid", "url")
    return res.join(urls, "docid").select("qid", "rank", "docid", "url", "score")


def _run_engine_ondisk(spark: SparkSession, sf_dir: str, queries, k=10) -> DataFrame:
    """Full north-rule pipeline: corpus → build → compressed on-disk index
    (resumable, salted) → blended top-k served from the shards."""
    import hashlib
    import os
    import tempfile

    from searchengine_spark.index.shards import load_index, write_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    tables = _engine_tables(spark, sf_dir)
    d = os.path.join(
        tempfile.gettempdir(),
        "searchengine_spark_idx",
        "engine_" + hashlib.md5(sf_dir.encode()).hexdigest()[:16],
    )
    write_index(spark, tables, d)  # stage-skipping: cheap when complete
    shards = load_index(spark, d)
    return score_queries_ondisk(spark, queries, shards, k=k).select(
        "qid", "rank", "docid", "score"
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _run_engine(spark, SF0001, FLAGSHIP_QUERIES, k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from searchengine_spark.ops import textops as T
    from searchengine_spark.ops import vectors as V
    from searchengine_spark.ops import dedup as D
    from searchengine_spark.ops import multimodal as M

    def _docs(spark, sf):
        return spark.read.parquet(f"{sf}/documents.parquet")

    return {
        "dedup_minhash": lambda spark, sf: D.minhash_pairs(_docs(spark, sf)),
        "ngram_jaccard": lambda spark, sf: D.jaccard_pairs(
            _docs(spark, sf), threshold=0.5
        ),
        "embedding_neardup": V.embedding_neardup,
        "ann_ivf_topk": V.ann_ivf_topk,
        "lang_id": T.lang_id,
        "token_counts": T.token_counts,
        "media_stats": M.media_stats,
        "term_tf": T.term_tf,
        "doc_length": T.doc_length,
        "term_dict": T.term_dict,
        "corpus_stats": T.corpus_stats,
        "dedup_exact": T.dedup_exact,
        "bm25_topk": T.bm25_topk,
        "wand_topk": T.wand_topk,
        "lang_counts": T.lang_counts,
        "phrase_match": T.phrase_match,
        "text_quality": T.text_quality,
        "doc_fingerprint": T.doc_fingerprint,
        "ann_cosine_topk": T.ann_cosine_topk,
        "engine_topk": lambda spark, sf: _run_engine(
            spark, sf, FLAGSHIP_QUERIES, k=10
        ),
        "engine_topk_ondisk": lambda spark, sf: _run_engine_ondisk(
            spark, sf, FLAGSHIP_QUERIES, k=10
        ),
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


def oracle_sql() -> dict[str, str]:
    from searchengine_spark.ops.textops import LANG_MARKERS

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

    d = {
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
    return d
