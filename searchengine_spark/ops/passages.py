"""Passage/chunk family: RAG-style chunking, passage-level retrieval,
and positions-based best-window snippets ([NORTH-EXT]).

A training-data pipeline over a 100 TB corpus retrieves at PASSAGE
granularity, not document granularity: documents are split into
overlapping token windows (the RAG chunking step), passages are scored
as pseudo-documents with their own df/avgdl statistics, and served hits
carry the best query-term window as the snippet.  The reference stops
at whole-document BM25 (lib/queryproc.py:74); this module adds the
passage layer as compositions of the oracled token/TF kernels, keeping
the one BM25 definition (params.BM25_K1/B) and the rounded-rank
contract shared with ops/search.py.

Scale shape (100 TB framing): chunk membership is a per-token explode
of at most ceil(w/stride) chunk ids — a constant-factor row expansion,
the same recompute-don't-persist shape as the span-dedup windows
(ops/dedup.py).  Passage TF/DF/stats are shuffle-on-key aggregations
identical in form to the document-level build.  The snippet window
enumeration self-joins only the QUERY-TERM match positions per doc
(bounded by per-doc query-term tf, not doc length); full-text token
joins happen only for the k surviving docs.

Oracle contract: the pinned constants below are interpolated into the
DuckDB oracles by the ``*_oracle_sql`` builders — ops and oracles share
one definition and cannot desync; changing a constant changes BOTH
engines' driver rows (the ops/search.py rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..text.tokenizer import TOKEN_PATTERN
from .search import _BM25_SQL, _SCORE_BASE, _bm25_col, _conj_scored_sql
from .textops import _bm25_scored, doc_tokens, documents

__all__ = [
    "chunk_docs", "passage_topk", "window_snippets", "highlight_topk",
    "dup_chunks",
    "chunk_docs_oracle_sql", "passage_topk_oracle_sql",
    "window_snippets_oracle_sql", "highlight_topk_oracle_sql",
    "dup_chunks_oracle_sql",
]

# --- pinned driver-entry constants (interpolated into the oracles) --------
CHUNK_W = 16          # chunk width in tokens
CHUNK_STRIDE = 8      # chunk start stride (w/2 -> 2x overlap)
PASSAGE_TERMS = ("spark", "join")
PASSAGE_K = 10
SNIPPET_TERMS = ("spark", "join")
SNIPPET_W = 12        # snippet window width in tokens
SNIPPET_K = 10


def chunk_tokens_from(toks: DataFrame, w=CHUNK_W,
                      stride=CHUNK_STRIDE) -> DataFrame:
    """(doc_id, chunk_id, pos, term) from a (doc_id, pos, term) token
    DataFrame: every token mapped to the chunks whose window
    [1+c*stride, c*stride+w] contains it.

    The membership range is computed arithmetically per token —
    c_lo = ceil((pos-w)/stride) clamped at 0, c_hi = (pos-1) div stride
    — and exploded as a sequence of at most ceil(w/stride) ids, so the
    expansion is a constant factor of the token count regardless of
    document length (no per-doc ntokens join is needed: a chunk id is
    generated iff some token falls in its window, and the token at the
    chunk's start position always does)."""
    c_lo = F.expr(
        f"CASE WHEN pos <= {w} THEN 0L "
        f"ELSE (pos - {w} + {stride} - 1) div {stride} END"
    )
    c_hi = F.expr(f"(pos - 1) div {stride}")
    return toks.select(
        "doc_id", "pos", "term",
        F.explode(F.sequence(c_lo, c_hi)).alias("chunk_id"),
    )


def chunk_tokens(spark, sf_dir, w=CHUNK_W, stride=CHUNK_STRIDE) -> DataFrame:
    """chunk_tokens_from over the sf_dir documents table."""
    return chunk_tokens_from(doc_tokens(spark, sf_dir), w, stride)


def chunk_docs(spark, sf_dir, w=CHUNK_W, stride=CHUNK_STRIDE) -> DataFrame:
    """Deterministic overlapping token-window chunking — the RAG
    ingestion step.  One row per (doc, chunk): start position, token
    count, and the chunk text re-joined from tokens in position order
    (array_sort on (pos, term) structs makes the agg order-insensitive
    and therefore partition-count invariant)."""
    ct = chunk_tokens(spark, sf_dir, w, stride)
    return (
        ct.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, term))), s -> s.term), ' ')"
            ).alias("chunk_text"),
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.lit(1) + F.col("chunk_id") * stride)
            .cast("long")
            .alias("start_pos"),
            "n_tokens",
            "chunk_text",
        )
        .orderBy("doc_id", "chunk_id")
    )


def _memb_sql(w, stride) -> str:
    """pos + chunk-membership CTEs (DuckDB) — the SQL mirror of
    chunk_tokens, shared by every oracle in this module."""
    return f"""
        pos AS (
          SELECT doc_id, i AS pos, t[i] AS term FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS i) g
        ),
        memb AS (
          SELECT doc_id, pos, term,
            unnest(generate_series(
              CASE WHEN pos <= {w} THEN 0
                   ELSE (pos - {w} + {stride} - 1) // {stride} END,
              (pos - 1) // {stride})) AS chunk_id
          FROM pos
        )
    """


def chunk_docs_oracle_sql(w=CHUNK_W, stride=CHUNK_STRIDE) -> str:
    return f"""
        WITH {_memb_sql(w, stride)}
        SELECT doc_id, chunk_id::BIGINT AS chunk_id,
               (1 + chunk_id * {stride})::BIGINT AS start_pos,
               count(*)::BIGINT AS n_tokens,
               string_agg(term, ' ' ORDER BY pos, term) AS chunk_text
        FROM memb GROUP BY doc_id, chunk_id
        ORDER BY doc_id, chunk_id
    """


def passage_topk(spark, sf_dir, terms=PASSAGE_TERMS, w=CHUNK_W,
                 stride=CHUNK_STRIDE, k=PASSAGE_K) -> DataFrame:
    """Passage-level conjunctive BM25: chunks are the pseudo-documents —
    tf per (doc, chunk, term), df = chunks containing the term, dl =
    the chunk's distinct-term count (the reference's total_tokens quirk
    kept at passage granularity), avgdl over all chunks.  A passage is
    eligible iff it contains EVERY query term; scores round(6), ranked
    (score desc, doc_id, chunk_id).

    Scale: identical aggregation shapes to the document-level scorer,
    just on (doc_id, chunk_id) keys — the chunk expansion multiplies
    rows by <= ceil(w/stride), and the query-term df/tf joins broadcast
    the query side exactly as _bm25_scored does."""
    ct = chunk_tokens(spark, sf_dir, w, stride)
    ptf = ct.groupBy("doc_id", "chunk_id", "term").agg(
        F.count("*").alias("tf")
    )
    pdl = ptf.groupBy("doc_id", "chunk_id").agg(
        F.count("*").alias("total_tokens")
    )
    stats = pdl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    dft = ptf.join(F.broadcast(qterms), "term").groupBy("term").agg(
        F.count("*").alias("df")
    )
    hits = (
        ptf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(pdl, ["doc_id", "chunk_id"])
        .crossJoin(F.broadcast(stats))
    )
    return (
        hits.withColumn("bm25", _bm25_col())
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("bm25").alias("s"), F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == len(terms))
        .select(
            "doc_id",
            "chunk_id",
            (F.lit(1) + F.col("chunk_id") * stride)
            .cast("long")
            .alias("start_pos"),
            F.round(F.col("s"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("chunk_id"))
        .limit(k)
    )


def passage_topk_oracle_sql(terms=PASSAGE_TERMS, w=CHUNK_W,
                            stride=CHUNK_STRIDE, k=PASSAGE_K) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH {_memb_sql(w, stride)},
        tf AS (SELECT doc_id, chunk_id, term, count(*) AS tf
               FROM memb GROUP BY doc_id, chunk_id, term),
        dl AS (SELECT doc_id, chunk_id, count(*) AS total_tokens
               FROM tf GROUP BY doc_id, chunk_id),
        stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl
                  FROM dl),
        qterms AS (SELECT unnest([{tlist}]) AS term),
        dft AS (SELECT term, count(*) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        scored AS (
          SELECT tf.doc_id, tf.chunk_id, sum({_BM25_SQL}) AS s,
                 count(*) AS nmatch
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id, chunk_id) CROSS JOIN stats
          GROUP BY tf.doc_id, tf.chunk_id
        )
        SELECT doc_id, chunk_id::BIGINT AS chunk_id,
               (1 + chunk_id * {stride})::BIGINT AS start_pos,
               round(s, 6) AS score
        FROM scored WHERE nmatch = {len(terms)}
        ORDER BY score DESC, doc_id, chunk_id LIMIT {k}
    """


def _best_windows(spark, sf_dir, terms, w, k) -> DataFrame:
    """(doc_id, score, win_start, n_terms, n_matches) — the snippet
    window rule shared by window_snippets (token-joined render) and
    highlight_topk (char-sliced render): among windows of ``w`` tokens
    anchored at each query-term match position of a top-k conjunctive
    hit, pick the one covering the most DISTINCT query terms (ties:
    more total matches, then earliest start).

    Scale: candidate starts are the query-term match positions (per-doc
    count = sum of query-term tf, independent of doc length), so the
    window self-join is tiny and doc-partitioned; full token/text rows
    are re-joined only for the k winners."""
    scored = _bm25_scored(spark, sf_dir, terms)
    # TakeOrderedAndProject (distributed top-k), not a global window;
    # (score desc, doc_id) is total so the k-set matches the oracle's
    # row_number rule exactly
    top = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "score")
    )
    toks = doc_tokens(spark, sf_dir)
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    matches = (
        toks.join(F.broadcast(qterms), "term")
        .join(F.broadcast(top.select("doc_id")), "doc_id")
        .select("doc_id", "pos", "term")
    )
    anchors = matches.select("doc_id", F.col("pos").alias("win_start"))
    # matches covers only the k winners' query-term positions — tiny;
    # broadcast both the window self-join and the token re-join sides
    wins = (
        anchors.join(F.broadcast(matches), "doc_id")
        .filter(
            (F.col("pos") >= F.col("win_start"))
            & (F.col("pos") < F.col("win_start") + w)
        )
        .groupBy("doc_id", "win_start")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("n_matches"),
        )
    )
    best = (
        wins.withColumn(
            "wr",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("n_terms"), F.desc("n_matches"),
                    F.asc("win_start"),
                )
            ),
        )
        .filter(F.col("wr") == 1)
        .drop("wr")
    )
    return best.join(top, "doc_id").select(
        "doc_id", "score", "win_start", "n_terms", "n_matches"
    )


def window_snippets(spark, sf_dir, terms=SNIPPET_TERMS, w=SNIPPET_W,
                    k=SNIPPET_K) -> DataFrame:
    """Positions-based best-window snippets for the top-k conjunctive
    hits (the ``_best_windows`` rule), returned as space-joined token
    text.  This is the token-window highlighter complementing
    bm25_snippets' char-window rule; highlight_topk renders the same
    window from the ORIGINAL text instead."""
    best = _best_windows(spark, sf_dir, terms, w, k)
    toks = doc_tokens(spark, sf_dir)
    return (
        toks.join(F.broadcast(best), "doc_id")
        .filter(
            (F.col("pos") >= F.col("win_start"))
            & (F.col("pos") < F.col("win_start") + w)
        )
        .groupBy("doc_id", "score", "win_start", "n_terms", "n_matches")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, term))), s -> s.term), ' ')"
            ).alias("snippet")
        )
        .select(
            "doc_id", "score", "win_start", "n_terms", "n_matches",
            "snippet",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def highlight_topk(spark, sf_dir, terms=SNIPPET_TERMS, w=SNIPPET_W,
                   k=SNIPPET_K) -> DataFrame:
    """Rendered-text snippets: the ``_best_windows`` window sliced out
    of the ORIGINAL document text (separators and casing preserved) —
    the batch twin of the serving-tier highlight() (query/serve_local.py),
    which renders the same window rule from the stored-fields sidecar.

    Char spans come from pure slice arithmetic over the tokenizer's
    complementary split — ``seps = split(lower(text), '[a-z0-9]+')``
    interleaves with ``toks = regexp_extract_all(...)`` as
    sep0 tok1 sep1 ... tokN sepN, so the 1-based char start of token k
    is len(sep0..sep(k-1)) + len(tok1..tok(k-1)) + 1 and the char end of
    token e is len(sep0..sep(e-1)) + len(tok1..tok(e)).  Both engines
    compute the identical expression (Spark slice/concat_ws vs DuckDB
    list_slice/array_to_string), entirely JVM-side here — no UDF.
    Original casing is sliced only when lowercasing preserved length
    (the serving-tier highlight rule); otherwise the lowered text is
    sliced so spans are always exact."""
    best = _best_windows(spark, sf_dir, terms, w, k)
    arr = (
        documents(spark, sf_dir)
        .select("doc_id", "text")
        .join(F.broadcast(best), "doc_id")
        .withColumn("lt", F.lower("text"))
        .withColumn(
            "toks",
            F.expr(f"regexp_extract_all(lt, '{TOKEN_PATTERN}', 0)"),
        )
        .withColumn("seps", F.expr(f"split(lt, '{TOKEN_PATTERN}', -1)"))
    )
    s = "cast(win_start as int)"
    e = f"cast(least(win_start + {w - 1}, size(toks)) as int)"
    c_start = (
        f"length(concat_ws('', slice(seps, 1, {s})))"
        f" + length(concat_ws('', slice(toks, 1, {s} - 1))) + 1"
    )
    c_end = (
        f"length(concat_ws('', slice(seps, 1, {e})))"
        f" + length(concat_ws('', slice(toks, 1, {e})))"
    )
    return (
        arr.select(
            "doc_id", "score", "win_start", "n_terms", "n_matches",
            F.expr(
                "substring("
                "CASE WHEN length(lt) = length(text) THEN text ELSE lt END, "
                f"{c_start}, ({c_end}) - ({c_start}) + 1)"
            ).alias("snippet"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _best_windows_sql(terms, w, k) -> str:
    """The CTE chain for ``_best_windows`` (through a ``bestw`` CTE of
    (doc_id, score, win_start, n_terms, n_matches)); callers prepend
    ``WITH {_SCORE_BASE}, {_conj_scored_sql(terms)},`` and append their
    render stage."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        top AS (
          SELECT doc_id, score FROM (
            SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
            FROM scored) WHERE rnk <= {k}
        ),
        pos AS (
          SELECT doc_id, i AS pos, t[i] AS term FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS i) g
        ),
        matches AS (
          SELECT pos.doc_id, pos.pos, pos.term
          FROM pos JOIN top USING (doc_id)
          WHERE pos.term IN ({tlist})
        ),
        wins AS (
          SELECT a.doc_id, a.pos AS win_start,
                 count(DISTINCT m.term)::BIGINT AS n_terms,
                 count(*)::BIGINT AS n_matches
          FROM matches a JOIN matches m ON a.doc_id = m.doc_id
               AND m.pos >= a.pos AND m.pos < a.pos + {w}
          GROUP BY a.doc_id, a.pos
        ),
        bestw AS (
          SELECT b.doc_id, t.score, b.win_start, b.n_terms, b.n_matches
          FROM (
            SELECT doc_id, win_start, n_terms, n_matches FROM (
              SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY n_terms DESC, n_matches DESC, win_start)
                     AS wr
              FROM wins) WHERE wr = 1) b
          JOIN top t USING (doc_id)
        )"""


def window_snippets_oracle_sql(terms=SNIPPET_TERMS, w=SNIPPET_W,
                               k=SNIPPET_K) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)},
        {_best_windows_sql(terms, w, k)}
        SELECT b.doc_id, b.score, b.win_start, b.n_terms, b.n_matches,
               string_agg(p.term, ' ' ORDER BY p.pos, p.term) AS snippet
        FROM bestw b
             JOIN pos p ON p.doc_id = b.doc_id
               AND p.pos >= b.win_start AND p.pos < b.win_start + {w}
        GROUP BY b.doc_id, b.score, b.win_start, b.n_terms, b.n_matches
        ORDER BY b.score DESC, b.doc_id
    """


def _char_span_exprs() -> tuple[str, str]:
    """The DuckDB char-span slice arithmetic mirrored from
    highlight_topk — the tokenizer split's seps/toks interleaving
    gives exact 1-based char offsets with no per-match position
    function on either engine; array_to_string of an empty slice is
    NULL in DuckDB, hence the coalesces.  Exposed for the hypothesis
    property test (tests/test_passages.py) so the oracle and the test
    share one definition."""
    c_start = (
        "coalesce(length(array_to_string(list_slice(seps, 1, s), '')), 0)"
        " + coalesce(length(array_to_string("
        "list_slice(toks, 1, s - 1), '')), 0) + 1"
    )
    c_end = (
        "coalesce(length(array_to_string(list_slice(seps, 1, e), '')), 0)"
        " + coalesce(length(array_to_string(list_slice(toks, 1, e), '')), 0)"
    )
    return c_start, c_end


def highlight_topk_oracle_sql(terms=SNIPPET_TERMS, w=SNIPPET_W,
                              k=SNIPPET_K) -> str:
    c_start, c_end = _char_span_exprs()
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)},
        {_best_windows_sql(terms, w, k)},
        arr0 AS (
          SELECT b.doc_id, b.score, b.win_start, b.n_terms, b.n_matches,
                 d.text, lower(d.text) AS lt,
                 regexp_extract_all(lower(d.text), '[a-z0-9]+') AS toks,
                 regexp_split_to_array(lower(d.text), '[a-z0-9]+') AS seps
          FROM bestw b JOIN documents d USING (doc_id)
        ),
        arr AS (
          SELECT *, win_start AS s,
                 least(win_start + {w - 1}, len(toks)) AS e
          FROM arr0
        )
        SELECT doc_id, score, win_start, n_terms, n_matches,
               substr(
                 CASE WHEN length(lt) = length(text)
                      THEN text ELSE lt END,
                 ({c_start})::BIGINT,
                 (({c_end}) - ({c_start}) + 1)::BIGINT
               ) AS snippet
        FROM arr ORDER BY score DESC, doc_id
    """


def dup_chunks(spark, sf_dir, w=CHUNK_W, stride=CHUNK_STRIDE) -> DataFrame:
    """Chunk-level exact dedup — the RAG-pipeline staple the span-dedup
    family covers at window granularity and dedup_exact covers at doc
    granularity: chunks whose token text repeats anywhere in the corpus,
    one row per duplicated fingerprint with the canonical copy
    (smallest (doc_id, chunk_id), the strip_dup_spans argmin rule,
    computed as a min-STRUCT agg — skew-safe, no window) and the copy
    count.  Feeds chunk-store dedup before embedding: embed each
    fingerprint once, not once per copy.

    Scale: one md5-keyed aggregation over the chunk rows — the
    exact-dedup shuffle shape at ceil(w/stride)× the token count."""
    ch = chunk_docs(spark, sf_dir, w, stride)
    return (
        ch.select(
            F.md5("chunk_text").alias("fp"), "doc_id", "chunk_id"
        )
        .groupBy("fp")
        .agg(
            F.min(F.struct("doc_id", "chunk_id")).alias("c"),
            F.count("*").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "fp",
            F.col("c.doc_id").alias("doc_id"),
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
        .orderBy("fp")
    )


def dup_chunks_oracle_sql(w=CHUNK_W, stride=CHUNK_STRIDE) -> str:
    return f"""
        WITH {_memb_sql(w, stride)},
        chunks AS (
          SELECT doc_id, chunk_id,
                 md5(string_agg(term, ' ' ORDER BY pos, term)) AS fp
          FROM memb GROUP BY doc_id, chunk_id
        ),
        ranked AS (
          SELECT fp, doc_id, chunk_id,
                 row_number() OVER (PARTITION BY fp
                   ORDER BY doc_id, chunk_id) AS rn,
                 count(*) OVER (PARTITION BY fp)::BIGINT AS n_copies
          FROM chunks
        )
        SELECT fp, doc_id, chunk_id, n_copies FROM ranked
        WHERE rn = 1 AND n_copies > 1
        ORDER BY fp
    """
