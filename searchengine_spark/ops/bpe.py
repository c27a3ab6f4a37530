"""BPE tokenizer training as a distributed job ([NORTH-EXT]).

Training a byte-pair-encoding vocabulary is the canonical
tokenizer-construction step of an LLM data pipeline, and it is
map-reduce-shaped: each merge step is one weighted pair-count
aggregation over the (vocabulary-sized) word-frequency table plus a
per-word symbol rewrite — never a pass over the raw corpus.  This
module trains ``BPE_STEPS`` merges over the engine's tokenizer output
and emits the merge table, the artifact a tokenizer ships.

Semantics (pinned, shared with the DuckDB oracle and the pure-Python
reference in tests):
 * words = the pinned regex tokens; per-word frequency from one corpus
   aggregation; symbols start as single characters (no end-of-word
   marker).
 * each step counts ADJACENT symbol pairs weighted by word frequency,
   merges the argmax pair (ties: count desc, lhs asc, rhs asc), and
   rewrites every word greedily left-to-right.
 * the greedy left-to-right rewrite equals the fold "merge when the
   accumulator's last symbol == lhs and the next == rhs": after a
   merge the accumulator ends with lhs||rhs, which can only equal lhs
   again in the lhs == rhs case — exactly the case where greedy also
   re-merges (aaaa -> aa aa) — so fold == scan.  Both engines
   implement that fold (Spark: aggregate() over the symbol array;
   DuckDB: list_reduce over a space-joined symbol string).

Scale shape: the corpus is touched ONCE (word frequencies); every
step's aggregation is over the vocabulary (10^7 rows at 100 TB, a
small shuffle), and only the 1-row argmax is collected per step — the
trained-k-means driver-loop pattern (ops/vectors.kmeans_centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import doc_tokens, documents

__all__ = ["bpe_train", "bpe_encode", "bpe_fertility",
           "bpe_train_oracle_sql", "bpe_encode_oracle_sql",
           "bpe_fertility_oracle_sql", "BPE_STEPS"]

# pinned step count, interpolated into the oracle — change both
# together; 10 reaches the first CHAINED merges on the test corpus
# (p+ar, m+er at steps 7-8), proving multi-char symbols flow through
BPE_STEPS = 10


def _merge_fold_expr(l: str, r: str) -> str:
    """Spark fold applying one merge greedily over the symbol array."""
    return (
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{l}' "
        f"AND x = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{l}{r}')) "
        "ELSE concat(acc, array(x)) END)"
    )


def _train(spark, sf_dir, steps):
    """Shared training loop: returns (merge rows, final vocab DF with
    per-word symbol arrays — PERSISTED; the caller unpersists)."""
    vocab = (
        doc_tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .withColumn(
            "syms", F.expr("filter(split(term, ''), x -> x != '')")
        )
        .persist()
    )
    vocab.count()
    merges = []
    cur = vocab
    for step in range(steps):
        pairs = (
            cur.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(
            1
        ).collect()
        if not top:
            break
        l, r, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((step, l, r, n))
        nxt = cur.select(
            "term", "freq", F.expr(_merge_fold_expr(l, r)).alias("syms")
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    return merges, cur


def bpe_train(spark, sf_dir, steps: int = BPE_STEPS) -> DataFrame:
    """Train ``steps`` BPE merges; returns the merge table
    (step, lhs, rhs, n) — n is the frequency-weighted count of the
    merged pair at the time it was chosen."""
    merges, cur = _train(spark, sf_dir, steps)
    cur.unpersist()
    return spark.createDataFrame(
        merges, "step long, lhs string, rhs string, n long"
    ).orderBy("step")


def bpe_encode(spark, sf_dir, steps: int = BPE_STEPS) -> DataFrame:
    """Apply the trained vocabulary: per-doc piece counts under the
    learned merges — (doc_id, n_tokens, n_pieces).  The corpus is
    encoded by JOINING tokens against the per-WORD piece count of the
    final training state (vocabulary-sized), never by re-folding every
    token occurrence — the word table is the tokenizer artifact, the
    join is the application.

    Scale: one (term)-keyed join of the token stream against the
    vocabulary + a per-doc aggregation — the token_counts shape with a
    learned instead of heuristic piece function."""
    _merges, cur = _train(spark, sf_dir, steps)
    pieces = cur.select(
        "term", F.size("syms").cast("long").alias("pieces")
    )
    out = (
        doc_tokens(spark, sf_dir)
        .join(pieces, "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("pieces").cast("long").alias("n_pieces"),
        )
        .orderBy("doc_id")
    )
    cur.unpersist()  # eligibility only: the plan recomputes if evicted
    return out


def bpe_fertility(spark, sf_dir, steps: int = BPE_STEPS) -> DataFrame:
    """Tokenizer-quality report: per-language fertility of the learned
    vocabulary — (lang, n_words, n_pieces, n_chars, pieces_per_word,
    chars_per_piece).  pieces_per_word is the classic fertility metric
    (lower = the tokenizer compresses that language better);
    chars_per_piece is its inverse view.  The per-lang comparison is
    what tokenizer-bias audits of multilingual corpora report.

    Cross-engine determinism: the three counters are exact BIGINT sums;
    both ratios divide the same integers in the same order, so the
    doubles are bit-identical before the 6dp round.

    Scale: the same vocab-join shape as bpe_encode plus one doc_id join
    for lang and a |langs|-row aggregation.
    """
    _merges, cur = _train(spark, sf_dir, steps)
    pieces = cur.select(
        "term", F.size("syms").cast("long").alias("pieces")
    )
    langs = documents(spark, sf_dir).select("doc_id", "lang")
    agg = (
        doc_tokens(spark, sf_dir)
        .join(pieces, "term")
        .join(langs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("pieces").cast("long").alias("n_pieces"),
            F.sum(F.length("term")).cast("long").alias("n_chars"),
        )
    )
    out = agg.select(
        "lang",
        "n_words",
        "n_pieces",
        "n_chars",
        F.round(
            F.col("n_pieces").cast("double")
            / F.col("n_words").cast("double"),
            6,
        ).alias("pieces_per_word"),
        F.round(
            F.col("n_chars").cast("double")
            / F.col("n_pieces").cast("double"),
            6,
        ).alias("chars_per_piece"),
    )
    cur.unpersist()  # eligibility only: the plan recomputes if evicted
    return out


def _cte_prefix(steps: int) -> str:
    """Unrolled-CTE body shared by both oracles: s{k} holds
    (term, freq, sym) with sym the space-joined symbol string; m{k} is
    step k's argmax pair; the fold lambda applies it (same
    greedy-equals-fold argument as the Spark side)."""
    parts = ["""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
            AS term FROM documents
        ),
        vocab AS (SELECT term, count(*)::BIGINT AS freq FROM toks
                  GROUP BY term),
        s0 AS (
          SELECT term, freq,
                 array_to_string(
                   [x FOR x IN split(term, '') IF x != ''], ' ') AS sym
          FROM vocab
        )"""]
    for k in range(steps):
        parts.append(f""",
        p{k} AS (
          SELECT a[i] AS l, a[i + 1] AS r, sum(freq)::BIGINT AS n
          FROM (SELECT freq, split(sym, ' ') AS a FROM s{k}
                WHERE len(split(sym, ' ')) >= 2),
               LATERAL (SELECT unnest(
                 generate_series(1, len(a) - 1)) AS i) g
          GROUP BY a[i], a[i + 1]
        ),
        m{k} AS (SELECT l, r, n FROM p{k}
                 ORDER BY n DESC, l, r LIMIT 1),
        s{k + 1} AS (
          SELECT term, freq,
                 list_reduce(
                   split(sym, ' '),
                   (acc, x) -> CASE
                     WHEN (acc = m.l OR suffix(acc, ' ' || m.l))
                          AND x = m.r
                       THEN substr(acc, 1, len(acc) - len(m.l))
                            || m.l || m.r
                     ELSE acc || ' ' || x END
                 ) AS sym
          FROM s{k} CROSS JOIN m{k} m
        )""")
    return "".join(parts)


def bpe_train_oracle_sql(steps: int = BPE_STEPS) -> str:
    selects = " UNION ALL ".join(
        f"SELECT {k}::BIGINT AS step, l AS lhs, r AS rhs, n FROM m{k}"
        for k in range(steps)
    )
    return f"{_cte_prefix(steps)} {selects} ORDER BY step"


def bpe_encode_oracle_sql(steps: int = BPE_STEPS) -> str:
    return f"""{_cte_prefix(steps)},
        pieces AS (SELECT term, len(split(sym, ' '))::BIGINT AS pieces
                   FROM s{steps}),
        dtoks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS term
          FROM documents
        )
        SELECT doc_id, count(*)::BIGINT AS n_tokens,
               sum(pieces)::BIGINT AS n_pieces
        FROM dtoks JOIN pieces USING (term)
        GROUP BY doc_id ORDER BY doc_id
    """


def bpe_fertility_oracle_sql(steps: int = BPE_STEPS) -> str:
    """Mirror of bpe_fertility: the bpe_encode refold + a lang join;
    ratios divide the exact BIGINT sums in the same order as Spark."""
    return f"""{_cte_prefix(steps)},
        pieces AS (SELECT term, len(split(sym, ' '))::BIGINT AS pieces
                   FROM s{steps}),
        dtoks AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                   AS term
          FROM documents
        ),
        agg AS (
          SELECT d.lang, count(*)::BIGINT AS n_words,
                 sum(p.pieces)::BIGINT AS n_pieces,
                 sum(length(dt.term))::BIGINT AS n_chars
          FROM dtoks dt JOIN pieces p USING (term)
               JOIN documents d USING (doc_id)
          GROUP BY d.lang
        )
        SELECT lang, n_words, n_pieces, n_chars,
               round(n_pieces::DOUBLE / n_words::DOUBLE, 6)
                 AS pieces_per_word,
               round(n_chars::DOUBLE / n_pieces::DOUBLE, 6)
                 AS chars_per_piece
        FROM agg
    """
