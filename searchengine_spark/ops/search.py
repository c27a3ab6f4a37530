"""User-facing query surface beyond bare term lists ([NORTH-EXT]).

The reference serves free-text conjunctive queries (lib/search.py:21-45);
every production engine that starts there grows the same next layer:
prefix/wildcard expansion, faceting, result diversification, synonym
groups, a small query language (must / -not / "phrase" / field:filter),
and related-term suggestion.  This module adds that layer as thin
COMPOSITIONS of the existing oracled kernels — scoring stays the one
BM25 definition (params.BM25_K1/B, idf = ln((N-df+.5)/(df+.5)+1)),
filters stay eligibility-only (corpus-global stats, the invariant shared
with allowed_docs / exclude_terms), and every op ships a same-constant
DuckDB oracle built by the ``*_oracle_sql`` functions below so the SQL
cannot desynchronize from the Spark definitions.

Scale shape (100 TB framing): all expansion / synonym / facet dimension
tables are term-dictionary-sized or smaller and broadcast; the only wide
shuffles are the per-doc score aggregations the base scorer already
does.  Rounding contract: scores round(6) after the final sum in BOTH
engines; ranks are computed over the rounded score with doc_id
tie-break (the hybrid_rrf rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..params import BM25_B, BM25_K1
from ..text.querylang import parse_query
from .textops import _bm25_scored, doc_tokens, documents, term_tf

__all__ = [
    "parse_query", "prefix_topk", "facet_counts", "diversified_topk",
    "synonym_topk", "query_topk", "related_terms", "suffix_topk",
    "search_after_topk", "explain_score",
]

# --- pinned driver-entry constants (interpolated into the oracles) --------
PREFIX_Q = "s"              # matches 6 of the 31 vocab terms -> cap binds
PREFIX_MAX_EXPAND = 4       # keep the top-4 expansions by (df desc, term)
FACET_TERMS = ("join", "hash")
DIVERSE_TERMS = ("join", "hash")
DIVERSE_PER_SOURCE = 2      # max hits surfaced per source collection
SYN_GROUPS = (("join", "merge"), ("fast", "slow"))
QL_QUERY = 'spark query "table hash" -dup lang:en sc* *er'
QL_QUERY_OR = 'spark "table hash" -dup part|stream query|window'
QL_QUERY_BOOST = 'spark query^2.5 "table hash" -dup'
QL_QUERY_SOURCE = "table hash source:src3 -dup"
# OR groups composed with a metadata filter + NOT in ONE query — the
# round-3 stretch item: the combination has clean semantics (slots
# score, filters/nots stay eligibility-only), pinned under the driver
# gate as query_or_filter_topk
QL_QUERY_OR_FILTER = 'spark part|stream query|window lang:en -dup'
# round-5 composition lifts (VERDICT r4 #7): a NEGATED OR group
# (-a|b == -a -b, De Morgan, eligibility-only) and a boost INSIDE an
# OR group (a^2|b: slot eligibility weight-blind, matched boosted
# term's BM25 scales) — pinned as query_or_not_topk /
# query_or_boost_topk
QL_QUERY_OR_NOT = 'spark part|stream -dup|slow'
QL_QUERY_OR_BOOST = 'spark part^2|stream "table hash"'
RELATED_SEED = "spark"
RELATED_MIN_CO = 5          # ignore co-occurrence counts below this
RELATED_TOPN = 10
SUFFIX_Q = "er"             # leading wildcard *er (customer/filter/order)
SUFFIX_MAX_EXPAND = 2       # cap binds: 3 vocab terms end in "er"
CURSOR_TERMS = ("join", "hash")
CURSOR_K = 10               # page size; the cursor is hit #CURSOR_K
EXPLAIN_TERMS = ("spark", "join")
EXPLAIN_K = 5

# the one BM25 expression, interpolated into every oracle here so the
# constants can't drift from params.py (repr keeps full float precision)
_BM25_SQL = (
    "ln((stats.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)"
    f" * tf.tf * {BM25_K1 + 1!r}"
    f" / (tf.tf + {BM25_K1!r} * ({1 - BM25_B!r}"
    f" + {BM25_B!r} * dl.total_tokens / stats.avgdl))"
)

_TOKS = (
    "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))"
    " AS term FROM documents"
)

# tf/dl/stats CTE prefix shared by every scoring oracle below
_SCORE_BASE = f"""
    toks AS ({_TOKS}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           GROUP BY doc_id, term),
    dl AS (SELECT doc_id, count(*) AS total_tokens FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n, avg(total_tokens) AS avgdl FROM dl)
"""


def _dl_stats(tf):
    """(dl, stats) DataFrames off the shared term_tf projection —
    the same definitions _bm25_scored uses (dl = distinct-term count,
    the reference's total_tokens quirk, makeindex.py:223-224)."""
    dl = tf.groupBy("doc_id").agg(F.count("*").alias("total_tokens"))
    stats = dl.agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    )
    return dl, stats


def _bm25_col():
    """The scoring expression over columns (tf, df, total_tokens, n,
    avgdl) — one definition for every op in this module."""
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    return (
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


# pinned constants, interpolated into the oracles by the builders below
RELAX_TERMS = ("dup", "key", "fast")   # conjunctive matches < RELAX_K,
# so the OR fallback tier actually fires at every SF
RELAX_K = 25   # > conjunctive R at every SF, so fallback always fires
MSM_TERMS = ("dup", "key", "fast")
MSM_MIN = 2                            # minimum_should_match


def _scored_with_nmatch(spark, sf_dir, terms) -> DataFrame:
    """(doc_id, score-rounded-6, nmatch) over every doc matching >= 1
    query term — the conjunctive scorer WITHOUT its nmatch filter (the
    oracle fragment scored0), shared by relaxed_topk and msm_topk."""
    tf = term_tf(spark, sf_dir)
    dl, stats = _dl_stats(tf)
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
    return (
        hits.withColumn("bm25", _bm25_col())
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("bm25"), 6).alias("score"),
            F.count("*").alias("nmatch"),
        )
    )


def relaxed_topk(spark, sf_dir, terms=RELAX_TERMS,
                 k=RELAX_K) -> DataFrame:
    """Query relaxation (the 'zero/few results' fallback every search
    UI ships): rank FULL conjunctive matches first, then fill the
    remaining slots with partial (OR) matches — one pass, rank over
    (is_full desc, score desc, doc_id asc) with the rounded-rank
    contract.  Scores are the plain disjunctive BM25 sums, so a doc's
    score is identical whether it surfaces in the AND tier or the
    fallback tier (eligibility-tiering only).

    Scale: identical plan shape to the conjunctive scorer — the tier
    flag is one comparison, the top-k the usual salted-window
    candidate (plain window kept for oracle parity at driver scale).
    """
    from pyspark.sql import Window

    scored = _scored_with_nmatch(spark, sf_dir, terms).withColumn(
        "is_full", (F.col("nmatch") == len(terms)).cast("long")
    )
    w = Window.orderBy(
        F.desc("is_full"), F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "doc_id", "is_full", "score")
    )


def relaxed_topk_oracle_sql(terms=RELAX_TERMS, k=RELAX_K) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)}
        SELECT rank, doc_id, is_full, score FROM (
          SELECT doc_id,
                 (nmatch = {len(terms)})::BIGINT AS is_full,
                 round(s, 6) AS score,
                 row_number() OVER (
                   ORDER BY (nmatch = {len(terms)})::BIGINT DESC,
                            round(s, 6) DESC, doc_id
                 )::BIGINT AS rank
          FROM scored0)
        WHERE rank <= {k} ORDER BY rank
    """


def msm_topk(spark, sf_dir, terms=MSM_TERMS, msm=MSM_MIN,
             k=10) -> DataFrame:
    """minimum_should_match: disjunctive BM25 restricted to docs
    matching >= ``msm`` of the query's distinct terms — the middle
    ground between AND (msm = len(terms)) and OR (msm = 1).
    Eligibility-only: surviving scores equal the plain disjunctive
    sums; rounded-rank (score desc, doc_id asc)."""
    scored = _scored_with_nmatch(spark, sf_dir, terms).filter(
        F.col("nmatch") >= msm
    )
    return (
        scored.select("doc_id", "nmatch", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def msm_topk_oracle_sql(terms=MSM_TERMS, msm=MSM_MIN, k=10) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)}
        SELECT doc_id, nmatch, round(s, 6) AS score
        FROM scored0 WHERE nmatch >= {msm}
        ORDER BY score DESC, doc_id LIMIT {k}
    """


# --- prefix / wildcard search ----------------------------------------------

def prefix_topk(spark, sf_dir, prefix=PREFIX_Q,
                max_expand=PREFIX_MAX_EXPAND, k=10) -> DataFrame:
    """Prefix (trailing-wildcard) search: expand ``prefix`` against the
    term dictionary, keep the top ``max_expand`` expansions by
    (df desc, term asc) — the Lucene rewrite-cap rule, deterministic —
    then score DISJUNCTIVELY (a doc matching any expansion scores the
    sum over the expansions it contains).

    Scale: the dictionary is corpus-vocabulary-sized (millions of rows
    at 100 TB, KBs after the prefix filter); the cap is a
    TakeOrderedAndProject on that filtered dictionary and the surviving
    expansions broadcast into the tf join — no new wide shuffle beyond
    the per-doc sum.  On the serving tier the same expansion comes from
    a bisect over the sorted in-RAM termdict (LocalSearcher.prefix_topk)
    feeding the OR-mode WAND kernel.
    """
    tf = term_tf(spark, sf_dir)
    exp = (
        tf.filter(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expand)
    )
    dl, stats = _dl_stats(tf)
    hits = (
        tf.join(F.broadcast(exp), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return (
        hits.withColumn("bm25", _bm25_col())
        .groupBy("doc_id")
        .agg(F.sum("bm25").alias("s"))
        .select("doc_id", F.round(F.col("s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def prefix_topk_oracle_sql(prefix=PREFIX_Q, max_expand=PREFIX_MAX_EXPAND,
                           k=10) -> str:
    return f"""
        WITH {_SCORE_BASE},
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
                WHERE term LIKE '{prefix}%' GROUP BY term
                ORDER BY df DESC, term LIMIT {max_expand}),
        scored AS (
          SELECT tf.doc_id, sum({_BM25_SQL}) AS s
          FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
               CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS score FROM scored
        ORDER BY score DESC, doc_id LIMIT {k}
    """


# --- faceted search ---------------------------------------------------------

def facet_counts(spark, sf_dir, terms=FACET_TERMS,
                 facet="lang") -> DataFrame:
    """Facet aggregation over the FULL conjunctive match set (not just
    the served page): per facet value, how many docs match and the best
    rounded score — the sidebar counts next to search results.

    Scale: reuses the conjunctive scorer's per-doc aggregate, then one
    narrow join to the docs metadata projection and a facet-cardinality
    group-by (bounded by the facet's distinct values, trivially small
    vs the corpus)."""
    matches = _bm25_scored(spark, sf_dir, terms)
    meta = documents(spark, sf_dir).select("doc_id", facet)
    return (
        matches.join(meta, "doc_id")
        .groupBy(facet)
        .agg(
            F.count("*").alias("n_docs"),
            F.max("score").alias("top_score"),
        )
        .orderBy(F.desc("n_docs"), F.asc(facet))
    )


def _conj_scored_sql(terms) -> str:
    """Conjunctive-BM25 'scored' CTE tail (all matches, rounded score)
    for oracle reuse — mirror of textops._bm25_scored."""
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        qterms AS (SELECT unnest([{tlist}]) AS term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        scored0 AS (
          SELECT tf.doc_id, sum({_BM25_SQL}) AS s, count(*) AS nmatch
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        ),
        scored AS (SELECT doc_id, round(s, 6) AS score FROM scored0
                   WHERE nmatch = {len(terms)})
    """


def facet_counts_oracle_sql(terms=FACET_TERMS, facet="lang") -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)}
        SELECT d.{facet}, count(*) AS n_docs, max(score) AS top_score
        FROM scored JOIN documents d USING (doc_id)
        GROUP BY d.{facet}
        ORDER BY n_docs DESC, d.{facet}
    """


# --- result diversification -------------------------------------------------

def diversified_topk(spark, sf_dir, terms=DIVERSE_TERMS,
                     per_source=DIVERSE_PER_SOURCE, k=10) -> DataFrame:
    """Source-diversified top-k: at most ``per_source`` hits per source
    collection survive, ranked within source by (score desc, doc_id) —
    the "collapse duplicates from one site" rule of web search, over the
    corpus' ``source`` column.

    Ranks follow the rounded-rank contract (row_number over the
    6dp-rounded score, doc_id tie-break) so both engines rank identical
    values.  Scale: the per-source window shuffles the MATCH SET (not
    the corpus) on source; source cardinality is high (hosts/repos) so
    partitions stay balanced; the global top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    matches = _bm25_scored(spark, sf_dir, terms)
    meta = documents(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        matches.join(meta, "doc_id")
        .withColumn("src_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("src_rank") <= per_source)
        .select("doc_id", "source", "score", "src_rank")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def diversified_topk_oracle_sql(terms=DIVERSE_TERMS,
                                per_source=DIVERSE_PER_SOURCE,
                                k=10) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)},
        ranked AS (
          SELECT scored.doc_id, d.source, scored.score,
                 row_number() OVER (PARTITION BY d.source
                   ORDER BY scored.score DESC, scored.doc_id)::BIGINT
                   AS src_rank
          FROM scored JOIN documents d USING (doc_id)
        )
        SELECT doc_id, source, score, src_rank FROM ranked
        WHERE src_rank <= {per_source}
        ORDER BY score DESC, doc_id LIMIT {k}
    """


# --- synonym-group search ----------------------------------------------------

def synonym_topk(spark, sf_dir, groups=SYN_GROUPS, k=10) -> DataFrame:
    """Synonym-expanded search: each query slot is a group of
    interchangeable terms; a doc is eligible iff it matches AT LEAST ONE
    term of EVERY group (conjunctive over groups, disjunctive within),
    and its score sums BM25 over ALL matched terms — Lucene's
    SynonymQuery-inside-BooleanQuery shape.

    Scale: the (term, gid) expansion table is query-sized and
    broadcast; eligibility is a countDistinct(gid) on the same per-doc
    aggregate the scorer already computes — no extra shuffle."""
    return (
        _slot_scored(spark, sf_dir, groups)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _slot_scored(spark, sf_dir, slots, weights=None) -> DataFrame:
    """All slot-query matches as (doc_id, score-rounded-6): a doc is
    eligible iff it matches >= 1 term of EVERY slot, score sums BM25
    over ALL matched terms.  The shared scoring core of synonym_topk
    and OR-group / boosted query_topk (a slot of one term degenerates
    to a conjunctive must term, so this generalizes _bm25_scored).

    ``weights`` (term -> float, default 1.0) multiplies a term's BM25
    contribution — the Lucene ``^`` boost.  Weights never change
    ELIGIBILITY (slot membership is weight-blind); when None the plan
    is exactly the unweighted one."""
    rows = [
        (t, gi, float((weights or {}).get(t, 1.0)))
        for gi, g in enumerate(slots)
        for t in g
    ]
    qterms = spark.createDataFrame(rows, "term string, gid int, wt double")
    tf = term_tf(spark, sf_dir)
    dft = tf.join(F.broadcast(qterms.select("term")), "term").groupBy(
        "term"
    ).agg(F.countDistinct("doc_id").alias("df"))
    dl, stats = _dl_stats(tf)
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    score_col = _bm25_col() * F.col("wt") if weights else _bm25_col()
    return (
        hits.withColumn("bm25", score_col)
        .groupBy("doc_id")
        .agg(
            F.sum("bm25").alias("s"),
            F.countDistinct("gid").alias("ngroups"),
        )
        .filter(F.col("ngroups") == len(slots))
        .select("doc_id", F.round(F.col("s"), 6).alias("score"))
    )


def _slot_scored_sql(slots, weights=None) -> str:
    """Slot-query 'scored' CTE tail (eligible docs, rounded score) —
    mirror of _slot_scored, the group sibling of _conj_scored_sql.
    ``weights`` mirrors _slot_scored's boost multiplier: interpolated
    with repr() and cast ::DOUBLE (a bare SQL float literal is
    DECIMAL in DuckDB) so both engines multiply the identical IEEE
    double."""
    if weights:
        vals = ", ".join(
            f"('{t}', {gi}, {repr(float(weights.get(t, 1.0)))}::DOUBLE)"
            for gi, g in enumerate(slots)
            for t in g
        )
        cols, score = "(term, gid, wt)", f"{_BM25_SQL} * wt"
    else:
        vals = ", ".join(
            f"('{t}', {gi})" for gi, g in enumerate(slots) for t in g
        )
        cols, score = "(term, gid)", _BM25_SQL
    return f"""
        qterms AS (SELECT * FROM (VALUES {vals}) v{cols}),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        scored0 AS (
          SELECT tf.doc_id, sum({score}) AS s,
                 count(DISTINCT qterms.gid) AS ngroups
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
          GROUP BY tf.doc_id
        ),
        scored AS (SELECT doc_id, round(s, 6) AS score FROM scored0
                   WHERE ngroups = {len(slots)})
    """


def synonym_topk_oracle_sql(groups=SYN_GROUPS, k=10) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_slot_scored_sql(groups)}
        SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {k}
    """


# --- mini query language ------------------------------------------------------
# parse_query lives in text/querylang.py (Spark-free, shared with the
# serving tier); re-exported here as part of the op family's surface.


def query_topk(spark, sf_dir, q=QL_QUERY, k=10) -> DataFrame:
    """Execute a mini-query-language string: conjunctive BM25 over the
    scoring terms, then eligibility trims for each phrase (adjacent
    positions), the lang filter, and the must_not terms.  All trims are
    eligibility-only — stats stay corpus-global, so surviving scores
    equal the plain conjunctive scores exactly (the filtered-search
    invariant).

    Scale: phrase adjacency is the (doc,pos)-equi-join of
    phrase_match (positions come from posexplode, one shuffle on
    doc_id); filters/NOT are semi/anti joins on doc_id against sets
    already bounded by the match set."""
    parsed = parse_query(q)
    if not parsed["scoring"]:
        raise ValueError("query has no scoring terms")
    if parsed["or_groups"] or parsed["boosts"]:
        # a|b OR groups: the synonym-slot scorer (eligibility = every
        # slot matched, score sums over ALL matched terms); with only
        # singleton slots it IS the conjunctive scorer, kept below for
        # plan simplicity on the common case.  term^w boosts ride the
        # slot scorer's weight column (eligibility unchanged).
        res = _slot_scored(
            spark, sf_dir, parsed["slots"],
            weights=parsed["boosts"] or None,
        )
    else:
        res = _bm25_scored(spark, sf_dir, parsed["scoring"])

    if parsed["phrases"] or parsed["must_not"]:
        toks = doc_tokens(spark, sf_dir)
    for phrase in parsed["phrases"]:
        first = toks.filter(F.col("term") == phrase[0]).select(
            "doc_id", "pos"
        )
        cur = first
        for i, t in enumerate(phrase[1:], start=1):
            nxt = toks.filter(F.col("term") == t).select(
                F.col("doc_id"), (F.col("pos") - i).alias("pos")
            )
            cur = cur.join(nxt, ["doc_id", "pos"])
        res = res.join(cur.select("doc_id").distinct(), "doc_id")

    for field, value in sorted(parsed["filters"].items()):
        allowed = documents(spark, sf_dir).filter(
            F.col(field) == value
        ).select("doc_id")
        res = res.join(allowed, "doc_id", "left_semi")

    if parsed["must_not"]:
        ex = spark.createDataFrame(
            [(t,) for t in parsed["must_not"]], "term string"
        )
        excl = (
            toks.join(F.broadcast(ex), "term").select("doc_id").distinct()
        )
        res = res.join(excl, "doc_id", "left_anti")

    for kind, base in parsed["wildcards"]:
        res = res.join(
            _wildcard_docs(spark, sf_dir, kind, base),
            "doc_id", "left_semi",
        )

    return res.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _wildcard_docs(spark, sf_dir, kind: str, base: str) -> DataFrame:
    """Eligible docs for one wildcard clause (constant-score rewrite:
    eligibility-only, uncapped expansion — the querylang contract),
    resolved through the term DICTIONARY first, exactly as the serving
    tier's _terms_matching does over its in-RAM termdict
    (query/serve_local.py): the vocabulary scan yields the matched
    terms (V-sized output), and the token stream is broadcast-joined
    on that term list — map-side pruning of every non-matching token.
    Replaces the round-3 shape (a full per-wildcard (doc, term)
    aggregation of the corpus via term_tf, then an endswith filter):
    at 100x the old plan shuffled the whole token table once per
    wildcard; this one's only wide edge is the vocabulary aggregate,
    and the postings union never leaves the map side.  Plan-asserted
    in tests/test_ops.py::test_wildcard_docs_plan_termdict_pruned."""
    from .textops import term_dict

    cond = (
        F.col("term").startswith(base)
        if kind == "prefix"
        else F.col("term").endswith(base)
    )
    wterms = term_dict(spark, sf_dir).filter(cond).select("term")
    return (
        doc_tokens(spark, sf_dir)
        .join(F.broadcast(wterms), "term", "left_semi")
        .select("doc_id")
        .distinct()
    )


def query_topk_oracle_sql(q=QL_QUERY, k=10) -> str:
    parsed = parse_query(q)
    parts = [f"WITH {_SCORE_BASE},"]
    if parsed["or_groups"] or parsed["boosts"]:
        parts.append(
            _slot_scored_sql(
                parsed["slots"], weights=parsed["boosts"] or None
            )
        )
    else:
        parts.append(_conj_scored_sql(parsed["scoring"]))
    conds = []
    if parsed["phrases"] or parsed["must_not"]:
        parts.append(f""",
        pos AS (
          SELECT doc_id, i AS pos, t[i] AS term FROM (
            SELECT doc_id,
                   regexp_extract_all(lower(text), '[a-z0-9]+') AS t
            FROM documents), LATERAL (
            SELECT unnest(generate_series(1, len(t))) AS i) g
        )""")
    for pi, phrase in enumerate(parsed["phrases"]):
        joins = " ".join(
            f"JOIN pos p{i} ON p{i}.doc_id = p0.doc_id"
            f" AND p{i}.pos = p0.pos + {i} AND p{i}.term = '{t}'"
            for i, t in enumerate(phrase[1:], start=1)
        )
        parts.append(f""",
        ph{pi} AS (SELECT DISTINCT p0.doc_id FROM pos p0 {joins}
                   WHERE p0.term = '{phrase[0]}')""")
        conds.append(f"doc_id IN (SELECT doc_id FROM ph{pi})")
    for field, value in sorted(parsed["filters"].items()):
        conds.append(
            "doc_id IN (SELECT doc_id FROM documents"
            f" WHERE {field} = '{value}')"
        )
    if parsed["must_not"]:
        tlist = ", ".join(f"'{t}'" for t in parsed["must_not"])
        conds.append(
            f"doc_id NOT IN (SELECT doc_id FROM pos WHERE term IN ({tlist}))"
        )
    for kind, base in parsed["wildcards"]:
        pat = f"{base}%" if kind == "prefix" else f"%{base}"
        conds.append(
            f"doc_id IN (SELECT doc_id FROM tf WHERE term LIKE '{pat}')"
        )
    where = (" WHERE " + " AND ".join(conds)) if conds else ""
    parts.append(f"""
        SELECT doc_id, score FROM scored{where}
        ORDER BY score DESC, doc_id LIMIT {k}
    """)
    return "".join(parts)


# --- related terms (doc-level PMI) -------------------------------------------

def related_terms(spark, sf_dir, seed=RELATED_SEED, topn=RELATED_TOPN,
                  min_co=RELATED_MIN_CO) -> DataFrame:
    """Query-suggestion mining: terms most associated with ``seed`` by
    doc-level pointwise mutual information, pmi = ln(co_df * N /
    (df_seed * df_term)) over the doc-incidence sets, co_df >= min_co
    to kill noise.  This is the "searches related to X" primitive
    derived from the corpus instead of query logs.

    Scale: doc-incidence (distinct (doc,term)) is the term_tf
    projection; the seed's doc set semi-joins it (one shuffle on
    doc_id), then a vocabulary-sized aggregate; df_seed and N broadcast
    as 1-row tables."""
    inc = term_tf(spark, sf_dir).select("doc_id", "term")
    n = inc.select("doc_id").distinct().agg(
        F.count("*").alias("n_docs")
    )
    seed_docs = inc.filter(F.col("term") == seed).select("doc_id")
    df_seed = seed_docs.agg(F.count("*").alias("df_seed"))
    co = (
        inc.join(seed_docs, "doc_id", "left_semi")
        .filter(F.col("term") != seed)
        .groupBy("term")
        .agg(F.count("*").alias("co_df"))
        .filter(F.col("co_df") >= min_co)
    )
    dft = inc.groupBy("term").agg(F.count("*").alias("df"))
    pmi = F.log(
        F.col("co_df").cast("double") * F.col("n_docs")
        / (F.col("df_seed").cast("double") * F.col("df"))
    )
    return (
        co.join(dft, "term")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(df_seed))
        .select("term", "co_df", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("term"))
        .limit(topn)
    )


def related_terms_oracle_sql(seed=RELATED_SEED, topn=RELATED_TOPN,
                             min_co=RELATED_MIN_CO) -> str:
    return f"""
        WITH toks AS ({_TOKS}),
        inc AS (SELECT DISTINCT doc_id, term FROM toks),
        n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM inc),
        sd AS (SELECT doc_id FROM inc WHERE term = '{seed}'),
        dfs AS (SELECT count(*) AS df_seed FROM sd),
        co AS (SELECT term, count(*) AS co_df FROM inc
               WHERE doc_id IN (SELECT doc_id FROM sd)
                 AND term != '{seed}'
               GROUP BY term HAVING count(*) >= {min_co}),
        dft AS (SELECT term, count(*) AS df FROM inc GROUP BY term)
        SELECT co.term, co.co_df,
               round(ln(co.co_df::DOUBLE * n.n_docs
                        / (dfs.df_seed::DOUBLE * dft.df)), 6) AS pmi
        FROM co JOIN dft USING (term) CROSS JOIN n CROSS JOIN dfs
        ORDER BY pmi DESC, term LIMIT {topn}
    """


# --- leading-wildcard (suffix) search ---------------------------------------

def suffix_topk(spark, sf_dir, suffix=SUFFIX_Q,
                max_expand=SUFFIX_MAX_EXPAND, k=10) -> DataFrame:
    """Leading-wildcard search (``*suffix``): expand against the term
    dictionary, keep the top ``max_expand`` expansions by
    (df desc, term asc) — the same rewrite-cap rule as prefix_topk —
    then score disjunctively.

    Scale: a leading wildcard cannot prefix-scan the forward term
    dictionary; the classic fix (Lucene's ReversedWildcardFilter) is a
    REVERSED term dictionary, where ``*suffix`` becomes the prefix scan
    ``reverse(suffix)*``.  Here the dictionary is a vocabulary-sized
    aggregate so a filter suffices; the serving tier
    (LocalSearcher.suffix_topk) implements the real reversed-dictionary
    bisect over its in-RAM sorted reversed term list."""
    tf = term_tf(spark, sf_dir)
    exp = (
        tf.filter(F.col("term").endswith(suffix))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expand)
    )
    dl, stats = _dl_stats(tf)
    hits = (
        tf.join(F.broadcast(exp), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return (
        hits.withColumn("bm25", _bm25_col())
        .groupBy("doc_id")
        .agg(F.sum("bm25").alias("s"))
        .select("doc_id", F.round(F.col("s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def suffix_topk_oracle_sql(suffix=SUFFIX_Q, max_expand=SUFFIX_MAX_EXPAND,
                           k=10) -> str:
    return f"""
        WITH {_SCORE_BASE},
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf
                WHERE term LIKE '%{suffix}' GROUP BY term
                ORDER BY df DESC, term LIMIT {max_expand}),
        scored AS (
          SELECT tf.doc_id, sum({_BM25_SQL}) AS s
          FROM tf JOIN dft USING (term) JOIN dl USING (doc_id)
               CROSS JOIN stats
          GROUP BY tf.doc_id
        )
        SELECT doc_id, round(s, 6) AS score FROM scored
        ORDER BY score DESC, doc_id LIMIT {k}
    """


# --- cursor pagination (search_after) ---------------------------------------

def search_after_topk(spark, sf_dir, terms=CURSOR_TERMS,
                      k=CURSOR_K) -> DataFrame:
    """Page 2 by CURSOR, not offset: the cursor is page 1's last hit
    (score, doc_id), and page 2 is the top-k of the survivors under
    the strict total order (score < cs) OR (score = cs AND doc_id >
    cd) — the search_after rule.  Because (score desc, doc_id asc) is
    a total order over the rounded scores, cursor pagination must
    equal offset pagination exactly; the oracle states the offset
    form, so the driver compare proves the equivalence.

    Scale: this is WHY deep paging uses cursors — each page is a
    TakeOrderedAndProject over a cursor-FILTERED match set (the filter
    pushes into the scan of the per-doc aggregate), never a global
    rank materialization of offset+k rows."""
    scored = _bm25_scored(spark, sf_dir, terms)
    cursor = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .orderBy(F.asc("score"), F.desc("doc_id"))
        .limit(1)
        .select(
            F.col("score").alias("c_score"), F.col("doc_id").alias("c_doc")
        )
    )
    return (
        scored.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("score") < F.col("c_score"))
            | (
                (F.col("score") == F.col("c_score"))
                & (F.col("doc_id") > F.col("c_doc"))
            )
        )
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_after_topk_oracle_sql(terms=CURSOR_TERMS, k=CURSOR_K) -> str:
    return f"""
        WITH {_SCORE_BASE},
        {_conj_scored_sql(terms)}
        SELECT doc_id, score FROM (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
          FROM scored)
        WHERE rnk BETWEEN {k + 1} AND {2 * k}
        ORDER BY score DESC, doc_id
    """


# --- score explanation -------------------------------------------------------

def explain_score(spark, sf_dir, terms=EXPLAIN_TERMS,
                  k=EXPLAIN_K) -> DataFrame:
    """Per-term score breakdown for the top-k conjunctive hits — the
    Lucene ``explain`` surface: one row per (doc, term) with tf, df,
    rounded idf, the term's rounded BM25 contribution, and the doc's
    rounded total, so a relevance engineer can see WHY a doc ranked.

    Scale: the breakdown reuses the scorer's own hit rows (no second
    scoring pass); only the k winners' rows survive the final
    broadcast semi-join."""
    tf = term_tf(spark, sf_dir)
    dl, stats = _dl_stats(tf)
    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    dft = tf.join(F.broadcast(qterms), "term").groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dft), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("bm25", _bm25_col())
        .withColumn(
            "idf",
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
    )
    top = (
        hits.groupBy("doc_id")
        .agg(F.sum("bm25").alias("s"), F.count("*").alias("nmatch"))
        .filter(F.col("nmatch") == len(terms))
        .select("doc_id", F.round(F.col("s"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        hits.join(F.broadcast(top), "doc_id")
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round(F.col("idf"), 6).alias("idf"),
            F.round(F.col("bm25"), 6).alias("contrib"),
            "score",
        )
        .orderBy(F.desc("score"), F.asc("doc_id"), F.asc("term"))
    )


def explain_score_oracle_sql(terms=EXPLAIN_TERMS, k=EXPLAIN_K) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
        WITH {_SCORE_BASE},
        qterms AS (SELECT unnest([{tlist}]) AS term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df
                FROM tf JOIN qterms USING (term) GROUP BY term),
        hits AS (
          SELECT tf.doc_id, tf.term, tf.tf, dft.df,
                 round(ln((stats.n - dft.df + 0.5) / (dft.df + 0.5)
                          + 1.0), 6) AS idf,
                 round({_BM25_SQL}, 6) AS contrib,
                 {_BM25_SQL} AS raw
          FROM tf JOIN qterms USING (term) JOIN dft USING (term)
               JOIN dl USING (doc_id) CROSS JOIN stats
        ),
        top AS (
          SELECT doc_id, round(sum(raw), 6) AS score
          FROM hits GROUP BY doc_id HAVING count(*) = {len(terms)}
          ORDER BY score DESC, doc_id LIMIT {k}
        )
        SELECT h.doc_id, h.term, h.tf::BIGINT AS tf, h.df::BIGINT AS df,
               h.idf, h.contrib, t.score
        FROM hits h JOIN top t USING (doc_id)
        ORDER BY t.score DESC, h.doc_id, h.term
    """


# --- percolation (reverse search / standing-query alerts) --------------------

# pinned standing-query table, derived from the synthetic vocabulary —
# interpolated into the DuckDB oracle (change Spark and SQL together)
PERC_QUERIES = (
    ("spark", "query"),
    ("table", "hash"),
    ("merge", "join"),
    ("stream", "window"),
    ("customer", "order"),
)


def percolate(spark, sf_dir, queries=PERC_QUERIES) -> DataFrame:
    """Reverse search (Elasticsearch percolator / Lucene Monitor): a
    TABLE of standing conjunctive queries is matched against every
    document — (qid, doc_id) for each doc containing ALL of query
    qid's terms, ordered (qid, doc_id).  The alerting dual of top-k:
    queries are data, documents stream through.

    Scale: the standing-query term table broadcasts (registered
    queries ≪ corpus); each doc's tokens dedup INSIDE the row
    (array_distinct before the explode — zero-shuffle dedup, no
    countDistinct expansion), then a map-side broadcast join prunes
    every non-query token BEFORE any shuffle (going through term_tf
    would aggregate the whole corpus first), and a plain count per
    (qid, doc) keeps counts equal to the query's arity.  One shuffle
    keyed (qid, doc_id) over only the matched rows (plan-asserted
    shuffle-lean in tests/test_ops.py); no per-query scans, no driver
    loop — exactly how the streaming front-end
    (streaming/percolate.py) matches each micro-batch, which is what
    makes this an alerting primitive.
    """
    from ..text.tokenizer import TOKEN_PATTERN

    rows = [
        (qi, t, len(set(q)))
        for qi, q in enumerate(queries)
        for t in sorted(set(q))
    ]
    qt = spark.createDataFrame(rows, "qid long, term string, arity int")
    toks = documents(spark, sf_dir).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            )
        ).alias("term"),
    )
    return (
        toks.join(F.broadcast(qt), "term")
        .groupBy("qid", "arity", "doc_id")
        .agg(F.count("*").alias("nm"))
        .filter(F.col("nm") == F.col("arity"))
        .select("qid", "doc_id")
        .orderBy("qid", "doc_id")
    )


def percolate_oracle_sql(queries=PERC_QUERIES) -> str:
    vals = ", ".join(
        f"({qi}, '{t}', {len(set(q))})"
        for qi, q in enumerate(queries)
        for t in sorted(set(q))
    )
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               GROUP BY doc_id, term),
        qt AS (SELECT * FROM (VALUES {vals}) v(qid, term, arity))
        SELECT qid::BIGINT AS qid, doc_id
        FROM tf JOIN qt USING (term)
        GROUP BY qid, doc_id, arity
        HAVING count(DISTINCT term) = arity
        ORDER BY qid, doc_id
    """


# rich standing queries — the query-language subset the percolator
# accepts (bare terms, "phrase", -not); pinned + interpolated into the
# DuckDB oracle — change Spark and SQL together
PERC_RICH_QUERIES = (
    "spark query",
    '"table hash"',
    "merge -dup",
    'stream "merge join"',
    '"customer order" -dup',
)


def _parse_perc_rich(queries):
    """(qid, required_terms, phrase_strings, not_terms) per standing
    query, via the ONE shared parser (text/querylang) — the percolator
    accepts the bare/phrase/-not subset and raises on anything else
    (lang:/OR/wildcard/boost have no containment semantics here)."""
    from ..text.querylang import parse_query

    parsed = []
    for qi, q in enumerate(queries):
        p = parse_query(q)
        # NB: the parser's key is "or_groups" (a .get("groups") here
        # once made the gate vacuously pass OR queries)
        if (p["filters"] or p["or_groups"] or p["wildcards"]
                or p["boosts"]):
            raise ValueError(
                "percolate_rich supports bare terms, phrases, and "
                f"-not only: {q!r}"
            )
        req = sorted(
            set(p["must"]) | {t for ph in p["phrases"] for t in ph}
        )
        if not req:
            raise ValueError(f"standing query needs a positive part: {q!r}")
        parsed.append((
            qi, req,
            [" ".join(ph) for ph in p["phrases"]],
            sorted(set(p["must_not"])),
        ))
    return parsed


def percolate_rich(spark, sf_dir,
                   queries=PERC_RICH_QUERIES) -> DataFrame:
    """(qid, doc_id) — the percolator over RICH standing queries:
    bare terms (all must be present), "phrases" (exact token
    adjacency), and -not exclusions — the ES-percolator shape where
    registered alerts carry real query syntax, parsed by the same
    text/querylang parser as every other tier.

    Two stages, both columnar (no UDF):
     1. candidates — required-term containment exactly like
        ``percolate`` (in-row array_distinct dedup, broadcast term
        join BEFORE any shuffle, arity count): a doc missing any
        bare/phrase token cannot match, so this is a lossless prune.
     2. verify — candidates join back to the doc text (candidate rows
        ≪ corpus) and a per-qid CASE checks phrase adjacency as
        token-string containment (' a b ' inside the
        space-joined token string — exact because tokens contain no
        spaces) and -not as token absence.

    Scale: stage 1 is the lean percolate plan (one shuffle over
    matched rows); stage 2 touches only candidate docs.  A phrase-only
    query still prunes on its tokens first — the adjacency check
    never scans the full corpus."""
    from ..text.tokenizer import TOKEN_PATTERN
    from .textops import documents

    parsed = _parse_perc_rich(queries)
    rows = [
        (qi, t, len(req)) for qi, req, _, _ in parsed for t in req
    ]
    qt = spark.createDataFrame(rows, "qid long, term string, arity int")
    docs = documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            )
        ).alias("term"),
    )
    cand = (
        toks.join(F.broadcast(qt), "term")
        .groupBy("qid", "arity", "doc_id")
        .agg(F.count("*").alias("nm"))
        .filter(F.col("nm") == F.col("arity"))
        .select("qid", "doc_id")
    )
    jd = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("j"),
    )
    cond = None
    for qi, _, phs, nots in parsed:
        c = F.lit(True)
        for ph in phs:
            c = c & F.col("j").contains(f" {ph} ")
        for t in nots:
            c = c & ~F.col("j").contains(f" {t} ")
        cond = (
            F.when(F.col("qid") == qi, c) if cond is None
            else cond.when(F.col("qid") == qi, c)
        )
    return (
        cand.join(jd, "doc_id")
        .filter(cond.otherwise(F.lit(False)))
        .select("qid", "doc_id")
        .orderBy("qid", "doc_id")
    )


# OR-capable standing queries (round 5): the percolator subset widened
# to a|b OR groups — a doc alerts iff every SLOT is satisfied (a bare
# or phrase token = a singleton slot; an OR group = any member
# present), phrases adjacent, -nots absent.  Pinned + interpolated
# into the DuckDB oracle — change Spark and SQL together.
PERC_OR_QUERIES = (
    "spark part|stream",
    '"table hash" merge|join',
    "query window|stream -dup",
    "fast|slow customer",
)


def _parse_perc_or(queries):
    """(qid, slots, phrase_strings, not_terms) per standing query —
    the OR-capable percolator subset (bare / phrase / -not / a|b);
    filters, wildcards, and boosts still raise (no containment
    semantics).  ``slots`` comes straight from the shared parser:
    singleton slots for bare+phrase tokens plus the OR groups — the
    uniform requirement list (every slot needs >= 1 member present),
    which is exactly what the prune counts."""
    from ..text.querylang import parse_query

    parsed = []
    for qi, q in enumerate(queries):
        p = parse_query(q)
        if p["filters"] or p["wildcards"] or p["boosts"]:
            raise ValueError(
                "percolate_or supports bare terms, phrases, -not, and "
                f"a|b OR groups only: {q!r}"
            )
        if not p["slots"]:
            raise ValueError(
                f"standing query needs a positive part: {q!r}"
            )
        parsed.append((
            qi, list(p["slots"]),
            [" ".join(ph) for ph in p["phrases"]],
            sorted(set(p["must_not"])),
        ))
    return parsed


def percolate_or(spark, sf_dir, queries=PERC_OR_QUERIES) -> DataFrame:
    """(qid, doc_id) — the percolator over OR-capable standing
    queries: every scoring SLOT must be satisfied (bare/phrase token =
    singleton slot, ``a|b`` = any-member slot), phrase adjacency and
    ``-not`` verified on candidates only — percolate_rich's two-stage
    plan with the arity count generalized to DISTINCT-REQUIREMENT
    counting.

    Stage 1 assigns every slot a requirement id ``rid`` and joins the
    doc's (in-row-distinct) tokens against the broadcast (term, rid)
    rows: a doc is a candidate iff countDistinct(rid) == n_slots —
    two members of one OR slot present count ONCE (the distinctness
    the plain arity count cannot express).  EXACT for bare terms and
    slots (not just a prune); phrases still need stage 2.  Scale: the
    same one-shuffle-over-matched-rows plan as percolate, and the
    streaming twin (streaming/percolate.percolate_or_stream) rides
    the same requirement-id inverted index."""
    from ..text.tokenizer import TOKEN_PATTERN
    from .textops import documents

    parsed = _parse_perc_or(queries)
    rows = [
        (qi, t, ri, len(slots))
        for qi, slots, _, _ in parsed
        for ri, slot in enumerate(slots)
        for t in slot
    ]
    qt = spark.createDataFrame(
        rows, "qid long, term string, rid int, nreq int"
    )
    docs = documents(spark, sf_dir)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            )
        ).alias("term"),
    )
    cand = (
        toks.join(F.broadcast(qt), "term")
        .groupBy("qid", "nreq", "doc_id")
        .agg(F.countDistinct("rid").alias("ns"))
        .filter(F.col("ns") == F.col("nreq"))
        .select("qid", "doc_id")
    )
    jd = docs.select(
        "doc_id",
        F.concat(
            F.lit(" "),
            F.array_join(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                ),
                " ",
            ),
            F.lit(" "),
        ).alias("j"),
    )
    cond = None
    for qi, _, phs, nots in parsed:
        c = F.lit(True)
        for ph in phs:
            c = c & F.col("j").contains(f" {ph} ")
        for t in nots:
            c = c & ~F.col("j").contains(f" {t} ")
        cond = (
            F.when(F.col("qid") == qi, c) if cond is None
            else cond.when(F.col("qid") == qi, c)
        )
    return (
        cand.join(jd, "doc_id")
        .filter(cond.otherwise(F.lit(False)))
        .select("qid", "doc_id")
        .orderBy("qid", "doc_id")
    )


def percolate_or_oracle_sql(queries=PERC_OR_QUERIES) -> str:
    """DuckDB mirror of percolate_or: the same (qid, term, rid, nreq)
    VALUES rows, count(DISTINCT rid) = nreq candidates, per-qid CASE
    verify — change the pinned query set and BOTH engines move."""
    parsed = _parse_perc_or(queries)
    vals = ", ".join(
        f"({qi}, '{t}', {ri}, {len(slots)})"
        for qi, slots, _, _ in parsed
        for ri, slot in enumerate(slots)
        for t in slot
    )
    cases = []
    for qi, _, phs, nots in parsed:
        conds = (
            [f"instr(j, ' {ph} ') > 0" for ph in phs]
            + [f"instr(j, ' {t} ') = 0" for t in nots]
        ) or ["TRUE"]
        cases.append(f"WHEN qid = {qi} THEN ({' AND '.join(conds)})")
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               GROUP BY doc_id, term),
        qt AS (SELECT * FROM (VALUES {vals}) v(qid, term, rid, nreq)),
        cand AS (
          SELECT qid, doc_id
          FROM tf JOIN qt USING (term)
          GROUP BY qid, doc_id, nreq
          HAVING count(DISTINCT rid) = nreq),
        jd AS (
          SELECT doc_id,
                 ' ' || array_to_string(
                   regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')
                 || ' ' AS j
          FROM documents)
        SELECT qid::BIGINT AS qid, doc_id
        FROM cand JOIN jd USING (doc_id)
        WHERE CASE {' '.join(cases)} ELSE FALSE END
        ORDER BY qid, doc_id
    """


def percolate_rich_oracle_sql(queries=PERC_RICH_QUERIES) -> str:
    """DuckDB mirror: identical candidate stage + per-qid CASE with
    instr() token-string containment for phrases / absence for -not."""
    parsed = _parse_perc_rich(queries)
    vals = ", ".join(
        f"({qi}, '{t}', {len(req)})"
        for qi, req, _, _ in parsed
        for t in req
    )
    cases = []
    for qi, _, phs, nots in parsed:
        conds = (
            [f"instr(j, ' {ph} ') > 0" for ph in phs]
            + [f"instr(j, ' {t} ') = 0" for t in nots]
        ) or ["TRUE"]
        cases.append(f"WHEN qid = {qi} THEN ({' AND '.join(conds)})")
    return f"""
        WITH toks AS ({_TOKS}),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               GROUP BY doc_id, term),
        qt AS (SELECT * FROM (VALUES {vals}) v(qid, term, arity)),
        cand AS (
          SELECT qid, doc_id
          FROM tf JOIN qt USING (term)
          GROUP BY qid, doc_id, arity
          HAVING count(DISTINCT term) = arity),
        jd AS (
          SELECT doc_id,
                 ' ' || array_to_string(
                   regexp_extract_all(lower(text), '[a-z0-9]+'), ' ')
                 || ' ' AS j
          FROM documents)
        SELECT qid::BIGINT AS qid, doc_id
        FROM cand JOIN jd USING (doc_id)
        WHERE CASE {' '.join(cases)} ELSE FALSE END
        ORDER BY qid, doc_id
    """
