"""Near-duplicate detection operators for training-data pipelines.

The engine's ingest pipeline ships exact-sha256 and simhash dedup
(index/pipeline.py, reference lib/duphash.py).  This module adds the
standard large-scale dedup family — MinHash+LSH and n-gram Jaccard —
expressed as pure DataFrame ops so each has a value-identical DuckDB
oracle (__spark_entry__.oracle_sql).

Determinism contract shared with the SQL oracles:
 * shingle = 3 consecutive tokens (engine tokenizer spec) joined by ' ';
 * hash_i(s) = md5(i || '|' || s) compared LEXICOGRAPHICALLY — md5 hex
   is identical everywhere, and string-min is a valid minhash (what
   matters is a consistent total order over hashed shingles, not
   integer arithmetic);
 * LSH: 8 signatures, 4 bands × 2 rows; band key = md5 of the
   concatenated (seed-ordered) signatures.

Scale notes (10^12 rows): every step is a shuffle on (doc, shingle) /
(band, key) hash keys — no driver-side state, no O(n²) pass; the LSH
band join only materializes candidate pairs, and the Jaccard join is
bounded by ``max_shingle_df`` (boilerplate shingles above the cap are
dropped from the shingle sets, closing the d²-per-hot-key blowup).
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..text.tokenizer import TOKEN_PATTERN

N_HASHES = 8
BAND_ROWS = 2


def doc_shingles(docs: DataFrame, id_col="doc_id", text_col="text",
                 n=3) -> DataFrame:
    """(id, shingle) — distinct n-token shingles per document."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    # guard: F.sequence(0, negative) would generate a DESCENDING range,
    # so short docs (< n tokens) must map to an empty shingle set
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), sh.alias("sh")
    ).select("doc_id", F.explode(F.array_distinct("sh")).alias("shingle"))


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, seed, sig): sig = lexicographic min of seeded md5."""
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(N_HASHES - 1))
    ).alias("seed")
    h = F.md5(
        F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))
    )
    return (
        shingles.select("doc_id", "shingle", seeds)
        .select("doc_id", "seed", h.alias("h"))
        .groupBy("doc_id", "seed")
        .agg(F.min("h").alias("sig"))
    )


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band, key): band key = md5 of seed-ordered sigs."""
    return (
        sigs.withColumn("band", (F.col("seed") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seed", "sig"))
                        ),
                        lambda x: x["sig"],
                    ),
                    "",
                )
            ).alias("key")
        )
    )


def minhash_pairs(docs: DataFrame, id_col="doc_id",
                  text_col="text") -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing >= 1 LSH band.

    BOUNDED-REPORT FORM: the per-(band, key) self-join materializes
    ALL pairs within each bucket — a template/boilerplate cluster of m
    near-identical docs emits O(m²) rows from a single key, so this
    shape is for the enumerable pair REPORT (the ``dedup_minhash``
    driver entry, whose DuckDB oracle states exactly this join) and
    small corpora.  Every at-scale consumer wants either connectivity
    or a drop set, and both are linear via :func:`minhash_star_edges` —
    use that instead (training_data_prep does; dup_clusters components
    are identical over star edges, see its docstring proof).
    """
    bands = lsh_bands(
        minhash_signatures(doc_shingles(docs, id_col, text_col))
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
        )
        .distinct()
    )


def minhash_star_edges(docs: DataFrame, id_col="doc_id",
                       text_col="text") -> DataFrame:
    """Skew-safe LSH candidate edges: per (band, key) bucket emit only
    the MIN-HUB STAR ``(bucket_min, member)`` — (a, b) with a < b,
    distinct.  Output is LINEAR in the band rows (≤ one edge per
    (doc, band) row), so a template cluster of m = 10⁵ near-identical
    docs contributes m−1 edges instead of minhash_pairs' m²/2 ≈ 5·10⁹ —
    the one blowup class that makes all-pairs LSH unaffordable on a
    web corpus (the reference bounds the same cost with its 200-doc
    comparison window, makeindex.py:72-78; this keeps exactness
    instead of truncating).

    Equivalences (why consumers lose nothing):
     * CONNECTED COMPONENTS are identical to minhash_pairs':
       within a bucket B = {m, x₁…x_k} (m = min), the star
       {(m, xᵢ)} spans B just as the clique does, and components of a
       union of graphs depend only on which vertex sets each
       subgraph connects — per-bucket clique and per-bucket star
       connect the same set B, so the union's components coincide.
     * DROP SETS are identical: a doc has a smaller-id bucket-mate
       (minhash_pairs' ``b`` side) iff it is not the min of some
       bucket it belongs to — exactly this function's ``b`` column.

    Plan shape: one groupBy (band, key) min (map-side partial agg, so
    a hot bucket ships ONE row per upstream partition) + a shuffle
    join back on (band, key).  The hot bucket's join output lands on
    one task but is linear in the bucket, never quadratic.
    """
    bands = lsh_bands(
        minhash_signatures(doc_shingles(docs, id_col, text_col))
    )
    mins = bands.groupBy("band", "key").agg(
        F.min("doc_id").alias("a")
    )
    return (
        bands.join(mins, ["band", "key"])
        .filter(F.col("doc_id") > F.col("a"))
        .select("a", F.col("doc_id").alias("b"))
        .distinct()
    )


def dup_clusters(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Connected components over near-dup ``pairs`` (a, b) → duplicate
    CLUSTERS: (doc_id, cluster_id, cluster_size), cluster_id = the
    smallest doc_id reachable through the pair graph.

    Dedup survivorship needs components, not pairs: if A~B and B~C,
    keeping min-per-pair retains both A and B.  The reference's simhash
    stage approximates this with a local-min rule (lib/duphash.py
    behavior, mirrored in index/pipeline.py); this operator computes the
    exact transitive closure for the offline training-data path.

    Algorithm: min-label propagation with pointer jumping — label(v)
    starts at v; each round takes
    ``min(label(v), min over neighbors' labels, label(label(v)))``
    until a fixpoint.  The neighbor term walks the graph, the
    label-of-label term (pointer jumping / path shortcutting, the same
    doubling trick as Kiveris et al.'s large-star contraction,
    "Connected Components in MapReduce and Beyond", SoCC'14) halves
    the remaining label-chain depth each round, so convergence is
    O(log diameter) rounds — an adversarial 10⁶-node chain converges
    in ~20 rounds, not 10⁶.  Each round is two shuffle-on-key joins +
    an aggregate with no driver-side state beyond the converged
    counter, so it runs unchanged on 10^12 edges.  ``localCheckpoint``
    truncates per-round lineage so the plan stays O(1) deep; raises if
    ``max_iters`` rounds don't converge (never silently wrong).
    """
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).localCheckpoint()
    converged = False
    for _ in range(max_iters):
        prop = (
            edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        jump = labels.select(
            F.col("node").alias("label"), F.col("label").alias("jlabel")
        )
        nxt = (
            labels.join(prop, "node", "left")
            .join(jump, "label", "left")
            .select(
                "node",
                F.least(
                    "label",
                    F.coalesce("nlabel", F.col("label")),
                    F.coalesce("jlabel", F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = nxt
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_iters} rounds"
        )
    size_w = F.count("*").over(Window.partitionBy("cluster_id"))
    return (
        labels.select(
            F.col("node").alias("doc_id"),
            F.col("label").alias("cluster_id"),
        )
        .withColumn("cluster_size", size_w)
    )


def jaccard_pairs(docs: DataFrame, id_col="doc_id", text_col="text",
                  threshold=0.5, max_shingle_df=10_000,
                  log_dropped=False) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing >= 1 shingle.

    (a, b, jaccard) with jaccard >= threshold, rounded to 6 places.
    The shingle inverted join bounds the candidate set; exactness makes
    this the verification stage downstream of minhash_pairs at scale.

    ``max_shingle_df`` bounds the join: a boilerplate shingle appearing
    in ``d`` docs creates a d² key in the self-join (license headers are
    the classic killer), so shingles with df > cap are removed from the
    shingle SETS before sizes/intersection — i.e. Jaccard is computed
    over the boilerplate-free shingle sets of each doc, consistently in
    numerator and denominator.  The hot-shingle list is at most
    n_shingle_rows/cap entries, so the anti-join broadcasts.  Set
    ``log_dropped=True`` to count and log the dropped shingles (one
    extra aggregate job — off by default in the driver entry).
    """
    sh = doc_shingles(docs, id_col, text_col)
    if max_shingle_df is not None:
        sdf = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
        hot = sdf.filter(F.col("sdf") > max_shingle_df).select("shingle")
        if log_dropped:
            import logging

            n_hot = hot.count()
            logging.getLogger(__name__).warning(
                "jaccard_pairs: dropping %d shingles with df > %d",
                n_hot, max_shingle_df,
            )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    j = F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", F.round(j, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


SPAN_W = 8  # tokens per span window (shared with the DuckDB oracle)


def span_dedup(docs: DataFrame, id_col="doc_id", text_col="text",
               w: int = SPAN_W) -> DataFrame:
    """Span-level exact duplicate detection — the sub-document
    complement of the doc-level dedup family (Lee et al., "Deduplicating
    Training Data Makes Language Models Better": any fixed-width token
    window occurring more than once in the corpus is duplicated text).

    Rule (shared verbatim with the SQL oracle): every w-token window is
    an occurrence; a window's shingle is DUPLICATED when the corpus
    holds >= 2 occurrences of it (cross-doc or within-doc — a license
    header pasted twice in one file is boilerplate all the same).
    Output per document: (doc_id, n_tokens, dup_spans,
    dup_token_frac) — the duplicated-window count and the fraction of
    token positions covered by at least one duplicated window, rounded
    to 6 places (0.0 for empty docs).

    Scale: one shuffle on the shingle hash (agg side is 1 row per
    distinct shingle); the flag joins back to occurrences carrying no
    payload, so hot boilerplate shingles skew only the join key, never
    row width; the coverage explode is w x the DUPLICATED occurrences
    only, then a per-doc distinct — all shuffle-on-key, no driver state.
    The windows subtree is deliberately RECOMPUTED for the agg and the
    join-back rather than persisted: materializing (doc, start,
    shingle) rows caches ~w x corpus bytes, while the recompute is one
    extra codegen'd scan+tokenize pass — the cheaper side at 100 TB.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    sh = F.when(
        F.size("t") >= w,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - w),
            lambda i: F.array_join(F.slice("t", i + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = base.select(
        "doc_id", F.posexplode(sh).alias("p0", "sh")
    ).select("doc_id", (F.col("p0") + 1).alias("s"), "sh")
    dupsh = (
        wins.groupBy("sh")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= 2)
        .select("sh")
    )
    dupocc = wins.join(dupsh, "sh").select("doc_id", "s")
    spans = dupocc.groupBy("doc_id").agg(
        F.count("*").alias("dup_spans")
    )
    cov = (
        dupocc.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(w - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("dup_tokens"))
    )
    n_tok = F.size("t").cast("long")
    frac = F.when(
        n_tok > 0,
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0)) / n_tok, 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        base.join(spans, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            n_tok.alias("n_tokens"),
            F.coalesce(F.col("dup_spans"), F.lit(0).cast("long")).alias(
                "dup_spans"
            ),
            frac.alias("dup_token_frac"),
        )
    )


def strip_dup_spans(docs: DataFrame, id_col="doc_id", text_col="text",
                    w: int = SPAN_W) -> DataFrame:
    """The ACTIONABLE half of span_dedup — rewrite each document with
    duplicated spans removed, keeping one canonical copy corpus-wide
    (Lee et al. leave the first occurrence in place so no content is
    lost, only its repeats).

    Rule (shared verbatim with the SQL oracle): for each duplicated
    shingle (>= 2 occurrences, span_dedup's rule) the occurrence with
    the smallest (doc_id, start) is canonical; every other occurrence
    marks its w token positions for removal; the cleaned text joins the
    surviving tokens in position order ('' when everything goes).
    Output: (doc_id, n_tokens, n_removed, clean_text).  Removal is
    POSITION-level: a canonical window overlapped by marked windows
    (self-repetition like "x x x ... x") keeps only the positions no
    marked window reaches — tested in
    test_span_ops_self_overlapping_repetition.

    Scale: the canonical pick is a min-STRUCT aggregate per shingle —
    map-side combinable, so a boilerplate shingle with millions of
    occurrences never funnels through one window partition (the SQL
    oracle uses row_number; the argmin semantics are identical).  The
    rest is span_dedup's shuffle-on-key shape plus one anti-join on
    (doc, pos) and a per-doc sort-agg for reassembly.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    tokpos = base.select(
        "doc_id", F.posexplode("t").alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "term")
    sh = F.when(
        F.size("t") >= w,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - w),
            lambda i: F.array_join(F.slice("t", i + 1, w), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = base.select(
        "doc_id", F.posexplode(sh).alias("p0", "sh")
    ).select("doc_id", (F.col("p0") + 1).alias("s"), "sh")
    firsts = (
        wins.groupBy("sh")
        .agg(
            F.count("*").alias("occ"),
            F.min(F.struct("doc_id", "s")).alias("first"),
        )
        .filter(F.col("occ") >= 2)
        .select("sh", "first")
    )
    marked = wins.join(firsts, "sh").filter(
        ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("s") == F.col("first.s"))
        )
    )
    rem = marked.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("s"), F.col("s") + F.lit(w - 1))
        ).alias("p"),
    ).distinct()
    kept = tokpos.join(rem, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "term"))),
                lambda x: x["term"],
            ),
            " ",
        ).alias("clean_text"),
    )
    n_tok = F.size("t").cast("long")
    return (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_tok.alias("n_tokens"),
            (
                n_tok - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
            ).alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def pagerank_dupgraph(docs: DataFrame, n_iter: int = 5,
                      threshold: float = 0.5) -> DataFrame:
    """(doc_id, pr) — PageRank centrality over the UNDIRECTED near-dup
    graph: each n-gram-Jaccard pair contributes both directed edges,
    and the reference's unnormalized PageRank variant (graph/
    pagerank.py, lib/pagerank.py:8-51 semantics) runs for a PINNED
    ``n_iter`` with no early stop, so the DuckDB oracle unrolls the
    exact same iterations as CTE stages (the trained-k-means oracle
    pattern).

    Why it exists: dup_clusters picks representatives by min-doc_id;
    centrality picks them by connectivity — within a duplicate cluster
    the doc most linked to other dups ranks highest, while isolated
    docs sit at the teleport floor (1 - damping).  This also puts the
    G1 PageRank loop itself under the driver's value-hash gate (it is
    otherwise pytest-oracled only).

    Scale: the pair graph is the jaccard join's output (bounded by the
    shingle-df cap); each iteration is one shuffle join + agg over
    edges — pagerank_df's loop, lineage-truncated per round.
    """
    from ..graph.pagerank import pagerank_df
    from ..params import PR_DAMPING

    pairs = jaccard_pairs(docs, threshold=threshold)
    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    universe = docs.select(F.col("doc_id").alias("docid"))
    n = universe.count()
    # round_to=6 each iteration (cross-engine float contract, the
    # k-means precedent): without it sum-order ulp noise compounds
    # across iterations and can cross a rounding boundary in the final
    # value hash.  tol=0 pins exactly n_iter rounds, no delta jobs.
    pr = pagerank_df(
        docs.sparkSession, universe, edges, n,
        damping=PR_DAMPING, max_iter=n_iter, tol=0.0, round_to=6,
    )
    return pr.select(
        F.col("docid").alias("doc_id"),
        F.col("pr_quality").alias("pr"),
    )


# winnowing pinned defaults — interpolated into the DuckDB oracle
# (change Spark and SQL together)
WINNOW_K = 5   # tokens per k-gram
WINNOW_W = 4   # k-grams per selection window


def winnow_fingerprints(docs: DataFrame, id_col="doc_id",
                        text_col="text", k: int = WINNOW_K,
                        w: int = WINNOW_W) -> DataFrame:
    """(doc_id, pos, fp) — MOSS winnowing fingerprints (Schleimer,
    Wilkerson & Aiken 2003): hash every k-token gram, slide a window
    of w consecutive gram hashes, and in each window select the
    MINIMUM hash, rightmost occurrence on ties.  The selected set is
    position-robust: any shared substring of >= w+k-1 tokens
    guarantees a shared fingerprint, so matching fp values across
    docs localize plagiarism/boilerplate that doc-level simhash and
    shingle-set minhash can only flag globally.

    Hash = first 8 hex chars of md5 over the space-joined gram —
    lowercase hex in both engines, and lexicographic order on the hex
    string IS unsigned numeric order, so the window minimum needs no
    integer parsing.  The rightmost-min tie rule is a min-STRUCT agg
    (h asc, -pos asc) in Spark vs row_number in SQL — the same argmin
    (the strip_dup_spans precedent).  Docs with < w+k-1 tokens yield
    no windows and no fingerprints (the winnowing guarantee needs a
    full window).

    Scale: grams and windows are in-row arithmetic explodes (the
    span-dedup recompute-don't-persist shape, <= w rows per gram);
    selection is one (doc_id, win) key-hash agg + distinct — all
    shuffle-on-key, no driver state, no corpus-wide windows.
    """
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
    )
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
    hs = F.when(
        F.size("t") >= k,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - k),
            lambda i: F.substring(
                F.md5(F.array_join(F.slice("t", i + 1, k), " ")), 1, 8
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "doc_id",
        (F.size("t") - k + 1).alias("ng"),
        F.posexplode(hs).alias("p0", "h"),
    ).select("doc_id", "ng", (F.col("p0") + 1).alias("pos"), "h")
    lo = F.greatest(F.lit(1), F.col("pos") - w + 1)
    hi = F.least(F.col("pos"), F.col("ng") - w + 1)
    # F.sequence(a, b) DESCENDS when a > b — guard to an empty array
    # (a doc with fewer than w grams has no window)
    wins = grams.select(
        "doc_id",
        "pos",
        "h",
        F.explode(
            F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<integer>")
            )
        ).alias("win"),
    )
    sel = wins.groupBy("doc_id", "win").agg(
        F.min(
            F.struct(F.col("h"), (-F.col("pos")).alias("np"))
        ).alias("m")
    )
    return (
        sel.select(
            "doc_id",
            (-F.col("m.np")).cast("long").alias("pos"),
            F.col("m.h").alias("fp"),
        )
        .distinct()
        .orderBy("doc_id", "pos")
    )


WINNOW_MIN_MATCHES = 2  # pairs must share this many fingerprints
WINNOW_MAX_FP_DF = 1000  # hot-fp cap (interpolated into the oracle)


def winnow_matches(docs: DataFrame, id_col="doc_id", text_col="text",
                   k: int = WINNOW_K, w: int = WINNOW_W,
                   min_matches: int = WINNOW_MIN_MATCHES,
                   max_fp_df: int | None = WINNOW_MAX_FP_DF) -> DataFrame:
    """(a, b, n_matches) — MOSS candidate pairs: docs sharing
    >= min_matches winnowing fingerprint VALUES (a < b).  Distinct fp
    values per doc (a fingerprint selected at several positions counts
    once — set semantics, the jaccard_pairs convention), joined on the
    fp value.  This is the report MOSS actually produces: localized
    shared-substring evidence, robust to reordering and padding that
    defeat whole-doc hashes.

    ``max_fp_df`` (default-on, pinned WINNOW_MAX_FP_DF — interpolated
    into the DuckDB oracle, change Spark and SQL together): a
    boilerplate fingerprint appearing in d docs creates a d² key in
    the fp self-join (license headers / site templates — the same
    blowup class as jaccard_pairs' hot shingles), so fps with df >
    cap are removed from every doc's fp SET before candidates and
    counts — i.e. n_matches counts shared NON-boilerplate
    fingerprints, consistently for all pairs.  The hot list is at
    most n_fp_rows/cap values, so the anti-join broadcasts (the
    max_shingle_df pattern).  ``None`` disables the cap (exhaustive
    small-corpus report).

    Scale: one extra (fp) key-hash agg + broadcast anti-join; the
    self-join is then shuffle-on-key with every key bounded by the
    cap, so no bucket can square.
    """
    fps = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, w=w
    ).select("doc_id", "fp").distinct()
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp").agg(F.count("*").alias("fdf"))
            .filter(F.col("fdf") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a = fps.select(F.col("doc_id").alias("a"), "fp")
    b = fps.select(F.col("doc_id").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
        .orderBy(F.desc("n_matches"), F.asc("a"), F.asc("b"))
    )


# top-k overlap set-similarity join — pinned params (interpolated into
# the DuckDB oracle; change Spark and SQL together)
OVR_K = 20       # pairs returned
OVR_S_MIN = 24   # prefix-filter floor: sound iff kth overlap >= this


def topk_overlap_pairs(docs: DataFrame, id_col="doc_id",
                       text_col="text", k=OVR_K,
                       s_min=OVR_S_MIN) -> DataFrame:
    """(a, b, overlap) — the k most-similar document pairs by DISTINCT
    shared-bigram count, found with a prefix-filtered set-similarity
    join (the SSJoin/PPJoin blocking rule; the top-k adaptive variant
    is ICDE 2020's "Adaptive Top-k Overlap Set Similarity Joins",
    PAPERS.md): under a global (df asc, bigram asc) token order, any
    pair with overlap >= s_min must share a bigram within both docs'
    first (n - s_min + 1) rarest bigrams, so candidate generation
    blocks ONLY on those prefixes and common-bigram-only pairs never
    materialize.  Exact overlaps are then counted for the candidates
    alone and the top k taken under (overlap desc, a, b).

    Soundness is checked loudly: if the realized k-th overlap falls
    below ``s_min`` the prune was not provably lossless and the op
    raises (the substring_search floor pattern).  At corpus scale the
    paper's adaptive escalation applies: re-run with s_min raised to
    the running k-th best — pruning power GROWS as the corpus gets
    more similar pairs.

    Scale: shuffle-on-key throughout — per-doc bigram ranks are a
    doc-partitioned window (bounded by doc length), candidates come
    off the (prefix-bigram) equi-join, verification re-joins bigram
    sets on (pair, bigram) equi-keys; only the k result rows are
    collected (for the soundness guard)."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0
            )
        ).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "term", "nxt").alias("s"),
        )
        .distinct()
    )
    dfb = bg.groupBy("s").agg(F.count("*").alias("df"))
    nn = bg.groupBy("doc_id").agg(F.count("*").alias("n"))
    rk = (
        bg.join(dfb, "s")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "s")
            ),
        )
        .join(nn, "doc_id")
    )
    pref = rk.filter(F.col("r") <= F.col("n") - s_min + 1).select(
        "doc_id", "s"
    )
    cand = (
        pref.alias("x")
        .join(pref.alias("y"), "s")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    shared = (
        cand.join(bg.select(F.col("doc_id").alias("a"), "s"), "a")
        .join(bg.select(F.col("doc_id").alias("b"), "s"), ["b", "s"])
    )
    top = (
        shared.groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("overlap"))
        .orderBy(F.desc("overlap"), "a", "b")
        .limit(k)
    )
    rows = top.collect()  # bounded: k rows (the soundness guard)
    # sound iff k full rows came back with the k-th >= s_min; fewer
    # rows means pairs below the floor may have been pruned away and
    # the result is not provably the true top-k
    if len(rows) < k or rows[-1]["overlap"] < s_min:
        kth = rows[-1]["overlap"] if rows else 0
        raise ValueError(
            f"topk_overlap_pairs: {len(rows)} rows, kth overlap {kth} "
            f"vs s_min {s_min} — the prefix prune is not lossless "
            f"here; lower s_min (or raise it adaptively from a sound "
            f"floor)"
        )
    return spark.createDataFrame(rows, "a long, b long, overlap long")


def dupgraph_triangles(docs: DataFrame, threshold: float = 0.5
                       ) -> DataFrame:
    """(doc_id, degree, n_tri, clust) — triangle counts and local
    clustering coefficients over the undirected near-dup graph (the
    jaccard_pairs edge set): how CLIQUE-LIKE each doc's duplicate
    neighborhood is.  dup_clusters answers "which component"; this
    answers "how dense" — a high-clust node sits inside a mutual-dup
    clique (one canonical survives safely), a low-clust high-degree
    node is a hub stitching near-dup chains (the risky transitive
    merges).  clust = 2*n_tri / (degree*(degree-1)), round-6, 0.0 for
    degree < 2 (exact integers divide once — the cross-engine float
    contract).

    Scale — the degree-ordered wedge algorithm (Schank–Wagner / the
    MapReduce triangle standard), not an open 3-way join: every edge
    is oriented from its lower (degree, id) endpoint to its higher, so
    wedges are generated only at each triangle's LOWEST-degree vertex
    — the per-pivot fan-out is bounded by the oriented out-degree
    (O(sqrt(m)) on skewed graphs), which is what keeps a celebrity
    node in a 10^12-edge graph from exploding the self-join.  Wedge
    legs are ordered by the same key, so each triangle is generated
    and closed exactly once; the closing check is one equi-join
    against the oriented edge set.  The DuckDB oracle states the spec
    as the brute-force doc_id-ordered 3-way join — the driver compare
    proves the oriented kernel counts the identical triangle set.
    """
    pairs = jaccard_pairs(docs, threshold=threshold).select("a", "b")
    deg = (
        pairs.select(F.col("a").alias("node"))
        .unionAll(pairs.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    e = (
        pairs.join(
            deg.select(F.col("node").alias("a"),
                       F.col("degree").alias("da")), "a")
        .join(
            deg.select(F.col("node").alias("b"),
                       F.col("degree").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dd"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            (F.col("o1.dd") < F.col("o2.dd"))
            | (
                (F.col("o1.dd") == F.col("o2.dd"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        ),
    ).select(
        F.col("o1.src").alias("u"),
        F.col("o1.dst").alias("v"),
        F.col("o2.dst").alias("w"),
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    tn = (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )
    clust = F.when(
        F.col("degree") >= 2,
        F.round(
            (F.lit(2.0) * F.col("n_tri"))
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(tn, "node", "left")
        .na.fill({"n_tri": 0})
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            F.col("n_tri").cast("long").alias("n_tri"),
            clust.alias("clust"),
        )
        .orderBy("doc_id")
    )
