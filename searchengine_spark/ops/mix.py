"""Corpus curation and mixing operators for training-data pipelines.

The prep pipeline (ops/prep.py) dedups, gates, and budget-cuts one
corpus.  This module adds the surrounding curation stages a pre-training
data build runs across corpora:

 * ``decontaminate``     — GPT-3-style 13-gram eval decontamination:
                           flag training docs sharing any n-gram with a
                           held-out benchmark slice.
 * ``stratified_sample`` — deterministic per-language downsampling by a
                           hash threshold (the reproducible alternative
                           to rand(): every engine that hashes the same
                           key keeps the same docs).
 * ``corpus_mixture``    — per-language token shares and the epoch
                           (repetition) factor needed to hit a target
                           mixture, à la Pile/RedPajama mixture tables.
 * ``unigram_logprob``   — self-perplexity quality proxy: per-doc mean
                           negative log-probability under the corpus's
                           own unigram LM (the model-free stand-in for
                           a KenLM/perplexity filter).

Every operator is expressed twice — Spark here, ANSI SQL in
__spark_entry__.oracle_sql — with identical semantics, pinned
parameters, and identical 6-decimal rounding on floats (the repo's
cross-engine float contract).  Change Spark and SQL together.

Scale notes (the 100-TB story):
 * decontaminate is a shuffle join keyed on the shingle — the same
   shape as ops/dedup.jaccard_pairs, including the hot-shingle cap
   (boilerplate n-grams above ``max_shingle_df`` are dropped via a
   broadcast anti-join; they are boilerplate, not contamination).
   The eval side is DISTINCT shingles of the benchmark — tiny relative
   to the corpus, but still joined (not collected): benchmarks with
   millions of n-grams stay executor-side.
 * stratified_sample and unigram_logprob are columnar expressions plus
   standard key-hash aggregations (term dictionary join); no driver
   state, no windows.
 * corpus_mixture aggregates to one row per language — the broadcast
   of the 1-row total is the only non-linear step.

Reference analogue: none — the reference indexes one crawl as-is.
These are [NORTH-EXT] training-pipeline surface (SURVEY.md §2 LLM-ops
family), composing with training_data_prep.
"""

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..text.tokenizer import TOKEN_PATTERN
from .dedup import doc_shingles
from .textops import documents

# pinned parameters, interpolated into the DuckDB oracles
# (__spark_entry__.oracle_sql) — change Spark and SQL together
DECON_NGRAM = 13          # GPT-3's 13-gram decontamination window
DECON_EVAL_MOD = 10       # doc_id % MOD == 0 → held-out eval slice
DECON_MAX_SHINGLE_DF = 10_000

# per-language keep rates for the deterministic stratified sample
SAMPLE_RATES = {
    "en": 1.0,
    "de": 0.5,
    "es": 0.5,
    "fr": 0.25,
    "zh": 0.125,
}


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECON_NGRAM,
    eval_mod: int = DECON_EVAL_MOD,
    max_shingle_df: int = DECON_MAX_SHINGLE_DF,
) -> DataFrame:
    """(doc_id, n_overlap) — training docs sharing >= 1 distinct
    n-token shingle with the held-out eval slice (doc_id % eval_mod
    == 0), and how many they share.

    Downstream drops these rows from the training set; the output is
    the audit trail (which docs, how contaminated).  Shingles are
    distinct-per-doc (dedup.doc_shingles), so n_overlap counts distinct
    contaminated n-grams, not occurrences.
    """
    d = documents(spark, sf_dir).select("doc_id", "text")
    sh = doc_shingles(d, n=n)
    ev = (
        sh.filter(F.col("doc_id") % eval_mod == 0)
        .select("shingle")
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") % eval_mod != 0)
    tr = _cap_hot_shingles(tr, max_shingle_df)
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
        # contaminated-doc report is small by construction; the total
        # order keeps the unordered-compare tooling deterministic
        .orderBy("doc_id")
    )


def _cap_hot_shingles(tr: DataFrame, max_shingle_df: int) -> DataFrame:
    """Drop shingles with train-side df > cap (boilerplate n-grams
    occurring in more docs than any real eval leak could) — the
    decontaminate/contamination_report shared gate.  Routed as a
    KEYED-AGGREGATE equi-join on shingle, never a broadcast of the
    hot set: at a 10^9-doc train side the >cap shingle list itself
    can be arbitrarily large (VERDICT r4 #8), while the keyed join is
    a co-partitioned shuffle whose per-key work is linear (AQE may
    still broadcast the agg side at runtime when it measures small —
    that is adaptive, not a hard-coded unbounded hint).  Keep iff
    df <= cap == the old anti-join of df > cap, value-identical."""
    sdf = tr.groupBy("shingle").agg(F.count("*").alias("_df"))
    return (
        tr.join(sdf, "shingle")
        .filter(F.col("_df") <= max_shingle_df)
        .drop("_df")
    )


def contamination_report(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECON_NGRAM,
    eval_mod: int = DECON_EVAL_MOD,
    max_shingle_df: int = DECON_MAX_SHINGLE_DF,
) -> DataFrame:
    """(doc_id, n_train_docs, n_leaked, n_shingles, leak_frac) — the
    EVAL-side view of decontamination (benchmark integrity): for each
    contaminated eval doc (doc_id % eval_mod == 0), how many capped
    train docs share >= 1 of its distinct n-gram shingles
    (n_train_docs), how many of its distinct shingles leak
    (n_leaked of n_shingles), and the leaked fraction (round-6, the
    repo's float contract).  decontaminate answers "which TRAIN rows
    must go"; this answers "which BENCHMARK items are compromised and
    how badly" — the report a suite owner reads before trusting a
    score.  Same pinned constants, same hot-shingle cap (a
    boilerplate n-gram is not evidence of a leak), same shingle-keyed
    join shape — nothing new has to scale.
    """
    d = documents(spark, sf_dir).select("doc_id", "text")
    sh = doc_shingles(d, n=n)
    ev = sh.filter(F.col("doc_id") % eval_mod == 0)
    tr = sh.filter(F.col("doc_id") % eval_mod != 0)
    tr = _cap_hot_shingles(tr, max_shingle_df)
    per_ev = ev.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    pairs = ev.join(
        tr.select(F.col("doc_id").alias("_tid"), "shingle"), "shingle"
    )
    agg = pairs.groupBy("doc_id").agg(
        F.countDistinct("_tid").cast("long").alias("n_train_docs"),
        F.countDistinct("shingle").cast("long").alias("n_leaked"),
    )
    return (
        agg.join(per_ev, "doc_id")
        .select(
            "doc_id", "n_train_docs", "n_leaked", "n_shingles",
            F.round(
                F.col("n_leaked").cast("double")
                / F.col("n_shingles").cast("double"), 6
            ).alias("leak_frac"),
        )
        .orderBy("doc_id")
    )


def contamination_report_oracle_sql(
    n: int = DECON_NGRAM,
    eval_mod: int = DECON_EVAL_MOD,
    max_shingle_df: int = DECON_MAX_SHINGLE_DF,
) -> str:
    """DuckDB oracle for contamination_report — same constants, same
    cap rule, same round-6 fraction (change Spark and SQL together)."""
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 regexp_extract_all(lower(text), '[a-z0-9]+') AS t
          FROM documents),
        sh AS (
          SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+{n - 1}], ' ') AS shingle
          FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - {n - 1})) AS i) g
          WHERE len(t) >= {n}),
        ev AS (SELECT * FROM sh WHERE doc_id % {eval_mod} = 0),
        tr0 AS (SELECT * FROM sh WHERE doc_id % {eval_mod} <> 0),
        hot AS (
          SELECT shingle FROM tr0 GROUP BY shingle
          HAVING count(*) > {max_shingle_df}),
        tr AS (
          SELECT * FROM tr0
          WHERE shingle NOT IN (SELECT shingle FROM hot)),
        per_ev AS (
          SELECT doc_id, count(*)::BIGINT AS n_shingles
          FROM ev GROUP BY doc_id),
        agg AS (
          SELECT ev.doc_id,
                 count(DISTINCT tr.doc_id)::BIGINT AS n_train_docs,
                 count(DISTINCT ev.shingle)::BIGINT AS n_leaked
          FROM ev JOIN tr USING (shingle)
          GROUP BY ev.doc_id)
        SELECT agg.doc_id, n_train_docs, n_leaked, n_shingles,
               round(n_leaked::DOUBLE / n_shingles::DOUBLE, 6)
                 AS leak_frac
        FROM agg JOIN per_ev USING (doc_id)
        ORDER BY doc_id
    """


def _rate_threshold_hex(rate: float) -> str:
    """8-hex-digit keep threshold: keep iff the first 8 md5 hex chars
    of the key are <= this string.  Lowercase-hex string comparison is
    identical in every engine, so the kept set is engine-independent.
    An empty string keeps nothing (every 8-char key compares greater)."""
    n = int(math.floor(rate * (1 << 32))) - 1
    if n < 0:
        return ""
    return format(min(n, (1 << 32) - 1), "08x")


def stratified_sample(
    spark: SparkSession,
    sf_dir: str,
    rates: dict | None = None,
) -> DataFrame:
    """(doc_id, lang, sample_key) — the deterministic per-language
    sample: keep a doc iff substr(md5(doc_id), 1, 8) <= the language's
    rate threshold.  Languages absent from ``rates`` are dropped.

    Hash-threshold sampling instead of rand(): reproducible across
    engines, cluster sizes, and reruns, and composable (a 0.5 sample
    of a 0.5 sample is exactly a 0.25 sample — thresholds compose by
    min, not by multiplying independent coin flips).
    """
    if rates is None:
        rates = SAMPLE_RATES
    d = documents(spark, sf_dir).select("doc_id", "lang")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    # empty-threshold default drops every row (an 8-char key never
    # compares <= ""), so an empty rates dict yields an empty sample
    thr = F.lit("")
    for lang in sorted(rates):
        thr = F.when(
            F.col("lang") == lang, F.lit(_rate_threshold_hex(rates[lang]))
        ).otherwise(thr)
    return (
        d.withColumn("sample_key", key)
        .withColumn("_thr", thr)
        .filter((F.col("_thr") != "") & (F.col("sample_key") <= F.col("_thr")))
        .select("doc_id", "lang", "sample_key")
    )


def token_count_col(text_col: str = "text"):
    """Engine-tokenizer token count as a long column — the ONE
    definition shared by corpus_mixture and the curation deploy job
    (the count is interpolated into oracles; keep a single source)."""
    return F.size(
        F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)
    ).cast("long")


def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, n_tokens, token_share, epochs) — the observed
    per-language token mixture and the repetition factor that would
    equalize it (target = uniform over observed languages).

    ``epochs`` > 1 means the language must repeat to reach its target
    share; < 1 means it must be subsampled (feed the reciprocal to
    stratified_sample).  Token counts use the engine tokenizer spec.
    """
    d = documents(spark, sf_dir)
    per = d.select("lang", token_count_col().alias("_n"))
    g = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_n").alias("n_tokens"),
    )
    tot = g.agg(
        F.sum("n_tokens").cast("double").alias("_tot"),
        F.count("*").cast("double").alias("_nl"),
    )
    return g.join(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("_tot"), 6).alias("token_share"),
        # explicit NULL for a zero-token language: Spark's non-ANSI
        # x/0 is NULL while DuckDB's is NaN — pin one value cross-engine
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                (F.lit(1.0) / F.col("_nl"))
                / (F.col("n_tokens") / F.col("_tot")),
                6,
            ),
        ).alias("epochs"),
    )


MIX_TEMP_ALPHA = 0.3   # XLM-R's multilingual sampling temperature
# interpolated into the DuckDB oracle via repr — change both together


def _round6(x: float) -> float:
    """F.round(col, 6) parity: HALF_UP over the shortest decimal repr
    (the _mmr_round6 contract)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _temperature_rates(spark: SparkSession, sf_dir: str,
                       alpha: float) -> list:
    """lang-sorted (lang, n_tokens, share, weight, rate_raw) rows from
    ONE shuffle agg + |langs|-row driver-side math — the k-means
    bounded-collect pattern (re-deriving the corpus-wide token agg once
    per downstream branch, as a pure-DataFrame chain would, is the
    expensive part at scale; the mixture math itself is |langs| rows).

    Cross-engine determinism is unchanged: shares divide exact integer
    sums, Σp is the lang-SORTED sequential fold, pow/division are the
    same libm/IEEE primitives the DuckDB oracle evaluates — proven by
    the oracle staying green across the DataFrame→driver-side move.
    """
    d = documents(spark, sf_dir)
    rows = (
        d.select("lang", token_count_col().alias("_n"))
        .groupBy("lang")
        .agg(F.sum("_n").cast("long").alias("n"))
        .collect()
    )
    counts = {r["lang"]: int(r["n"]) for r in rows}
    total = float(sum(counts.values()))
    share = {lang: n / total for lang, n in counts.items()}
    p = {lang: math.pow(s, alpha) for lang, s in share.items()}
    sump = 0.0
    for lang in sorted(p):          # the pinned sequential fold order
        sump += p[lang]
    weight = {lang: v / sump for lang, v in p.items()}
    boost = {lang: weight[lang] / share[lang] for lang in share}
    mx = max(boost.values())
    return [
        (lang, counts[lang], share[lang], weight[lang],
         boost[lang] / mx)
        for lang in sorted(counts)
    ]


def temperature_mixture(spark: SparkSession, sf_dir: str,
                        alpha: float = MIX_TEMP_ALPHA) -> DataFrame:
    """(lang, n_tokens, share, weight, rate) — temperature-scaled
    multilingual sampling (the XLM-R / mBERT alpha-sampling rule):
    target weight_l ∝ share_l^alpha (alpha < 1 flattens the
    distribution toward low-resource languages), and rate_l is the
    per-language up/down-sampling factor weight/share normalized so the
    most-boosted language is exactly 1.0 — feed rate straight into
    sampling thresholds (temperature_sample does).

    Float contracts in _temperature_rates; round-6 (HALF_UP, F.round
    parity) at the output only.
    """
    rates = _temperature_rates(spark, sf_dir, alpha)
    return spark.createDataFrame(
        [
            (lang, n, _round6(s), _round6(w), _round6(r))
            for lang, n, s, w, r in rates
        ],
        "lang string, n_tokens long, share double, weight double,"
        " rate double",
    )


def temperature_sample(spark: SparkSession, sf_dir: str,
                       alpha: float = MIX_TEMP_ALPHA) -> DataFrame:
    """(doc_id, lang, sample_key) — the mixture pipeline COMPOSED:
    temperature_mixture's per-language rates applied as deterministic
    md5-threshold sampling in one job.  keep iff rate >= 1.0 (the
    most-boosted language keeps everything by construction) OR
    substr(md5(doc_id), 1, 8) < lpad(lower(hex(floor(rate · 2^32))),
    8, '0') — strict ``<`` against the 32-bit threshold.

    Unlike stratified_sample (whose pinned thresholds interpolate into
    the oracle), the threshold here is computed from the DATA-DERIVED
    rate double inside both engines — possible because
    temperature_mixture's rate is bit-identical cross-engine (exact
    integer shares, ordered fold, round-6), and the hex conversion is
    the same integer→hex path on both.  Composable and reproducible
    like every hash-threshold sample in this module.

    Scale: one shuffle agg (the token counts inside
    _temperature_rates), then a single scan with a broadcast
    |langs|-row threshold join — the corpus is read twice total, never
    once per mixture stage.
    """
    rows = []
    for lang, _n, _s, _w, r in _temperature_rates(spark, sf_dir, alpha):
        rate = _round6(r)
        thr = format(int(math.floor(rate * 4294967296.0)), "x")
        rows.append((lang, rate, thr.rjust(8, "0")))
    rates = spark.createDataFrame(
        rows, "lang string, rate double, _thr string"
    )
    d = documents(spark, sf_dir).select("doc_id", "lang")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        d.join(F.broadcast(rates), "lang")
        .withColumn("sample_key", key)
        .filter(
            (F.col("rate") >= 1.0)
            | (F.col("sample_key") < F.col("_thr"))
        )
        .select("doc_id", "lang", "sample_key")
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, nll) — per-doc mean negative log-probability
    under the corpus unigram LM: nll = -Σ_t tf_t·ln(cf_t/total) / len.

    The model-free perplexity proxy: documents far from the corpus
    distribution (rare-token salads) score high, repetitive/common-token
    docs score low.  A quality gate thresholds nll from both ends.
    Floats: natural log, mean, then one 6-decimal rounding — the
    cross-engine contract (sums of ~10² double terms agree far below
    1e-6 regardless of accumulation order).
    """
    d = documents(spark, sf_dir).select("doc_id", "text")
    tf = (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    cf = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    tot = cf.agg(F.sum("cf").cast("double").alias("_tot"))
    return (
        tf.join(cf, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                -F.sum(F.col("tf") * F.log(F.col("cf") / F.col("_tot")))
                / F.sum("tf"),
                6,
            ).alias("nll"),
        )
    )


# train/val/test split fractions — CUMULATIVE hash thresholds, so the
# test set is a stable prefix: growing val never moves a doc between
# test and train, and a re-run over an appended corpus keeps every
# existing doc's split.  Interpolated into the DuckDB oracle.
SPLIT_FRACS = {"test": 0.05, "val": 0.05}  # remainder → train


def corpus_split(spark: SparkSession, sf_dir: str,
                 fracs: dict | None = None) -> DataFrame:
    """(doc_id, split, split_key) — deterministic train/val/test
    assignment by the same md5 hash-threshold rule as
    stratified_sample: key = first 8 md5 hex chars of the doc_id
    string; split = 'test' iff key <= thr(test_frac), 'val' iff key <=
    thr(test_frac + val_frac), else 'train' (lowercase-hex STRING
    compare, engine-independent).

    Columnar expression over the doc_id column only — no shuffle, no
    text scan; at 100 TB this is a projection fused into whatever scan
    feeds it."""
    if fracs is None:
        fracs = SPLIT_FRACS
    thr_test = _rate_threshold_hex(fracs["test"])
    thr_val = _rate_threshold_hex(fracs["test"] + fracs["val"])
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    return (
        documents(spark, sf_dir)
        .select("doc_id")
        .withColumn("split_key", key)
        .withColumn(
            "split",
            F.when(F.col("split_key") <= thr_test, "test")
            .when(F.col("split_key") <= thr_val, "val")
            .otherwise("train"),
        )
        .select("doc_id", "split", "split_key")
    )


# interpolation weight of the bigram term in the interpolated LM —
# interpolated into the DuckDB oracle (change Spark and SQL together)
BIGRAM_LAMBDA = 0.8


def bigram_logprob(spark: SparkSession, sf_dir: str,
                   lam: float = BIGRAM_LAMBDA) -> DataFrame:
    """(doc_id, n_bigrams, nll) — per-doc mean negative log-probability
    under the corpus's own INTERPOLATED bigram LM:

        P(b | a) = lam · c2(a,b)/c1(a) + (1−lam) · cu(b)/total

    where c2 is the corpus bigram count, c1(a) = Σ_b c2(a,b) (context
    count), cu the corpus unigram count.  nll = −mean(ln P) over the
    doc's bigram positions; docs with < 2 tokens have no bigrams and
    are excluded.  The order-sensitive sibling of unigram_logprob —
    a doc of common tokens in implausible ORDER now scores high
    (shuffled boilerplate, template stuffing) where the unigram proxy
    cannot see anything wrong.  Floats: natural log, mean, then one
    6-decimal rounding (the cross-engine contract).

    Scale: one token explode, a lag window partitioned by doc_id
    (bounded by doc length — never a global window), two key-hash
    count aggs, and equi-joins on (prev, term) / prev — the same
    shuffle shapes as the dedup family; no driver state."""
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
        .select("doc_id", "prev", "term")
    )
    c2 = pairs.groupBy("prev", "term").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    cu = toks.groupBy("term").agg(F.count("*").alias("cu"))
    tot = cu.agg(F.sum("cu").cast("double").alias("_tot"))
    p = (
        F.lit(lam) * F.col("c2") / F.col("c1")
        + F.lit(1.0 - lam) * F.col("cu") / F.col("_tot")
    )
    return (
        pairs.join(c2, ["prev", "term"])
        .join(c1, "prev")
        .join(cu, "term")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.avg(F.log(p)), 6).alias("nll"),
        )
    )


COLLOC_MIN_COUNT = 5   # PMI's rare-pair bias: floor on the corpus bigram count
COLLOC_TOPN = 20


def collocations(spark: SparkSession, sf_dir: str,
                 min_count: int = COLLOC_MIN_COUNT,
                 topn: int = COLLOC_TOPN) -> DataFrame:
    """(lhs, rhs, n, pmi) — the corpus's top-N adjacent-token
    collocations by pointwise mutual information over the bigram
    stream (the classic phrase-mining signal; ES significant-terms /
    Gensim Phrases shape):

        pmi = ln( c2(a,b) · Npairs / (cl(a) · cr(b)) )

    with cl/cr the lhs/rhs MARGINAL counts over the same pair stream
    (self-consistent: Σ_a p(a,·) = 1), Npairs the total bigram count.
    Marginals and Npairs are computed over the FULL stream; the
    min_count floor applies only to candidate pairs.  All counts are
    integers, so pmi is ln of an exact ratio — deterministic across
    engines; rank (pmi desc, lhs, rhs) over the 6dp-ROUNDED pmi
    (the rounded-rank contract).

    Scale: the bigram_logprob shuffle shapes — one token explode, a
    per-doc lag window (bounded by doc length), then key-hash aggs on
    (lhs, rhs) / lhs / rhs; at 100 TB cl·cr can exceed int64 — cast
    the marginals to double before the product there (here they stay
    integral so both engines share the exact value).
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
        toks.withColumn("lhs", F.lag("term").over(w))
        .filter(F.col("lhs").isNotNull())
        .select("lhs", F.col("term").alias("rhs"))
    )
    c2 = pairs.groupBy("lhs", "rhs").agg(F.count("*").alias("n"))
    cl = c2.groupBy("lhs").agg(F.sum("n").alias("cl"))
    cr = c2.groupBy("rhs").agg(F.sum("n").alias("cr"))
    tot = c2.agg(F.sum("n").cast("double").alias("npairs"))
    pmi = F.log(
        F.col("n") * F.col("npairs") / (F.col("cl") * F.col("cr"))
    )
    return (
        c2.filter(F.col("n") >= min_count)
        .join(cl, "lhs")
        .join(cr, "rhs")
        .crossJoin(F.broadcast(tot))
        .select("lhs", "rhs", "n", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("lhs"), F.asc("rhs"))
        .limit(topn)
    )


PPL_BUCKETS = 3  # CCNet head / middle / tail


def perplexity_buckets(spark: SparkSession, sf_dir: str,
                       n_buckets: int = PPL_BUCKETS) -> DataFrame:
    """(doc_id, lang, nll, bucket) — CCNet-style per-language
    perplexity terciles: docs ranked within their language by the
    interpolated-bigram nll (bigram_logprob, rounded-6) and cut into
    ``n_buckets`` ntile groups — bucket 1 = head (most fluent),
    ``n_buckets`` = tail.  The rank order (nll asc, doc_id asc) is
    total over rounded values, so the cut is deterministic across
    engines and cluster sizes; the bucket formula is EXACTLY SQL
    ntile's (the first n % k groups take one extra row), pinned
    against DuckDB's ntile in the driver compare.  Docs with < 2
    tokens have no bigrams and are excluded (the bigram_logprob rule).

    Scale: the per-lang rank is NOT a per-lang window (one task per
    language at 100 TB = skew): it rides the two-phase range-partition
    prefix count (ops/prep._prefix_sum over (lang, nll, doc_id)) minus
    broadcast per-language exclusive offsets — partition-count
    invariant, the training_data_prep budget-scan pattern.
    """
    from .prep import _prefix_sum

    nll = bigram_logprob(spark, sf_dir).select("doc_id", "nll")
    lang = documents(spark, sf_dir).select("doc_id", "lang")
    rows = nll.join(lang, "doc_id").withColumn("_one", F.lit(1))
    ranked, _ = _prefix_sum(rows, "_one", ["lang", "nll", "doc_id"])
    per_lang = {
        r["lang"]: r["n"]
        for r in ranked.groupBy("lang").agg(
            F.count("*").alias("n")
        ).collect()
    }
    offs, acc = [], 0
    for lg in sorted(per_lang):
        offs.append((lg, acc, per_lang[lg]))
        acc += per_lang[lg]
    off_df = spark.createDataFrame(
        offs, "lang string, _off long, _n long"
    )
    r = F.col("cum_tokens") - F.col("_off")  # per-lang rank, 1-based
    base = F.floor(F.col("_n") / n_buckets).cast("long")
    rem = (F.col("_n") % n_buckets).cast("long")
    cut = (base + 1) * rem
    bucket = (
        F.when(r <= cut, F.ceil(r / (base + 1)))
        .otherwise(rem + F.ceil((r - cut) / base))
        .cast("long")
    )
    return (
        ranked.join(F.broadcast(off_df), "lang")
        .select("doc_id", "lang", "nll", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


# pinned parameters, interpolated into the DuckDB oracles
# (__spark_entry__.oracle_sql) — change Spark and SQL together
SOURCE_CAP = 12           # max docs kept per source feed
SHUFFLE_SEED = "ep0"      # training-order epoch seed


def source_caps(spark: SparkSession, sf_dir: str,
                cap: int = SOURCE_CAP) -> DataFrame:
    """(doc_id, source, src_rank) — per-source contribution caps: keep
    at most ``cap`` docs from each source feed, selected by hash rank
    (substr(md5(doc_id),1,8) asc, doc_id asc) so the kept subset is an
    unbiased deterministic sample, reproducible across engines and
    cluster sizes (the stratified_sample argument, but count-capped
    instead of rate-thresholded — the C4/Dolma "cap any one domain"
    curation rule).

    Scale: the per-source rank is NOT a per-source window (one task
    per hot source at 100 TB): it rides the two-phase range-partition
    prefix count (_prefix_sum over (source, key, doc_id)) minus
    broadcast per-source exclusive offsets — the perplexity_buckets
    pattern.  The offsets collect is one row per source.
    """
    from .prep import _prefix_sum

    d = documents(spark, sf_dir).select("doc_id", "source")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    rows = d.withColumn("_key", key).withColumn("_one", F.lit(1))
    ranked, _ = _prefix_sum(rows, "_one", ["source", "_key", "doc_id"])
    per_src = {
        r["source"]: r["n"]
        for r in ranked.groupBy("source").agg(
            F.count("*").alias("n")
        ).collect()
    }
    offs, acc = [], 0
    for s in sorted(per_src):
        offs.append((s, acc))
        acc += per_src[s]
    off_df = spark.createDataFrame(offs, "source string, _off long")
    r = (F.col("cum_tokens") - F.col("_off")).cast("long")
    return (
        ranked.join(F.broadcast(off_df), "source")
        .withColumn("src_rank", r)
        .filter(F.col("src_rank") <= cap)
        .select("doc_id", "source", "src_rank")
        .orderBy("source", "src_rank")
    )


def training_shuffle(spark: SparkSession, sf_dir: str,
                     seed: str = SHUFFLE_SEED) -> DataFrame:
    """(doc_id, shuffle_key, pos) — the deterministic global training
    order: every doc gets a seed-keyed hash (md5(seed || ':' ||
    doc_id)) and ``pos`` is its 1-based rank in (shuffle_key asc,
    doc_id asc).  A new seed is a fresh epoch permutation; the same
    seed replays the identical order on any cluster size — the
    rand()-free shuffle a resumable training job needs.

    Scale: the global rank is the two-phase range-partition prefix
    count (_prefix_sum — never a single-partition window); the output
    stays range-partitioned on the order, so a downstream
    write ordered by pos is shuffle-free.
    """
    from .prep import _prefix_sum

    d = documents(spark, sf_dir).select("doc_id")
    skey = F.md5(
        F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))
    )
    rows = (
        d.withColumn("shuffle_key", skey).withColumn("_one", F.lit(1))
    )
    ranked, _ = _prefix_sum(rows, "_one", ["shuffle_key", "doc_id"])
    return ranked.select(
        "doc_id", "shuffle_key",
        F.col("cum_tokens").cast("long").alias("pos"),
    )


# KMV (k-minimum-values) distinct-count sketch — pinned params
KMV_K = 64                # sketch size (k-th smallest hash is the estimator)
KMV_SALT_BUCKETS = 32     # map-side partial-sketch fan-out


def kmv_u32_sql(col: str) -> str:
    """Exact 32-bit unsigned integer from the first 8 hex chars of
    md5(``col``), written as explicit digit arithmetic valid in BOTH
    Spark SQL and DuckDB (instr/substr/cast only — no engine hex-parse
    builtin trusted): shared by kmv_distinct and its oracle, the
    PII_INJECT_SQL pattern — change once."""
    parts = [
        "(cast(instr('0123456789abcdef', "
        f"substr(md5({col}), {i + 1}, 1)) as bigint) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(parts) + ")"


def kmv_distinct(spark: SparkSession, sf_dir: str,
                 k: int = KMV_K) -> DataFrame:
    """(lang, n_exact, kth, n_est) — per-language distinct-BIGRAM
    cardinality estimated by a deterministic KMV (k-minimum-values)
    sketch next to the exact count: hash every distinct
    (lang, lhs, rhs) bigram to a uniform 32-bit value (md5 prefix —
    the deterministic stand-in for the sketch's random hash), keep the
    k smallest DISTINCT hash values, and estimate

        n_est = (k-1) * 2^32 / kth

    with ``kth`` the k-th smallest hash (Bar-Yossef et al.'s KMV /
    Beyer et al.'s unbiased variant).  ``n_exact`` is the evaluation
    column this test-scale op carries so the driver oracle pins both
    the sketch arithmetic and its error; a 100 TB run drops it — that
    is the point of the sketch.

    Scale: the sketch is MERGEABLE — the plan keeps <= k values per
    (lang, salt) map-side partial (collect_set over a salted split of
    the hash space), then merges <= KMV_SALT_BUCKETS * k values per
    language: no full distinct set ever aggregates to one task, the
    exact shape a 1000-executor union of per-partition sketches needs.
    The bigram stream is the bigram_logprob lag window (bounded by doc
    length).  Floats: (k-1)*2^32 is an exact double, one division,
    round-6 — identical IEEE ops on both engines."""
    d = documents(spark, sf_dir).select("doc_id", "lang", "text")
    toks = d.select(
        "doc_id", "lang",
        F.posexplode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("pos", "term"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("lhs", F.lag("term").over(w))
        .filter(F.col("lhs").isNotNull())
        .select("lang", "lhs", F.col("term").alias("rhs"))
        .distinct()
    )
    u32 = F.expr(kmv_u32_sql("concat(lang, ':', lhs, ':', rhs)"))
    hs = pairs.select("lang", u32.alias("u32")).distinct()
    partial = (
        hs.groupBy(
            "lang",
            F.pmod(F.xxhash64("u32"), F.lit(KMV_SALT_BUCKETS)).alias("salt"),
        )
        .agg(F.slice(F.array_sort(F.collect_set("u32")), 1, k).alias("ks"))
    )
    merged = partial.groupBy("lang").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))),
            1, k,
        ).alias("ks")
    )
    exact = pairs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    scale = float((k - 1) * 4294967296.0)
    return (
        merged.select("lang", F.element_at("ks", k).alias("kth"))
        .join(exact, "lang")
        .select(
            "lang", "n_exact", "kth",
            F.round(F.lit(scale) / F.col("kth"), 6).alias("n_est"),
        )
        .orderBy("lang")
    )


WS_N = 50                 # weighted-sample size (exact, without replacement)


def weighted_sample(spark: SparkSession, sf_dir: str,
                    n: int = WS_N) -> DataFrame:
    """(doc_id, w, skey, pos) — an EXACT-size weighted sample without
    replacement, probability proportional to doc length (w = n_chars):
    Efraimidis–Spirakis A-ES keys, derandomized the repo way.  Each doc
    draws u in (0, 1] from its md5 prefix (u = (u32+1)/2^32 — division
    by 2^32 is exact, so ln is the only transcendental, the
    bigram_logprob precedent) and ranks by

        skey = ln(u) / w        (monotone in the A-ES key u^(1/w))

    descending; the top ``n`` ARE the weighted sample.  Unlike
    stratified_sample / temperature_sample (hash-threshold keep rates,
    EXPECTED sizes), this draws an exact-n without-replacement sample
    under importance weights — the token-budget subsample shape.  Same
    seed-free determinism: any engine hashing the same doc_id keeps the
    same docs.

    Scale: the rank is the _prefix_sum two-phase range-partition scan
    over the rounded key (never a single-partition window); rank over
    round-6 skey with doc_id tie-break (the rounded-rank contract)."""
    u32 = kmv_u32_sql("concat('ws:', doc_id)")
    d = (
        documents(spark, sf_dir)
        .select(
            "doc_id",
            F.col("n_chars").alias("w"),
            F.round(
                F.expr(
                    f"ln(({u32} + 1) / 4294967296.0)"
                ) / F.col("n_chars").cast("double"),
                6,
            ).alias("skey"),
        )
        .withColumn("_nkey", -F.col("skey"))
        .withColumn("_one", F.lit(1))
    )
    from .prep import _prefix_sum

    ranked, _ = _prefix_sum(d, "_one", ["_nkey", "doc_id"])
    return (
        ranked.filter(F.col("cum_tokens") <= n)
        .select(
            "doc_id", "w", "skey",
            F.col("cum_tokens").cast("long").alias("pos"),
        )
        .orderBy("pos")
    )


# count-min sketch heavy hitters — pinned params, interpolated into
# the DuckDB oracle — change Spark and SQL together
CMS_D = 4                 # sketch depth (independent hash rows)
CMS_W = 512               # sketch width (buckets per row)
CMS_PHI_DEN = 200         # support threshold = ceil(total_tokens / DEN)


def cms_heavy_hitters(spark: SparkSession, sf_dir: str,
                      d: int = CMS_D, w: int = CMS_W,
                      phi_den: int = CMS_PHI_DEN) -> DataFrame:
    """(term, n_est, n_exact, err) — phi-heavy-hitters from a
    count-min sketch (Cormode & Muthukrishnan): token-occurrence
    counts are folded into a d x w counter array (row r's bucket for
    term t is u32(md5(r ':' t)) % w — the KMV md5 determinism), the
    estimate is the row-wise MIN of the term's counters, and a term is
    surfaced iff its ESTIMATE clears the support threshold
    ceil(total_tokens / phi_den) — sketch-side selection, so the CMS
    one-sided error (n_est >= n_exact always) guarantees NO false
    negatives; err = n_est - n_exact is the collision overcount the
    driver oracle pins exactly.  n_exact is the evaluation column this
    test-scale op carries (the kmv_distinct contract); a 100 TB run
    drops it — that is the point of the sketch.

    All arithmetic is exact BIGINT (counter sums, integer-division
    threshold (total + den - 1) div den, min/compare) — no floats
    cross the compare at all.

    Scale: the counter array is MERGEABLE and fixed-size — per-term
    counts are one map-side-combined shuffle agg, the d x w counters a
    second (d * w rows total, broadcastable), and candidate lookup
    joins terms x d against the BROADCAST counters: no per-doc state,
    no windows, and the sketch memory is constant however large the
    corpus — the exact shape a 1000-executor union of per-partition
    sketches needs."""
    docs = documents(spark, sf_dir).select("doc_id", "text")
    tf = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rows_d = spark.range(d).select(F.col("id").alias("r"))
    keyed = tf.crossJoin(F.broadcast(rows_d)).select(
        "term", "n", "r",
        F.pmod(
            F.expr(kmv_u32_sql("concat(r, ':', term)")), F.lit(w)
        ).alias("bucket"),
    )
    counters = keyed.groupBy("r", "bucket").agg(
        F.sum("n").cast("long").alias("cnt")
    )
    est = (
        keyed.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("term")
        .agg(
            F.min("cnt").cast("long").alias("n_est"),
            F.max("n").cast("long").alias("n_exact"),
        )
    )
    thr = tf.agg(
        F.expr(f"(sum(n) + {phi_den - 1}) div {phi_den}")
        .cast("long").alias("_thr")
    )
    return (
        est.join(F.broadcast(thr))
        .filter(F.col("n_est") >= F.col("_thr"))
        .select(
            "term", "n_est", "n_exact",
            (F.col("n_est") - F.col("n_exact")).cast("long")
            .alias("err"),
        )
        .orderBy(F.desc("n_est"), "term")
    )


def cms_heavy_hitters_oracle_sql(d: int = CMS_D, w: int = CMS_W,
                                 phi_den: int = CMS_PHI_DEN) -> str:
    """DuckDB oracle: the identical sketch built in SQL — same md5
    bucket arithmetic, same BIGINT counter sums, same integer-division
    threshold — so the compare pins collisions exactly, not just the
    surviving term set."""
    u32 = kmv_u32_sql("concat(r, ':', term)")
    return f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text),
                        '{TOKEN_PATTERN}')) AS term
          FROM documents),
        tf AS (SELECT term, count(*)::BIGINT AS n FROM toks
               GROUP BY term),
        rows_d AS (SELECT unnest(range({d})) AS r),
        keyed AS (
          SELECT term, n, r, ({u32}) % {w} AS bucket
          FROM tf CROSS JOIN rows_d),
        counters AS (
          SELECT r, bucket, sum(n)::BIGINT AS cnt
          FROM keyed GROUP BY r, bucket),
        est AS (
          SELECT k.term,
                 min(c.cnt)::BIGINT AS n_est,
                 max(k.n)::BIGINT AS n_exact
          FROM keyed k JOIN counters c USING (r, bucket)
          GROUP BY k.term),
        thr AS (
          SELECT (sum(n)::BIGINT + {phi_den - 1}) // {phi_den}
                 AS t FROM tf)
        SELECT term, n_est, n_exact,
               (n_est - n_exact)::BIGINT AS err
        FROM est CROSS JOIN thr
        WHERE n_est >= t
        ORDER BY n_est DESC, term
    """
