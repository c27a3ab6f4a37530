"""PII detection and redaction over the documents corpus.

Training-data pipelines scrub personally-identifiable spans (emails,
IP addresses, long digit runs — phone/account/card numbers) before any
text leaves the curation tier.  Reference analogue: the reference
engine has no scrub pass (its corpus is crawled course pages,
lib/worker.py:30-61 ingests content verbatim); this is [NORTH-EXT]
surface required by the 100 TB training-data mandate.

Design:

 * Pure columnar regexp expressions (``regexp_count`` /
   ``regexp_replace``) — JVM-side, whole-stage codegen, no Python in
   the hot path, no shuffle at all for the scrub itself (the plan is
   scan → project; at 100 TB it is embarrassingly parallel and
   bandwidth-bound only).
 * The patterns stay inside the Java-regex / RE2-identical subset
   (literal classes, bounded + unbounded quantifiers, ``\\.`` escapes
   — the regex_search discipline, ops/textops.regex_literal_runs):
   leftmost non-overlapping match/replace semantics are identical in
   Spark and DuckDB, so the driver oracle is an exact value compare.
 * Replacement order is pinned EMAIL → IP → NUM and the replacement
   tokens contain no digits/dots, so no replacement can create or
   destroy a later pattern's match.  Change Spark and SQL together.

The synthetic test corpus contains no PII-shaped spans (verified: zero
matches for all three patterns at every SF), so the driver entries
inject deterministic PII into a doc_id-keyed subset via IDENTICAL
string expressions in both engines (the phrase_suggest pattern:
synthesize the probe from data so the op is non-vacuous).  One branch
in four stays clean — the no-op path is exercised too.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import documents

# pinned parameters, interpolated into the DuckDB oracles
# (__spark_entry__.oracle_sql) — change Spark and SQL together
PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IP_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
PII_NUM_RE = r"[0-9]{9,}"
PII_INJECT_MOD = 4  # hash branch: 0 email, 1 ip, 2 number, 3 clean


def pii_inject_col(text_col="text", id_col="doc_id"):
    """The deterministic PII-injection expression — HASH-keyed string
    concat (branch = ascii(first md5 hex char) % 4: decorrelated from
    the synthetic corpus's doc_id-modulus source/lang columns, so the
    per-source summary is discriminative), byte-identical to the SQL
    oracle's CASE (pure ``||`` of VARCHAR casts; no floats, no
    locale).  Branch 3 returns the text unchanged (clean-path
    coverage)."""
    t = F.col(text_col)
    d = F.col(id_col)
    ds = d.cast("string")
    br = F.ascii(F.substring(F.md5(ds), 1, 1)) % PII_INJECT_MOD
    return (
        F.when(
            br == 0,
            F.concat(t, F.lit(" contact user"), ds, F.lit("@example.com asap")),
        )
        .when(
            br == 1,
            F.concat(
                t,
                F.lit(" seen from 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
                F.lit(" today"),
            ),
        )
        .when(
            br == 2,
            F.concat(t, F.lit(" ref 4111111111"), (d % 1000).cast("string"), F.lit(" end")),
        )
        .otherwise(t)
    )


PII_INJECT_SQL = f"""CASE
      WHEN ascii(substr(md5(doc_id::VARCHAR), 1, 1)) % {PII_INJECT_MOD} = 0
        THEN text || ' contact user' || doc_id::VARCHAR || '@example.com asap'
      WHEN ascii(substr(md5(doc_id::VARCHAR), 1, 1)) % {PII_INJECT_MOD} = 1
        THEN text || ' seen from 10.' || (doc_id % 256)::VARCHAR
                  || '.0.' || (doc_id % 100)::VARCHAR || ' today'
      WHEN ascii(substr(md5(doc_id::VARCHAR), 1, 1)) % {PII_INJECT_MOD} = 2
        THEN text || ' ref 4111111111' || (doc_id % 1000)::VARCHAR || ' end'
      ELSE text END"""


def pii_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_email, n_ip, n_num) — per-doc counts of each PII
    class over the injected text.  Counts are leftmost non-overlapping
    (regexp_count == len(regexp_extract_all) for this pattern subset,
    the regex_search contract)."""
    d = documents(spark, sf_dir).select(
        "doc_id", pii_inject_col().alias("_t")
    )
    return d.select(
        "doc_id",
        F.regexp_count("_t", F.lit(PII_EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count("_t", F.lit(PII_IP_RE)).cast("long").alias("n_ip"),
        F.regexp_count("_t", F.lit(PII_NUM_RE)).cast("long").alias("n_num"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_redactions, clean_text) — the redacted corpus.
    Replacement order EMAIL → IP → NUM is pinned (module docstring:
    tokens are digit/dot-free so stages cannot interact); n_redactions
    counts matches on the PRE-scrub text, so it equals the number of
    spans replaced."""
    d = documents(spark, sf_dir).select(
        "doc_id", pii_inject_col().alias("_t")
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("_t"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_NUM_RE,
        "<NUM>",
    )
    n = (
        F.regexp_count("_t", F.lit(PII_EMAIL_RE))
        + F.regexp_count("_t", F.lit(PII_IP_RE))
        + F.regexp_count("_t", F.lit(PII_NUM_RE))
    ).cast("long")
    return d.select(
        "doc_id", n.alias("n_redactions"), clean.alias("clean_text")
    )


def pii_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, docs_with_pii, n_email, n_ip, n_num) — the
    curation-report rollup per source feed: how dirty is each feed and
    with what.  One shuffle agg over the columnar counts."""
    d = documents(spark, sf_dir).select(
        "doc_id", "source", pii_inject_col().alias("_t")
    )
    per = d.select(
        "source",
        F.regexp_count("_t", F.lit(PII_EMAIL_RE)).cast("long").alias("e"),
        F.regexp_count("_t", F.lit(PII_IP_RE)).cast("long").alias("i"),
        F.regexp_count("_t", F.lit(PII_NUM_RE)).cast("long").alias("n"),
    )
    return per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(
            ((F.col("e") + F.col("i") + F.col("n")) > 0).cast("long")
        ).cast("long").alias("docs_with_pii"),
        F.sum("e").cast("long").alias("n_email"),
        F.sum("i").cast("long").alias("n_ip"),
        F.sum("n").cast("long").alias("n_num"),
    ).orderBy("source")
