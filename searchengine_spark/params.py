"""Scoring parameters (analogue of reference lib/params.py:1-49).

All ranking weights live here so the Spark engine and the single-node
oracle share one source of truth.  The blend structure mirrors the
reference (lib/params.py:22-49); the relevance scorer itself is BM25 per
the north rule (reference used tf-idf, lib/queryproc.py:64-78).
"""


def _assert_sum_is_one(*args, msg=""):
    s = sum(args)
    assert 1 - 1e-5 <= s <= 1 + 1e-5, msg


# --- BM25 (north-rule scorer; k1/b pinned) ---------------------------------
BM25_K1 = 1.2
BM25_B = 0.75

# --- importance multipliers (reference lib/params.py:9-19) ------------------
# Index 0..8; the reference's indexer has a load-bearing bug
# (makeindex.py:234 assigns a local `importance` instead of `important`)
# so every posting is written with important=0 and the multiplier is the
# constant importance[0].  We carry the field (constant 0) for parity.
IMPORTANCE = [0.8, 3.5, 2.5, 2.1, 1.6, 1.3, 1.1, 1.1, 1.0]

# --- blend weights (reference lib/params.py:22-49) --------------------------
NET_RELEVANCE_FACTOR = 0.61
QUALITY_FACTOR = 1 - NET_RELEVANCE_FACTOR
_assert_sum_is_one(NET_RELEVANCE_FACTOR, QUALITY_FACTOR, msg="net factors")

TFIDF_FACTOR = 0.73           # weight of the (BM25) accumulation component
COSINE_FACTOR = 1 - TFIDF_FACTOR
_assert_sum_is_one(TFIDF_FACTOR, COSINE_FACTOR, msg="relevance factors")

PR_FACTOR = 0.59
HUB_FACTOR = 0.23
AUTH_FACTOR = 0.18
_assert_sum_is_one(PR_FACTOR, HUB_FACTOR, AUTH_FACTOR, msg="quality factors")

# cosine gate: documents whose query cosine is <= this get relevance 0
# (reference lib/queryproc.py:118)
COSINE_GATE = 0.4

# query pruning (reference lib/queryproc.py:219, 226-227)
PRUNE_ABORT_RATIO = 2          # abort when pruned > ratio * valid
STOPWORD_SIGNIFICANCE = 0.4    # readmit stopwords when >= 0.4 * valid unique

# --- graph scores (reference lib/pagerank.py:8, lib/hits.py:15) -------------
PR_DAMPING = 0.85
PR_MAX_ITER = 25
PR_TOL = 1e-6
HITS_MAX_ITER = 25
HITS_TOL = 1e-6

# --- index layout -----------------------------------------------------------
POSTING_BLOCK = 128     # postings per compressed block (skip-pointer grain)
N_TERM_BUCKETS = 64     # hash buckets for the on-disk index partitioning
SIMHASH_BITS = 32       # reference lib/duphash.py:118
SIMHASH_HAMMING = 3     # reference lib/duphash.py:141
SIMHASH_BANDS = 4       # 4 bands x 8 bits: Hamming<=3 guarantees >=1 equal band


def importance_mult_col(important_col):
    """Spark Column: params.IMPORTANCE multiplier for an ``important``
    priority column — out-of-table priorities (custom extractors may
    emit up to 15) fall back to the untagged multiplier, matching the
    SQL oracle's CASE ... ELSE and never a NULL that would silently
    drop a term's contribution.  ONE definition shared by the
    in-memory scorer (query/scoring.py), the importance-payload index
    writer's WAND bound (index/shards.py), and the on-disk scorers."""
    from pyspark.sql import functions as F

    return F.when(
        important_col.between(0, len(IMPORTANCE) - 1),
        F.element_at(
            F.array(*[F.lit(float(m)) for m in IMPORTANCE]),
            important_col.cast("int") + 1,
        ),
    ).otherwise(F.lit(float(IMPORTANCE[0])))
