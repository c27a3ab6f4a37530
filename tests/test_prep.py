"""training_data_prep (ops/prep.py): composition semantics and the
partition-count invariance of the distributed budget prefix sum.

The value-level Spark-vs-DuckDB check runs in the driver contract
(__spark_entry__.oracle_sql['training_data_prep']); these tests pin the
properties the SQL compare can't see — that the two-phase prefix sum is
independent of parallelism, and that the dedup stages actually remove
what they claim.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.ops.prep import (
    PREP_BUDGET_FRAC,
    _prefix_sum,
    training_data_prep,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def prep_df(spark):
    return training_data_prep(spark, SF).toPandas()


def test_prefix_sum_partition_invariant(spark):
    rows = [(i, (i * 37) % 11 + 1, float((i * 13) % 7) / 10.0)
            for i in range(1, 501)]
    df = spark.createDataFrame(rows, "doc_id long, v long, key double")
    outs, totals = [], []
    for n_parts in (1, 3, 16):
        cum, total = _prefix_sum(df, "v", ["key", "doc_id"],
                                 n_parts=n_parts)
        out = (
            cum.select("doc_id", "cum_tokens")
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
        totals.append(total)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    # the running sum over the (key, doc_id) order equals a serial scan
    serial = sorted(rows, key=lambda r: (r[2], r[0]))
    acc, expect = 0, {}
    for doc_id, v, _ in serial:
        acc += v
        expect[doc_id] = acc
    got = dict(zip(outs[0]["doc_id"], outs[0]["cum_tokens"]))
    assert got == expect
    assert totals == [acc, acc, acc]


def test_prep_dedup_and_gate(spark, prep_df):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # exact duplicates: at most one survivor per sha256(text)
    kept = docs.filter(
        F.col("doc_id").isin([int(x) for x in prep_df["doc_id"]])
    )
    sha_counts = (
        kept.groupBy(F.sha2("text", 256).alias("sha"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert sha_counts == 0
    # near-duplicates: the local-min rule means NO candidate pair may
    # survive intact — any pair within the output would have had its
    # b-side dropped
    from searchengine_spark.ops.dedup import minhash_pairs

    assert minhash_pairs(kept.select("doc_id", "text")).count() == 0
    # gates hold on every emitted row
    assert (prep_df["n_tokens"] >= 30).all()
    assert (prep_df["stopword_ratio"] <= 0.30).all()


def test_prep_budget_cut(prep_df):
    assert len(prep_df) > 0
    # selection order is (stopword_ratio asc, doc_id asc) and cum_tokens
    # is the running piece total in that order
    ordered = prep_df.sort_values(["stopword_ratio", "doc_id"]).reset_index(
        drop=True
    )
    assert (ordered["cum_tokens"].values
            == ordered["n_pieces_bpe"].cumsum().values).all()
    assert (ordered["cum_tokens"].values
            == sorted(ordered["cum_tokens"].values)).all()


def test_prep_budget_is_binding(spark):
    # the cut must drop SOMETHING at frac=0.5 on this corpus (if the
    # gate output fits the budget entirely, the operator is vacuous)
    full = training_data_prep(spark, SF, budget_frac=1.0).toPandas()
    half = training_data_prep(spark, SF).toPandas()
    assert PREP_BUDGET_FRAC == 0.5
    assert len(half) < len(full)
    assert set(half["doc_id"]).issubset(set(full["doc_id"]))


def test_prep_plan_shape(spark):
    """Pin the scale-relevant plan properties: no cartesian product, no
    nested-loop broadcast (the budget is a driver-side literal, not a
    1-row crossJoin), and at most the 1-row aggregate's single-partition
    exchange."""
    df = training_data_prep(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=10**6),
                  min_size=1, max_size=200),
    n_parts=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_prefix_sum_property(spark_prop, vals, n_parts, seed):
    """Σ-prefix over ANY (possibly heavily tied) float key distribution
    equals the serial scan, at any partition count."""
    import random

    rng = random.Random(seed)
    rows = [
        (i + 1, v, float(rng.choice([0.0, 0.25, 0.5, rng.random()])))
        for i, v in enumerate(vals)
    ]
    df = spark_prop.createDataFrame(rows, "doc_id long, v long, key double")
    cum, total = _prefix_sum(df, "v", ["key", "doc_id"], n_parts=n_parts)
    got = dict(
        cum.select("doc_id", "cum_tokens").toPandas().itertuples(
            index=False, name=None
        )
    )
    acc, expect = 0, {}
    for doc_id, v, _ in sorted(rows, key=lambda r: (r[2], r[0])):
        acc += v
        expect[doc_id] = acc
    assert got == expect
    assert total == acc


def test_pack_sequences_match_python(spark):
    """Sequence packing equals the sequential recomputation: cut the
    doc_id-ordered concatenated token stream into seq_len windows."""
    import re

    from searchengine_spark.ops.prep import PACK_SEQ_LEN, pack_sequences

    sf = "/root/testdata/sf0.001"
    counts = {
        r["doc_id"]: len(re.findall(r"[a-z0-9]+", r["text"].lower()))
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    L = PACK_SEQ_LEN
    want = {}
    gpos = 0
    for d in sorted(counts):
        n = counts[d]
        if n == 0:
            continue
        start, end = gpos, gpos + n
        gpos = end
        for s in range(start // L, (end - 1) // L + 1):
            ov = min(end, (s + 1) * L) - max(start, s * L)
            nd, nt, fd, ld = want.get(s, (0, 0, d, d))
            want[s] = (nd + 1, nt + ov, min(fd, d), max(ld, d))
    got = {
        r["seq_id"]: (
            r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"],
        )
        for r in pack_sequences(spark, sf).collect()
    }
    assert got == want
    # every sequence but the tail is exactly full
    full = sorted(got)[:-1]
    assert all(got[s][1] == L for s in full)
    assert got[max(got)][1] <= L
