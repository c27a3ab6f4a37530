"""Relational OLAP over the TPC-H-shaped tables ([NORTH-EXT]).

The driver testdata ships trimmed TPC-H tables (lineitem/orders/
customer/supplier/nation/region/part) next to the text corpus; this
module serves the classic warehouse side of the analytics engine —
pricing summary (Q1), shipping priority (Q3), and local supplier
volume (Q5) — as declarative DataFrame plans whose physical shape is
the one a 100 TB fact table needs and whose values are bit-exact
against the DuckDB oracles.

Float discipline (the repo's cross-engine contract, hardened for
money): all monetary inputs are cents/percent-exact doubles, so every
sum is taken over EXACT integer units — cents for prices, 1e-4
dollars for price·(1-disc), 1e-6 dollars for price·(1-disc)·(1+tax)
(each true value is an integer in those units; the double product's
error is a few ulps, far below the 0.5 rounding margin) — and BIGINT
sums divide back to dollars in the identical expression order on both
engines.  No order-dependent double accumulation anywhere.

Plan discipline (asserted in tests/test_relational.py):
 * Q1 is one scan + one key-hash agg; the l_shipdate predicate reaches
   the parquet scan (PushedFilters) and column pruning reads only the
   7 needed columns (ReadSchema).
 * Q3/Q5 broadcast every dimension side explicitly (customer 1.5 k
   rows, supplier 100, nation 25, region 5) — the fact table
   (lineitem) is never shuffled for a join; the only shuffle is the
   final aggregation on the group key.  At 1000 executors that is the
   textbook star-join: dims replicated, fact streamed once.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# pinned parameters, interpolated into the DuckDB oracles — change
# Spark and SQL together
Q1_CUTOFF = "1998-09-02"
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-03-15"
Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1997-01-01"

# shared exact-integer-unit expressions (Spark SQL and DuckDB agree on
# every function here; interpolated into both engines)
_CENTS = "cast(round(l_extendedprice * 100) as bigint)"
_DISC_PCT = "cast(round(l_discount * 100) as bigint)"
_DISC_E4 = (
    "cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint)"
)
_CHARGE_E6 = (
    "cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
    "* 1000000) as bigint)"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tpch_q1(spark: SparkSession, sf_dir: str,
            cutoff: str = Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1 pricing summary: per (returnflag, linestatus) sums and
    averages over lineitem shipped on or before ``cutoff``."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(cutoff)
    )
    agg = (
        li.select(
            "l_returnflag", "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            F.expr(_CENTS).alias("cents"),
            F.expr(_DISC_PCT).alias("dpct"),
            F.expr(_DISC_E4).alias("de4"),
            F.expr(_CHARGE_E6).alias("ce6"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("long").alias("sq"),
            F.sum("cents").cast("long").alias("sc"),
            F.sum("dpct").cast("long").alias("sd"),
            F.sum("de4").cast("long").alias("s4"),
            F.sum("ce6").cast("long").alias("s6"),
            F.count("*").cast("long").alias("count_order"),
        )
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag", "l_linestatus",
        F.col("sq").alias("sum_qty"),
        (F.col("sc").cast("double") / F.lit(100.0)).alias(
            "sum_base_price"
        ),
        (F.col("s4").cast("double") / F.lit(10000.0)).alias(
            "sum_disc_price"
        ),
        (F.col("s6").cast("double") / F.lit(1000000.0)).alias(
            "sum_charge"
        ),
        F.round(F.col("sq").cast("double") / n, 6).alias("avg_qty"),
        F.round(
            F.col("sc").cast("double") / F.lit(100.0) / n, 6
        ).alias("avg_price"),
        F.round(
            F.col("sd").cast("double") / F.lit(100.0) / n, 6
        ).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def tpch_q1_oracle_sql(cutoff: str = Q1_CUTOFF) -> str:
    return f"""
        WITH x AS (
          SELECT l_returnflag, l_linestatus,
                 l_quantity::BIGINT AS qty,
                 {_CENTS} AS cents, {_DISC_PCT} AS dpct,
                 {_DISC_E4} AS de4, {_CHARGE_E6} AS ce6
          FROM lineitem WHERE l_shipdate <= '{cutoff}'),
        a AS (
          SELECT l_returnflag, l_linestatus,
                 sum(qty)::BIGINT AS sq, sum(cents)::BIGINT AS sc,
                 sum(dpct)::BIGINT AS sd, sum(de4)::BIGINT AS s4,
                 sum(ce6)::BIGINT AS s6,
                 count(*)::BIGINT AS count_order
          FROM x GROUP BY l_returnflag, l_linestatus)
        SELECT l_returnflag, l_linestatus,
               sq AS sum_qty,
               sc::DOUBLE / 100.0 AS sum_base_price,
               s4::DOUBLE / 10000.0 AS sum_disc_price,
               s6::DOUBLE / 1000000.0 AS sum_charge,
               round(sq::DOUBLE / count_order::DOUBLE, 6) AS avg_qty,
               round(sc::DOUBLE / 100.0 / count_order::DOUBLE, 6)
                 AS avg_price,
               round(sd::DOUBLE / 100.0 / count_order::DOUBLE, 6)
                 AS avg_disc,
               count_order
        FROM a ORDER BY l_returnflag, l_linestatus
    """


def tpch_q3(spark: SparkSession, sf_dir: str, segment: str = Q3_SEGMENT,
            date: str = Q3_DATE, k: int = 10) -> DataFrame:
    """TPC-H Q3 shipping priority: top-k open orders of one market
    segment by discounted revenue.  customer broadcasts; lineitem (the
    fact) is shuffled only by the final group key."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == segment
    ).select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(date)
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(date)
    ).select("l_orderkey", F.expr(_DISC_E4).alias("de4"))
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey,
                ).select("o_orderkey", "o_orderdate")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum("de4").cast("long").alias("r4"))
        .select(
            "l_orderkey",
            (F.col("r4").cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                "o_orderdate"
            ),
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(k)
    )


def tpch_q3_oracle_sql(segment: str = Q3_SEGMENT, date: str = Q3_DATE,
                       k: int = 10) -> str:
    return f"""
        SELECT l_orderkey,
               sum({_DISC_E4})::BIGINT::DOUBLE / 10000.0 AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = '{segment}'
          AND o_orderdate < '{date}'
          AND l_shipdate > '{date}'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT {k}
    """


def tpch_q5(spark: SparkSession, sf_dir: str, region: str = Q5_REGION,
            lo: str = Q5_DATE_LO, hi: str = Q5_DATE_HI) -> DataFrame:
    """TPC-H Q5 local supplier volume: revenue per nation of one
    region, customer and supplier in the SAME nation.  Every dimension
    broadcasts (region→nation→customer/supplier chain); the fact
    shuffles once, on the final n_name group key."""
    nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == region
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nat),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_nationkey").alias("c_nk"),
                "n_name")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").alias("s_nk")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo))
        & (F.col("o_orderdate") < F.lit(hi))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.expr(_DISC_E4).alias("de4")
    )
    return (
        li.join(
            F.broadcast(
                orders.join(
                    F.broadcast(cust),
                    orders.o_custkey == cust.c_custkey,
                ).select("o_orderkey", "c_nk", "n_name")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nk") == F.col("s_nk"))
        .groupBy("n_name")
        .agg(F.sum("de4").cast("long").alias("r4"))
        .select(
            "n_name",
            (F.col("r4").cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def tpch_q5_oracle_sql(region: str = Q5_REGION, lo: str = Q5_DATE_LO,
                       hi: str = Q5_DATE_HI) -> str:
    return f"""
        SELECT n_name,
               sum({_DISC_E4})::BIGINT::DOUBLE / 10000.0 AS revenue
        FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
            AND c_nationkey = s_nationkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '{region}'
          AND o_orderdate >= '{lo}' AND o_orderdate < '{hi}'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """


Q14_LO = "1996-01-01"
Q14_HI = "1996-02-01"
Q4_LO = "1996-01-01"
Q4_HI = "1996-04-01"


def tpch_q14(spark: SparkSession, sf_dir: str, lo: str = Q14_LO,
             hi: str = Q14_HI) -> DataFrame:
    """TPC-H Q14 promotion effect: the percentage of one month's
    discounted revenue from PROMO-type parts.  part broadcasts;
    the ratio divides two exact BIGINT sums in the identical
    expression order on both engines, round-6."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(lo))
        & (F.col("l_shipdate") < F.lit(hi))
    ).select("l_partkey", F.expr(_DISC_E4).alias("de4"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    )
    agg = j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("de4"))
            .otherwise(F.lit(0))
        ).cast("long").alias("promo4"),
        F.sum("de4").cast("long").alias("total4"),
    )
    return agg.select(
        F.round(
            F.lit(100.0) * F.col("promo4").cast("double")
            / F.col("total4").cast("double"), 6
        ).alias("promo_revenue_pct")
    )


def tpch_q14_oracle_sql(lo: str = Q14_LO, hi: str = Q14_HI) -> str:
    return f"""
        WITH x AS (
          SELECT p_type, {_DISC_E4} AS de4
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= '{lo}' AND l_shipdate < '{hi}'),
        a AS (
          SELECT sum(CASE WHEN p_type = 'PROMO' THEN de4 ELSE 0 END)
                   ::BIGINT AS promo4,
                 sum(de4)::BIGINT AS total4
          FROM x)
        SELECT round(100.0 * promo4::DOUBLE / total4::DOUBLE, 6)
                 AS promo_revenue_pct
        FROM a
    """


def tpch_q4(spark: SparkSession, sf_dir: str, lo: str = Q4_LO,
            hi: str = Q4_HI) -> DataFrame:
    """TPC-H Q4 (adapted to the trimmed schema): per order priority,
    the count of one quarter's orders with at least one lineitem
    shipped AFTER the order date — an EXISTS over the fact table,
    i.e. a LEFT SEMI join on the order key with a correlated range
    condition (the plan shape Q4 exists to exercise; the classic
    commitdate/receiptdate columns are not in this table).

    Scale: semi-join on l_orderkey — one key-hash shuffle of each
    fact-side projection, no row multiplication (semi stops at the
    first match), then a 5-group count."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo))
        & (F.col("o_orderdate") < F.lit(hi))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q4_oracle_sql(lo: str = Q4_LO, hi: str = Q4_HI) -> str:
    return f"""
        SELECT o_orderpriority, count(*)::BIGINT AS order_count
        FROM orders
        WHERE o_orderdate >= '{lo}' AND o_orderdate < '{hi}'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


def pricing_rollup(spark: SparkSession, sf_dir: str,
                   cutoff: str = Q1_CUTOFF) -> DataFrame:
    """Q1's sums at every grouping level at once — GROUP BY ROLLUP
    (returnflag, linestatus): per-pair rows, per-returnflag subtotals,
    and the grand total in ONE pass (Spark rollup == SQL ROLLUP, a
    single shuffle producing all grouping sets).  Rolled-up group
    columns surface as 'ALL' (coalesce on both engines — NULL group
    markers must not cross the driver compare).  Money stays in exact
    BIGINT cents."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(cutoff)
    ).select(
        "l_returnflag", "l_linestatus",
        F.expr(_CENTS).alias("cents"),
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("cents").cast("long").alias("sum_cents"),
            F.count("*").cast("long").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias(
                "returnflag"
            ),
            F.coalesce("l_linestatus", F.lit("ALL")).alias(
                "linestatus"
            ),
            "sum_cents", "n_items",
        )
        .orderBy("returnflag", "linestatus")
    )


def pricing_rollup_oracle_sql(cutoff: str = Q1_CUTOFF) -> str:
    return f"""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               sum({_CENTS})::BIGINT AS sum_cents,
               count(*)::BIGINT AS n_items
        FROM lineitem WHERE l_shipdate <= '{cutoff}'
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus
    """


BUCKETS = 8


def bucketed_revenue(spark: SparkSession, sf_dir: str,
                     n_buckets: int = BUCKETS) -> DataFrame:
    """Revenue per order priority through Spark-NATIVE bucketed tables
    — the co-located fact-to-fact join the star-join playbook cannot
    broadcast: orders and lineitem are written ``bucketBy(n,
    orderkey).sortBy(orderkey)`` (external parquet tables), so the
    join aligns bucket-to-bucket and runs WITHOUT a join-side shuffle
    (plan-asserted in tests/test_relational.py: SortMergeJoin with no
    Exchange on either join key; the only exchange left is the final
    5-group agg).  At 100 TB this is the difference between shuffling
    the fact table once per join and never: bucketing pays the
    partitioning cost once at write time and every subsequent
    orderkey join rides it free.

    Values are bucketing-invisible (the DuckDB oracle is the plain
    join) and follow the exact-integer-units money discipline."""
    import hashlib
    import os
    import tempfile

    sig = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{n_buckets}".encode()
    ).hexdigest()[:12]
    base = os.path.join(
        tempfile.gettempdir(), f"se_spark_bucketed_{sig}"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.expr(_DISC_E4).alias("de4")
    )
    specs = (
        ("se_orders_b", orders, "o_orderkey"),
        ("se_lineitem_b", li, "l_orderkey"),
    )
    for name, df, key in specs:
        (
            df.write.format("parquet")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", os.path.join(base, name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    ob = spark.table("se_orders_b")
    lb = spark.table("se_lineitem_b")
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("de4").cast("long").alias("r4"))
        .select(
            "o_orderpriority",
            (F.col("r4").cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
        )
        .orderBy("o_orderpriority")
    )


def bucketed_revenue_oracle_sql() -> str:
    return f"""
        SELECT o_orderpriority,
               sum({_DISC_E4})::BIGINT::DOUBLE / 10000.0 AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """


# Q6 forecasting-revenue-change parameters (pinned, interpolated into
# the oracle — change Spark and SQL together).  The discount bounds
# are exact double literals shared by both engines (testdata discounts
# are exact hundredths, so >=/<= on the identical literals is safe).
Q6_DATE_LO = "1996-01-01"
Q6_DATE_HI = "1997-01-01"
Q6_DISC_LO = 0.05
Q6_DISC_HI = 0.07
Q6_QTY = 24


def tpch_q6(spark: SparkSession, sf_dir: str,
            date_lo: str = Q6_DATE_LO, date_hi: str = Q6_DATE_HI,
            disc_lo: float = Q6_DISC_LO, disc_hi: float = Q6_DISC_HI,
            qty: int = Q6_QTY) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: one fact-only scan with
    every predicate (shipdate range, discount band, quantity cap)
    pushed to the parquet reader — the purest pushdown showcase in
    the family (plan-asserted: all three columns appear in
    PushedFilters, ReadSchema reads only the 4 needed columns).

    revenue = sum(l_extendedprice * l_discount): cents × discount-pct
    is an EXACT BIGINT product in 1e-4-dollar units (both factors are
    exact integers), so the sum is order-free and the single divide
    back to dollars is bit-identical across engines — no rounding
    anywhere."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(date_lo))
        & (F.col("l_shipdate") < F.lit(date_hi))
        & (F.col("l_discount") >= F.lit(disc_lo))
        & (F.col("l_discount") <= F.lit(disc_hi))
        & (F.col("l_quantity") < F.lit(qty))
    )
    return li.select(
        (F.expr(_CENTS) * F.expr(_DISC_PCT)).alias("e4")
    ).agg(
        (
            F.coalesce(F.sum("e4"), F.lit(0)).cast("double")
            / F.lit(10000.0)
        ).alias("revenue"),
        F.count("*").cast("long").alias("n_items"),
    )


def tpch_q6_oracle_sql(date_lo: str = Q6_DATE_LO,
                       date_hi: str = Q6_DATE_HI,
                       disc_lo: float = Q6_DISC_LO,
                       disc_hi: float = Q6_DISC_HI,
                       qty: int = Q6_QTY) -> str:
    return f"""
        SELECT coalesce(sum({_CENTS} * {_DISC_PCT}), 0)::DOUBLE
                 / 10000.0 AS revenue,
               count(*)::BIGINT AS n_items
        FROM lineitem
        WHERE l_shipdate >= '{date_lo}' AND l_shipdate < '{date_hi}'
          AND l_discount >= {repr(float(disc_lo))}
          AND l_discount <= {repr(float(disc_hi))}
          AND l_quantity < {qty}
    """


# Q19 discounted-revenue parameters, ADAPTED to the trimmed part
# schema (no p_container/l_shipmode in the testdata): each branch is
# (brand, max_size, qty_lo, qty_hi) — the OR-of-ANDs spanning both
# tables that makes Q19 the disjunctive-predicate benchmark.  Pinned +
# interpolated into the oracle.
Q19_BRANCHES = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#3", 15, 20, 30),
)


def tpch_q19(spark: SparkSession, sf_dir: str,
             branches=Q19_BRANCHES) -> DataFrame:
    """TPC-H Q19 discounted revenue (trimmed-schema adaptation): the
    classic OR-of-ANDs across lineitem × part — each branch constrains
    a part attribute band AND a lineitem quantity band, so no single
    branch predicate can be pushed to either scan alone; the plan the
    fact table wants is part BROADCAST (dim-sized) and lineitem
    streamed ONCE with the disjunction evaluated post-join
    (plan-asserted: broadcast hash join, no shuffle before the final
    single-group agg).  Money follows the exact-1e-4-unit discipline;
    the one divide is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    cond = None
    for brand, szhi, qlo, qhi in branches:
        c = (
            (F.col("p_brand") == F.lit(brand))
            & (F.col("p_size") >= F.lit(1))
            & (F.col("p_size") <= F.lit(szhi))
            & (F.col("l_quantity") >= F.lit(qlo))
            & (F.col("l_quantity") <= F.lit(qhi))
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(F.broadcast(pt),
                F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .select(F.expr(_DISC_E4).alias("e4"))
        .agg(
            (
                F.coalesce(F.sum("e4"), F.lit(0)).cast("double")
                / F.lit(10000.0)
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def tpch_q19_oracle_sql(branches=Q19_BRANCHES) -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {sz}"
        f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, sz, qlo, qhi in branches
    )
    return f"""
        SELECT coalesce(sum({_DISC_E4}), 0)::DOUBLE / 10000.0
                 AS revenue,
               count(*)::BIGINT AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE {ors}
    """


Q17_BRAND = "Brand#1"


def tpch_q17(spark: SparkSession, sf_dir: str,
             brand: str = Q17_BRAND) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: average yearly revenue
    lost if small orders (quantity below 20% of the part's average)
    of one brand's parts were not filled — THE correlated-scalar-
    subquery query, decorrelated the Spark way: the per-part average
    becomes one aggregate joined back on p_partkey (never a per-row
    subquery), with the brand's part keys broadcast-semi-filtering the
    fact table FIRST so the avg agg only touches the brand's
    lineitems (the avg per part over that subset IS the full per-part
    avg — part membership, not a lineitem filter).

    Floats: l_quantity is integer-valued (1..50), so per-part sums
    are exact doubles regardless of order, avg = exact/count and
    0.2*avg are bit-identical on both engines; revenue sums exact
    cents ({_CENTS}) and divides once by 700.0, round-6."""
    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == brand)
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", F.expr(_CENTS).alias("cents")
    )
    li_b = li.join(
        F.broadcast(parts), li.l_partkey == parts.p_partkey
    ).select("l_partkey", "l_quantity", "cents")
    thr = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_thr")
    )
    return (
        li_b.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_thr"))
        .agg(F.sum("cents").cast("long").alias("_c"))
        .select(
            F.round(
                F.col("_c").cast("double") / F.lit(700.0), 6
            ).alias("avg_yearly")
        )
    )


def tpch_q17_oracle_sql(brand: str = Q17_BRAND) -> str:
    return f"""
        WITH pb AS (SELECT p_partkey FROM part
                    WHERE p_brand = '{brand}'),
        lb AS (
          SELECT l_partkey, l_quantity, {_CENTS} AS cents
          FROM lineitem JOIN pb ON l_partkey = p_partkey),
        thr AS (
          SELECT l_partkey, 0.2 * avg(l_quantity) AS t
          FROM lb GROUP BY l_partkey)
        SELECT round(sum(cents)::BIGINT::DOUBLE / 700.0, 6)
                 AS avg_yearly
        FROM lb JOIN thr USING (l_partkey)
        WHERE l_quantity < t
    """
