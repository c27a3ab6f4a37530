"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at the given sf dir and
compares against oracle_sql() via DuckDB: row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).
"""

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from searchengine_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir="/root/testdata/sf0.01"):
    spark = get_spark(app="contract-check", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        el = time.time() - t0
        if name not in osql:
            print(f"{name:20s} rows-only: {len(sdf)} rows  ({el:.1f}s)")
            continue
        odf = con.sql(osql[name]).df()
        status = "OK"
        if len(sdf) != len(odf):
            status = f"ROWCOUNT {len(sdf)} vs {len(odf)}"
        elif sorted(sdf.columns) != sorted(odf.columns):
            status = f"SCHEMA {sorted(sdf.columns)} vs {sorted(odf.columns)}"
        else:
            a, b = canon(sdf), canon(odf)
            try:
                # check_dtype=True: the driver's value hash is dtype-sensitive
                # (DuckDB HUGEINT→float64 vs Spark int64 was a round-1 red)
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=True, check_exact=False, rtol=0, atol=0
                )
            except AssertionError as e:
                status = "VALUES: " + str(e).split("\n")[0]
                # show first differing rows
                neq = (a != b).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    status += f" | first diff row {i}: {a.iloc[i].to_dict()} vs {b.iloc[i].to_dict()}"
        if status != "OK":
            failures += 1
        print(f"{name:20s} {status}  ({len(sdf)} rows, {el:.1f}s)")
    print("failures:", failures)
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(*sys.argv[1:]) else 0)
