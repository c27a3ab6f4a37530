"""Scoped driver-contract check: compare queries()[name] vs oracle_sql()[name]
for the names given on argv, at the sf dir given by $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.01).  Exact compare (dtype-strict, rtol=0)."""
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    names = sys.argv[1:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, os_ = E.queries(), E.oracle_sql()
    fails = 0
    for name in names:
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(os_[name]).df()
        sdf = sdf.reindex(sorted(sdf.columns), axis=1)
        odf = odf.reindex(sorted(odf.columns), axis=1)
        try:
            pd.testing.assert_frame_equal(
                sdf.reset_index(drop=True), odf.reset_index(drop=True),
                check_dtype=True, rtol=0, atol=0)
            print(f"OK   {name}: {len(sdf)} rows")
        except AssertionError as e:
            fails += 1
            print(f"FAIL {name}: {str(e)[:800]}")
            print("spark:\n", sdf.head(12))
            print("oracle:\n", odf.head(12))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
