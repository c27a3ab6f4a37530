"""Benchmark: end-to-end index build + batch top-k over $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...,
   "build": {"n_docs": ..., "build_sec": ..., "docs_per_sec": ...}}

Modes:
  python bench.py                 # driver mode (local[$SPARK_GRAFT_CPUS])
  python bench.py --build-only    # index build only (used by --scaling)
  python bench.py --scaling       # run build at local[8] and local[32] in
                                  # subprocesses, report throughput scaling
                                  # efficiency (N vs 4N stand-in, BASELINE.md)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    (1, "spark query join"),
    (2, "hash merge sort"),
    (3, "window agg stream"),
    (4, "filter scan column"),
    (5, "customer order line"),
]


def _sf_label(sf_dir):
    base = os.path.basename(sf_dir.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else base


def run_bench(build_only=False):
    from searchengine_spark.session import get_spark
    from searchengine_spark.index import build_tables
    from searchengine_spark.query.scoring import score_queries
    from __spark_entry__ import _documents_as_corpus

    spark = get_spark(app="bench")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus = _documents_as_corpus(spark, SF_DIR)
    tables = build_tables(spark, corpus, compute_quality=True)
    # force full materialization of the index tables
    n_postings = tables.postings.count()
    n_docs = tables.stats["n_total"]
    build_sec = time.time() - t0

    result = {
        "metric": "index build + batch BM25 top-k wall time",
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "build": {
            "n_docs": n_docs,
            "n_postings": n_postings,
            "build_sec": round(build_sec, 3),
            "docs_per_sec": round(n_docs / build_sec, 2),
        },
        "queries": {},
    }

    total = build_sec
    if not build_only:
        for qid, text in BENCH_QUERIES:
            tq = time.time()
            rows = score_queries(spark, [(qid, text)], tables, k=10).collect()
            el = time.time() - tq
            result["queries"][f"q{qid}"] = round(el, 3)
            total += el
            assert len(rows) <= 10
    result["value"] = round(total, 3)
    spark.stop()
    return result


def run_scaling():
    """Same job at two parallelism levels (sandbox stand-in for N vs 4N
    executors, BASELINE.md) — reports throughput + scaling efficiency."""
    out = {}
    for cpus in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["SPARK_GRAFT_SHUFFLE"] = str(cpus)
        p = subprocess.run(
            [sys.executable, __file__, "--build-only"],
            capture_output=True, text=True, env=env,
        )
        line = p.stdout.strip().splitlines()[-1]
        out[cpus] = json.loads(line)
    thr8 = out[8]["build"]["docs_per_sec"]
    thr32 = out[32]["build"]["docs_per_sec"]
    eff = (thr32 / thr8) / 4.0
    print(json.dumps({
        "metric": "index-build throughput scaling (local[8] vs local[32])",
        "unit": "docs/sec",
        "sf": out[32]["sf"],
        "throughput_8": thr8,
        "throughput_32": thr32,
        "speedup": round(thr32 / thr8, 3),
        "scaling_efficiency": round(eff, 3),
        "value": thr32,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench(build_only="--build-only" in sys.argv)))
