"""THE correctness gate: Spark engine vs single-node oracle, 20-query set.

Rank identity: exact docid ranks; scores at 1e-6 relative tolerance;
tie-break (score desc, docid asc) — SURVEY.md §5.2, BASELINE.md targets.
"""

from collections import defaultdict

from searchengine_spark.corpus import QUERIES
from searchengine_spark.query.scoring import score_queries

K = 10
RTOL = 1e-6


def test_rank_identity(spark, tables, oracle):
    res = score_queries(spark, QUERIES, tables, k=K).collect()
    got = defaultdict(list)
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        got[r["qid"]].append((r["docid"], r["score"]))

    failures = []
    for qid, q in QUERIES:
        expect = oracle.process_query(q, k=K)
        g = got.get(qid, [])
        if [d for d, _ in expect] != [d for d, _ in g]:
            failures.append((qid, "docids", expect[:3], g[:3]))
            continue
        for (d, es), (_, gs) in zip(expect, g):
            if abs(es - gs) > RTOL * max(1.0, abs(es)):
                failures.append((qid, "score", d, es, gs))
                break
    assert not failures, failures


def test_abort_query_returns_nothing(spark, tables):
    res = score_queries(spark, [(99, "zzzqx vvkwq qqqpt parser")], tables).collect()
    assert res == []


def test_k_cut(spark, tables):
    res = score_queries(spark, [(1, "parser notes")], tables, k=3).collect()
    assert len(res) == 3
    assert [r["rank"] for r in sorted(res, key=lambda r: r["rank"])] == [1, 2, 3]


def test_ondisk_blended_rank_identity(spark, tables, index_dir):
    """Blended scorer served from the compressed on-disk index must be
    rank- and score-identical to the in-memory path (SURVEY.md §7.4)."""
    from searchengine_spark.index.shards import load_index
    from searchengine_spark.query.scoring import score_queries_ondisk

    shards = load_index(spark, index_dir)
    a = score_queries(spark, QUERIES, tables, k=K).collect()
    b = score_queries_ondisk(spark, QUERIES, shards, k=K).collect()
    ka = sorted((r["qid"], r["rank"], r["docid"], round(r["score"], 9)) for r in a)
    kb = sorted((r["qid"], r["rank"], r["docid"], round(r["score"], 9)) for r in b)
    assert ka == kb and len(ka) > 0
