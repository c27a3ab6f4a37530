"""Interactive / one-shot search CLI over a built index — the
end-user front-end of the serving tier (the reference's search.py /
searcht.py REPL surface, re-expressed over LocalSearcher instead of a
resident Flask process; reference search.py:21-45):

    python tools/search_cli.py --index /path/to/idx "spark join"
    python tools/search_cli.py --index /path/to/idx          # REPL
    python tools/search_cli.py --index idx --shards 4 --mode or "a b"

Each query runs the full query language (phrases, -not, wildcards,
a|b groups, ^boosts) through LocalSearcher.search (ShardedSearcher
with --shards), printing rank, docid, score, url, and wall
milliseconds; `count: N` reports the total-hits count alongside the
top-k.  Spark-free — millisecond startup after the index mmap.
"""

import argparse
import os
import sys
import time


def _url_map(index_dir, serve_dirs):
    import pyarrow.dataset as pads

    out = {}
    for d in serve_dirs:
        t = pads.dataset(os.path.join(d, "docs")).to_table(
            columns=["docid", "url"]
        )
        out.update(
            zip(t.column("docid").to_pylist(),
                t.column("url").to_pylist())
        )
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=("and", "or"), default="and")
    ap.add_argument("--shards", type=int, default=0,
                    help="serve via ShardedSearcher with N shards")
    ap.add_argument("--no-stem", action="store_true")
    ap.add_argument("query", nargs="*",
                    help="queries; omit for a stdin REPL")
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    from searchengine_spark.query.serve_local import (
        LocalSearcher,
        ShardedSearcher,
    )

    stem = not args.no_stem
    if args.shards > 1:
        s = ShardedSearcher(args.index, n_shards=args.shards, stem=stem)
        urls = _url_map(
            args.index,
            [d for sh in s.shards for d in sh._serve_dirs],
        )
    else:
        s = LocalSearcher(args.index, stem=stem)
        urls = _url_map(args.index, s._serve_dirs)

    def run(q):
        q = q.strip()
        if not q:
            return
        t0 = time.perf_counter()
        hits = s.search(q, k=args.k) if args.mode == "and" else s.topk(
            q, k=args.k, mode="or"
        )
        ms = (time.perf_counter() - t0) * 1000
        # hit totals only for plain term queries — count() analyzes
        # raw text and would misread query-language operators
        if any(c in q for c in '"-:*|^'):
            n = "-"
        else:
            n = s.count(q, mode=args.mode)
        print(f"query: {q!r}  count: {n}  wall_ms: {ms:.2f}")
        for rank, docid, score in hits:
            print(f"  {rank:2d}. doc {docid:<8d} {score:<12.6f} "
                  f"{urls.get(docid, '?')}")
        if not hits:
            print("  (no results)")

    if args.query:
        for q in args.query:
            run(q)
    else:
        print("searchengine_spark CLI — empty line quits")
        for line in sys.stdin:
            if not line.strip():
                break
            run(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
