"""Spark-free snapshot diff between two index dirs.

    python tools/index_diff.py OLD_DIR NEW_DIR [--examples N]

Compares the SERVING doc sets (segmented or monolithic dirs; live =
stored minus meta-listed tombstones — the serve_local liveness rule)
by content key and prints ONE JSON line:

    added            docs live in NEW only (new (repo,path,commit))
    removed          docs live in OLD only (deleted / tombstoned)
    changed          same (repo, path), BOTH live, different sha256
                     (the upsert_segment update signature)
    unchanged        same (repo, path, commit, sha256) in both
    n_old / n_new    live doc counts
    examples         up to --examples keys per bucket (url strings)

The nightly ops question between two backups — "what did yesterday's
maintenance actually do?" — answered from the stored docs metadata
alone: no Spark session, no posting decode (pyarrow only, the
backup/serve_local dependency footprint).
"""

import argparse
import json
import os
import sys


def _live_docs(index_dir: str):
    """{(repo, path, commit): (sha256, docid)} for the LIVE docs of a
    segmented or monolithic index dir."""
    import pyarrow.parquet as pq

    seg_meta = os.path.join(index_dir, "segments.json")
    if os.path.exists(seg_meta):
        with open(seg_meta) as f:
            meta = json.load(f)
        seg_dirs = [os.path.join(index_dir, s)
                    for s in meta["segments"]]
        tomb_gens = meta.get("tomb_gens", [])
    else:
        seg_dirs, tomb_gens = [index_dir], []

    tombs = set()
    for g in tomb_gens:
        t = pq.read_table(
            os.path.join(index_dir, "tombstones", g),
            columns=["docid"],
        )
        tombs.update(t.column("docid").to_pylist())

    out = {}
    for d in seg_dirs:
        t = pq.read_table(
            os.path.join(d, "docs"),
            columns=["docid", "repo", "path", "commit", "sha256"],
        )
        for docid, repo, path, commit, sha in zip(
            *(t.column(c).to_pylist()
              for c in ("docid", "repo", "path", "commit", "sha256"))
        ):
            if docid in tombs:
                continue
            out[(repo, path, commit)] = (sha, docid)
    return out


def diff_indexes(old_dir: str, new_dir: str, examples: int = 5) -> dict:
    old = _live_docs(old_dir)
    new = _live_docs(new_dir)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    # changed = same (repo, path) alive on both sides with a different
    # sha — matched across commits (the upsert flow deletes the old
    # commit's doc and appends the new commit's)
    old_rp = {}
    for (repo, path, commit), (sha, _) in old.items():
        old_rp.setdefault((repo, path), set()).add(sha)
    new_rp = {}
    for (repo, path, commit), (sha, _) in new.items():
        new_rp.setdefault((repo, path), set()).add(sha)
    changed = sorted(
        rp for rp in set(old_rp) & set(new_rp)
        if old_rp[rp] != new_rp[rp]
    )
    unchanged = sum(
        1 for k in set(old) & set(new) if old[k][0] == new[k][0]
    )

    def url(k):
        return f"{k[0]}/{k[1]}" + (f"@{k[2]}" if len(k) > 2 else "")

    return {
        "metric": "index snapshot diff",
        "old": old_dir,
        "new": new_dir,
        "n_old": len(old),
        "n_new": len(new),
        "added": len(added),
        "removed": len(removed),
        "changed": len(changed),
        "unchanged": unchanged,
        "examples": {
            "added": [url(k) for k in added[:examples]],
            "removed": [url(k) for k in removed[:examples]],
            "changed": [url(k) for k in changed[:examples]],
        },
        "value": len(added) + len(removed) + len(changed),
        "unit": "docs",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old_dir")
    ap.add_argument("new_dir")
    ap.add_argument("--examples", type=int, default=5)
    args = ap.parse_args()
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    print(json.dumps(diff_indexes(args.old_dir, args.new_dir,
                                  args.examples)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
