"""Index snapshot / restore — the ES snapshot-API analogue, Spark-free.

Every index layout in this repo commits via an atomic rename of a
single root commit file (`segments.json` for generation dirs,
`mergeinfo.json` for a monolithic index, `manifest.json` /
`ivf_segments.json` for the trigram and IVF stores).  The snapshot
protocol leans on that:

 * data files are copied FIRST, the root commit file(s) LAST, and the
   backup's own completeness marker (``backup_manifest.json``, listing
   every file with size + optional sha256) is written after everything
   else — a torn backup is detectable, never silently servable;
 * concurrent-maintenance safety: the commit stamp (name, mtime_ns,
   size of each root commit file) is captured before the copy and
   re-checked after; if maintenance swapped the commit point mid-copy
   the attempt is discarded and retried once (the serve_ivf
   maybe_refresh pattern), then raised;
 * restore stages into a ``<dst>.restoring`` sibling and renames into
   place — readers must be (re)opened after restore; the rename is the
   only step that touches ``dst``.

Checksums: sha256 per file by default — right for the test scale; at
100 TB pass ``checksum=False`` (size-only manifest) and let the object
store's own integrity machinery carry the bytes.
"""

import hashlib
import json
import os
import shutil

BACKUP_MANIFEST = "backup_manifest.json"
COMMIT_FILES = (
    "segments.json", "mergeinfo.json", "manifest.json",
    "ivf_segments.json",
)


def _commit_stamp(index_dir: str):
    out = []
    for name in COMMIT_FILES:
        p = os.path.join(index_dir, name)
        if os.path.exists(p):
            st = os.stat(p)
            out.append((name, st.st_mtime_ns, st.st_size))
    return tuple(out)


def _walk_files(root: str):
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            yield os.path.relpath(p, root)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def backup_index(index_dir: str, backup_dir: str,
                 checksum: bool = True) -> dict:
    """Snapshot ``index_dir`` into ``backup_dir`` (must not exist).
    Returns {n_files, total_bytes, retried}."""
    if os.path.exists(backup_dir):
        raise ValueError(f"backup dir exists: {backup_dir}")
    stamp = _commit_stamp(index_dir)
    if not stamp:
        raise ValueError(f"{index_dir} has no commit file "
                         f"({'/'.join(COMMIT_FILES)})")
    retried = False
    for attempt in (0, 1):
        rels = list(_walk_files(index_dir))
        commit_rels = [r for r in rels if r in COMMIT_FILES]
        data_rels = [r for r in rels if r not in COMMIT_FILES]
        entries, total = [], 0
        try:
            for rel in data_rels + commit_rels:   # commit files LAST
                src = os.path.join(index_dir, rel)
                dst = os.path.join(backup_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
                size = os.path.getsize(dst)
                total += size
                entries.append({
                    "path": rel,
                    "size": size,
                    "sha256": _sha256(dst) if checksum else None,
                })
        except FileNotFoundError:
            # a maintenance job removed a file mid-copy: stale attempt
            entries = None
        if entries is not None and _commit_stamp(index_dir) == stamp:
            manifest = {
                "source": os.path.abspath(index_dir),
                "files": entries,
                "checksum": checksum,
            }
            tmp = os.path.join(backup_dir, BACKUP_MANIFEST + ".tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, os.path.join(backup_dir, BACKUP_MANIFEST))
            return {"n_files": len(entries), "total_bytes": total,
                    "retried": retried}
        # commit point flipped (or files vanished) mid-copy: retry once
        shutil.rmtree(backup_dir, ignore_errors=True)
        stamp = _commit_stamp(index_dir)
        retried = True
        if attempt == 1:
            raise RuntimeError(
                f"{index_dir} kept changing during backup; quiesce "
                "maintenance or retry"
            )


def verify_backup(backup_dir: str) -> dict:
    """Check the backup against its manifest.  Returns
    {ok, n_files, bad: [relpath, ...]} — bad lists missing files,
    size mismatches, and (when recorded) sha mismatches."""
    mp = os.path.join(backup_dir, BACKUP_MANIFEST)
    if not os.path.exists(mp):
        return {"ok": False, "n_files": 0, "bad": [BACKUP_MANIFEST]}
    with open(mp) as f:
        manifest = json.load(f)
    bad = []
    for ent in manifest["files"]:
        p = os.path.join(backup_dir, ent["path"])
        if not os.path.exists(p) or os.path.getsize(p) != ent["size"]:
            bad.append(ent["path"])
            continue
        if ent.get("sha256") and _sha256(p) != ent["sha256"]:
            bad.append(ent["path"])
    return {"ok": not bad, "n_files": len(manifest["files"]),
            "bad": bad}


def restore_index(backup_dir: str, index_dir: str,
                  overwrite: bool = False) -> dict:
    """Restore a verified backup into ``index_dir``.  Stages into
    ``<index_dir>.restoring`` and renames into place; refuses an
    existing target unless ``overwrite=True``.  Readers must (re)open
    after restore."""
    v = verify_backup(backup_dir)
    if not v["ok"]:
        raise ValueError(f"backup fails verification: {v['bad'][:5]}")
    if os.path.exists(index_dir) and not overwrite:
        raise ValueError(f"target exists: {index_dir} "
                         "(pass overwrite=True)")
    staging = index_dir.rstrip("/") + ".restoring"
    shutil.rmtree(staging, ignore_errors=True)
    with open(os.path.join(backup_dir, BACKUP_MANIFEST)) as f:
        manifest = json.load(f)
    rels = [e["path"] for e in manifest["files"]]
    for rel in [r for r in rels if r not in COMMIT_FILES] + [
        r for r in rels if r in COMMIT_FILES
    ]:
        src = os.path.join(backup_dir, rel)
        dst = os.path.join(staging, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.rename(staging, index_dir)
    return {"n_files": len(rels)}
