"""Optional stored-fields sidecar: document content retrievable by
docid from the index dir (Lucene stored-fields parity).

The inverted index deliberately stores no text (docs carry url +
stats only; snippet surfaces return OFFSETS).  A production serving
tier still needs the document bytes — to render snippets, to power
get-by-id — and shipping a second store alongside the index doubles
operational surface.  This sidecar closes that gap: an OPT-IN
``stored/`` parquet per write_index dir / segment generation holding
``(docid, content)``.

Reference analogue: the reference keeps page text in its crawl store
and re-reads it at render time (lib/worker.py page files); here the
index dir is self-contained when built with ``store_content=True``.

Layout is a pure function of docid — ``range_id = (docid-1) //
STORED_RANGE_DOCS`` hive partitions, rows docid-sorted within each —
so point reads prune to ONE partition dir and then row-group stats
(no sampling anywhere: the layout is deterministic across
parallelism, the write_index discipline).  Readers are Spark-free
(pyarrow.dataset) so the millisecond serving tier can use them.

Maintenance semantics (mirroring the posting machinery):
 * compaction / delete_docs tombstone only — the sidecar keeps the
   bytes until a physical merge, and serving masks liveness exactly
   like postings (the _dl membership rule);
 * merge_segments / merge_run rebuild the merged generation's sidecar
   from the surviving rows of the inputs' sidecars (docids preserved);
   a merged generation gets a sidecar iff EVERY input generation has
   one (a mixed run merges to no sidecar — store_content must be used
   consistently to be useful, and the rule is loud in tests).
"""

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORED_DIR = "stored"
STORED_RANGE_DOCS = 4096  # docids per partition dir (point-read prune)


def _range_id(docid_col):
    return ((docid_col - 1) / F.lit(STORED_RANGE_DOCS)).cast("long")


def write_stored_fields(spark: SparkSession, docs_content: DataFrame,
                        index_dir: str) -> None:
    """Write the ``stored/`` sidecar from a (docid, content) frame.
    Deterministic layout: hive-partitioned on the arithmetic range_id,
    docid-sorted within partitions; whole-dir overwrite (idempotent —
    the caller's manifest/commit machinery provides crash safety)."""
    out = os.path.join(index_dir, STORED_DIR)
    (
        docs_content.select(
            _range_id(F.col("docid")).alias("range_id"),
            "docid",
            "content",
        )
        .repartition("range_id")
        .sortWithinPartitions("docid")
        .write.mode("overwrite")
        .partitionBy("range_id")
        .parquet(out)
    )


def has_stored_fields(index_dir: str) -> bool:
    return os.path.isdir(os.path.join(index_dir, STORED_DIR))


def read_stored_doc(stored_dirs, docid: int):
    """Spark-free point read: the content string for ``docid``, or
    None if no sidecar holds it.  Prunes to the one hive partition the
    arithmetic layout puts the docid in, then parquet row-group stats
    (docid-sorted rows) cut the scan inside it."""
    import pyarrow.dataset as ds

    rid = (int(docid) - 1) // STORED_RANGE_DOCS
    for d in stored_dirs:
        part = os.path.join(d, f"range_id={rid}")
        if not os.path.isdir(part):
            continue
        t = ds.dataset(part, format="parquet").to_table(
            columns=["content"],
            filter=ds.field("docid") == int(docid),
        )
        if t.num_rows:
            return t["content"][0].as_py()
    return None
