"""searchengine_spark — a PySpark-native inverted-index build + BM25 top-k
query engine.

Brand-new implementation with the capabilities of the reference engine
(vctruong100/searchengine, surveyed in SURVEY.md): corpus ingest over an
Iceberg-style table ``(repo, path, commit, lang, content)``, dedup
(exact sha256 + simhash near-dup), positional postings with delta+varbyte
compression and skip/block metadata, BM25 top-k with block-max pruning,
and PageRank/HITS link-quality blending — all expressed Spark-first
(DataFrame / pandas UDF), not a port of the reference's single-process
file-handle execution.
"""

__version__ = "0.1.0"
