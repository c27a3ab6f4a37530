"""Document summaries: source/sink + attach join (SURVEY.md S12/J5).

The reference generates per-doc BART summaries offline (summarizer.py:
25-68, 20-40 h on CPU per README.txt:64-66) into a binary docid→str file
(lib/writer.py:353-364) and left-joins them at render time
(lib/queryproc.py:295-297).  Model inference is orthogonal to the engine
(and no ML runtime ships in this container), so the *pipeline* is real —
mapInPandas batch stage, parquet sink, broadcast attach join — while the
summarizer kernel is a deterministic extractive stub (first N tokens),
gated exactly like the multimodal decode stubs.
"""

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "docid long, summary string"

SUMMARY_TOKENS = 24

try:  # pragma: no cover - no ML runtime in this container
    import transformers  # noqa: F401

    _HAVE_MODEL = True
except ImportError:
    _HAVE_MODEL = False


def real_summarize(text: str) -> str:  # pragma: no cover - gated stub
    if not _HAVE_MODEL:
        raise NotImplementedError(
            "abstractive summaries need a transformers runtime; install "
            "it on the cluster image and swap it into summarize_docs"
        )
    raise NotImplementedError("wire the model here")


def summarize_docs(survivors: DataFrame) -> DataFrame:
    """(docid, summary) via an Arrow-batched extractive stub.

    Replace the kernel with real_summarize for abstractive output; the
    Spark plumbing (batching, schema, sink) is identical either way.
    """

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "summary": [
                        " ".join(str(c).split()[:SUMMARY_TOKENS])
                        for c in pdf["content"]
                    ],
                }
            )

    return survivors.select("docid", "content").mapInPandas(
        run, schema=SUMMARY_SCHEMA
    )


def attach_summaries(results: DataFrame, summaries: DataFrame) -> DataFrame:
    """Render-time attach (J5): left join, missing → empty string
    (lib/queryproc.py:295-297 uses '' for absent summaries)."""
    return results.join(
        F.broadcast(summaries), "docid", "left"
    ).withColumn("summary", F.coalesce("summary", F.lit("")))
