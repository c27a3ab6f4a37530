"""Minimal WARC/1.0 source adapter (ISO 28500, the web-crawl archive
format every web-scale training corpus ships in — Common Crawl's unit
of distribution is the ~1 GB .warc chunk).

Reference analogue: the reference engine ingests pre-extracted page
text (lib/worker.py:30-61); a 100 TB training-data pipeline starts one
step earlier, at the crawl archive itself, so this is [NORTH-EXT]
source surface alongside the JSONL/CSV adapters (corpus/ingest.py).

Scale design: ``spark.read.format("binaryFile")`` yields ONE row per
.warc file — exactly the real layout's parallelism unit (a crawl is
tens of thousands of independently-parseable ~1 GB chunks; record
offsets within a chunk are sequential by construction, so a chunk is
the natural split).  Records parse inside ``mapInPandas`` (Arrow
batches of whole files, no driver involvement, no shuffle: the plan is
scan → flatMap).  The parser is tolerant by spec: bytes between
records and truncated tails are skipped, ``Content-Length`` is
authoritative for the payload slice (payloads may contain CRLFCRLF).

The record serializer lives here too — the test/driver fixtures
synthesize deterministic .warc chunks from the documents table and
prove byte-exact roundtrip through the adapter.
"""

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"

READ_SCHEMA = (
    "warc_file string, rec_type string, url string, warc_date string, "
    "content_type string, n_bytes long, payload binary"
)


def encode_warc_record(url: str, payload: bytes,
                       rec_type: str = "response",
                       date: str = "2026-01-01T00:00:00Z",
                       content_type: str = "text/plain") -> bytes:
    """Serialize one WARC/1.0 record.  Deterministic: the record id is
    content-addressed (md5 of url) instead of a random uuid, so
    synthesized chunks are byte-identical across runs."""
    rid = hashlib.md5(url.encode()).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + _CRLF + _CRLF


def parse_warc_bytes(data: bytes):
    """Yield (headers: dict, payload: bytes) for every well-formed
    record in one chunk.  Tolerant: garbage between records is skipped
    (scan to the next magic), a record whose declared Content-Length
    overruns the chunk (truncated tail) is dropped."""
    pos = 0
    magic = b"WARC/1.0\r\n"
    n = len(data)
    while True:
        start = data.find(magic, pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            return
        headers = {}
        for line in data[start + len(magic):hdr_end].split(_CRLF):
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            clen = int(headers.get("Content-Length", ""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated tail
        yield headers, data[body_start:body_start + clen]
        pos = body_start + clen


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Parse .warc chunks under ``path_glob`` into one row per record:
    (warc_file, rec_type, url, warc_date, content_type, n_bytes,
    payload).  Parallelism = #chunks (binaryFile's unit), parsing is
    Arrow-batched executor-side; the plan is scan → flatMap, shuffle-
    free."""

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("warc_file", "rec_type", "url",
                                   "warc_date", "content_type",
                                   "n_bytes", "payload")}
            for path, blob in zip(pdf["path"], pdf["content"]):
                for headers, payload in parse_warc_bytes(bytes(blob)):
                    out["warc_file"].append(os.path.basename(path))
                    out["rec_type"].append(headers.get("WARC-Type", ""))
                    out["url"].append(
                        headers.get("WARC-Target-URI", "")
                    )
                    out["warc_date"].append(
                        headers.get("WARC-Date", "")
                    )
                    out["content_type"].append(
                        headers.get("Content-Type", "")
                    )
                    out["n_bytes"].append(len(payload))
                    out["payload"].append(payload)
            yield pd.DataFrame(out)

    raw = (
        spark.read.format("binaryFile")
        .load(path_glob)
        .select("path", "content")
    )
    return raw.mapInPandas(_parse, READ_SCHEMA)


def warc_as_corpus(spark: SparkSession, path_glob: str,
                   lang: str = "") -> DataFrame:
    """WARC response records → the input_hint corpus shape: repo = url
    host, path = url path, commit = content-addressed sha prefix over
    the url (the table_as_corpus derivation), content = payload decoded
    UTF-8.  Non-response records (request/metadata/warcinfo) drop."""
    recs = read_warc(spark, path_glob).filter(
        F.col("rec_type") == "response"
    )
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    upath = F.regexp_extract("url", r"^[a-z]+://[^/]+(/.*)$", 1)
    return recs.select(
        host.alias("repo"),
        upath.alias("path"),
        F.substring(F.sha2(F.col("url"), 256), 1, 40).alias("commit"),
        F.lit(lang).alias("lang"),
        F.decode("payload", "UTF-8").alias("content"),
    )


def write_warc_dir(rows, out_dir: str, n_files: int = 4) -> None:
    """Synthesize deterministic .warc chunks from (url, payload_bytes)
    pairs — the test/driver fixture writer.  Striping is a pure
    function of the url (md5 mod n_files) and records within a chunk
    are url-sorted, so the chunk set is byte-identical across runs and
    row orders.  Driver-side by design: this is fixture synthesis, not
    the adapter (which is distributed)."""
    os.makedirs(out_dir, exist_ok=True)
    chunks = [[] for _ in range(n_files)]
    for url, payload in sorted(rows):
        i = int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % n_files
        chunks[i].append(encode_warc_record(url, payload))
    for i, recs in enumerate(chunks):
        with open(os.path.join(out_dir, f"chunk-{i:05d}.warc"),
                  "wb") as f:
            f.write(b"".join(recs))
