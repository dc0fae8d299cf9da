"""WARC crawl source — Common Crawl's on-disk format as a batch reader.

A 100 TB pretraining corpus usually STARTS as WARC (ISO 28500): a crawl
dump is tens of thousands of ~1 GB ``.warc.gz`` shards, each a
concatenation of length-delimited records (``WARC/1.0`` header block,
``Content-Length`` octets of payload, CRLF CRLF). The processing grain
everyone uses — and the one Spark's scheduler wants — is ONE FILE PER
TASK: a crawl's shard count (~64k for Common Crawl) dwarfs any cluster's
core count, so file-level parallelism saturates executors without
needing the (gzip-unsplittable) records themselves to split.

Spark-first shape: ``binaryFile`` scan → one Arrow-batched
``mapInPandas`` stage that walks each shard with a pure-Python ISO 28500
parser and yields bounded record batches (cardinality-changing, like
:mod:`..operators.multimodal`'s frame sampler). No RDDs, no Hadoop input
formats, no driver-side I/O; the parse is record-local so a shard
streams through the task in O(batch) memory (the binaryFile row holds
the raw shard bytes — the same per-task working set as any .warc.gz
processor, since gzip members must decompress sequentially anyway).

Malformed input follows the r6 quarantine discipline
(``sources/files.py``): a record that violates the framing (bad version
line, unparseable ``Content-Length``) is emitted as ``warc_type =
'_malformed'`` carrying the skipped bytes, and the parser RESYNCS at the
next ``WARC/1.0`` marker — one bad record costs itself, not the shard.

Reference parity: absent from the reference engine (Kafka-only ingest,
WeatherHotelsApp.java:49-64) — beyond-reference training-data mandate,
same family as the JSONL/CSV crawl ingestion in ``sources/files.py``.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: one row per WARC record. payload is the HTTP message BODY for
#: response/request records when strip_http_headers=True (status/mime
#: lifted into columns), else the raw record block.
WARC_RECORD = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("record_idx", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_VERSION_PREFIX = b"WARC/"


def _parse_header_block(block: bytes) -> dict[str, str]:
    """``Name: value`` lines (folded continuations joined); names are
    case-insensitive per the spec — normalized to lower."""
    headers: dict[str, str] = {}
    last = None
    for raw in block.split(b"\r\n"):
        if not raw:
            continue
        if raw[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + raw.strip().decode("utf-8", "replace")
            continue
        name, sep, value = raw.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("utf-8", "replace").lower()
        headers[last] = value.strip().decode("utf-8", "replace")
    return headers


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP message into (status, content-type, body). Returns
    (None, None, payload) when the payload is not an HTTP message."""
    if not (payload.startswith(b"HTTP/") or payload.startswith(b"GET ")
            or payload.startswith(b"POST ") or payload.startswith(b"HEAD ")):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None, payload
    lines = head.split(b"\r\n")
    status: int | None = None
    if lines[0].startswith(b"HTTP/"):
        parts = lines[0].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = value.strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def iter_warc_records(
    stream: io.BufferedIOBase, strip_http_headers: bool = True
) -> Iterator[dict]:
    """Walk one (decompressed) WARC byte stream, yielding one dict per
    record in :data:`WARC_RECORD` column order (minus source_file /
    record_idx, which the caller owns). Framing violations yield a
    ``_malformed`` record holding the skipped bytes, then resync at the
    next CRLF-preceded ``WARC/`` marker."""

    def resync(first: bytes) -> bytes:
        """Collect bytes (starting with ``first``) up to the next record
        start; push nothing back — returns the skipped garbage."""
        garbage = bytearray(first)
        while True:
            line = stream.readline()
            if not line:
                return bytes(garbage)
            if line.startswith(_VERSION_PREFIX):
                # a new record begins; parse it on the next outer loop by
                # handing the line back via the pushback buffer
                pushback.append(line)
                return bytes(garbage)
            garbage += line

    pushback: list[bytes] = []
    while True:
        line = pushback.pop() if pushback else stream.readline()
        if not line:
            return
        if line in (b"\r\n", b"\n"):  # inter-record gap
            continue
        if not line.startswith(_VERSION_PREFIX):
            yield {
                "warc_type": "_malformed",
                "record_id": None,
                "target_uri": None,
                "warc_date": None,
                "content_type": None,
                "content_length": None,
                "http_status": None,
                "http_content_type": None,
                "payload": resync(line),
            }
            continue
        header_lines = bytearray()
        while True:
            hl = stream.readline()
            if hl in (b"\r\n", b"\n", b""):
                break
            header_lines += hl
        headers = _parse_header_block(bytes(header_lines))
        length_s = headers.get("content-length", "")
        if not length_s.isdigit():
            yield {
                "warc_type": "_malformed",
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "content_length": None,
                "http_status": None,
                "http_content_type": None,
                "payload": resync(line + bytes(header_lines)),
            }
            continue
        payload = stream.read(int(length_s))
        status = ctype = None
        if strip_http_headers and headers.get("content-type", "").startswith(
            "application/http"
        ):
            status, ctype, payload = _split_http(payload)
        yield {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "content_length": int(length_s),
            "http_status": status,
            "http_content_type": ctype,
            "payload": payload,
        }


def _records_from_files(
    files: DataFrame,
    strip_http_headers: bool,
    kept: set[str] | None,
    batch_records: int = 256,
) -> DataFrame:
    """The shared parse stage (batch and streaming plans): a
    ``(path, content)`` frame → :data:`WARC_RECORD` rows via one
    cardinality-changing ``mapInPandas``."""

    def batches(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD.fields]

        def flush(buf: list[tuple]) -> pd.DataFrame:
            return pd.DataFrame(buf, columns=cols)

        for pdf in parts:
            for fname, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                stream: io.BufferedIOBase
                if raw[:2] == b"\x1f\x8b":
                    stream = gzip.GzipFile(fileobj=io.BytesIO(raw))
                else:
                    stream = io.BytesIO(raw)
                buf: list[tuple] = []
                records = iter_warc_records(stream, strip_http_headers)
                idx = 0
                while True:
                    # a truncated/corrupt gz member raises out of the
                    # record iterator's readline/read — that must cost
                    # the shard's REMAINDER a quarantine row, not the
                    # task (and with it the whole ingest job)
                    try:
                        rec = next(records)
                    except StopIteration:
                        break
                    except (OSError, EOFError) as e:
                        rec = {
                            "warc_type": "_malformed",
                            "record_id": None,
                            "target_uri": None,
                            "warc_date": None,
                            "content_type": None,
                            "content_length": None,
                            "http_status": None,
                            "http_content_type": None,
                            "payload": f"decompression failed: {e}".encode(),
                        }
                        buf.append((fname, idx, *rec.values()))
                        break
                    if kept is None or rec["warc_type"] in kept:
                        buf.append((fname, idx, *rec.values()))
                        if len(buf) >= batch_records:
                            yield flush(buf)
                            buf = []
                    idx += 1
                if buf:
                    yield flush(buf)

    return files.mapInPandas(batches, WARC_RECORD)


def read_warc(
    spark: SparkSession,
    path: str,
    strip_http_headers: bool = True,
    record_types: tuple[str, ...] | None = None,
    batch_records: int = 256,
) -> DataFrame:
    """Read WARC / WARC-gz shard(s) at ``path`` (file, dir, or glob —
    whatever ``binaryFile`` accepts) into one row per record.

    ``record_types`` pushes a type filter INTO the parser (e.g.
    ``("response",)`` — the usual 3× row reduction for crawl corpora,
    skipping request/metadata twins before they ever cross Arrow).
    ``_malformed`` rows always pass the filter: dropping the quarantine
    silently is the failure mode the r6 ingest work exists to prevent.

    Gzip is detected per-file by magic bytes; multi-member gz (Common
    Crawl writes one member per record) decompresses transparently via
    ``gzip.GzipFile``'s member chaining.
    """
    kept = set(record_types) | {"_malformed"} if record_types else None
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _records_from_files(files, strip_http_headers, kept, batch_records)


def warc_ingest_report(records: DataFrame) -> DataFrame:
    """One-row health report for a WARC read: record counts, malformed
    count, payload mass — a single partial+final aggregate, no second
    scan (same discipline as ``sources/files.py:ingest_report``)."""
    return records.agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("warc_type") == "_malformed").cast("long")).alias(
            "n_malformed"
        ),
        F.sum(F.length("payload").cast("long")).alias("payload_bytes"),
        F.count_distinct("source_file").alias("n_files"),
    )


def warc_to_documents(
    records: DataFrame, min_chars: int = 1, exact_charset: bool = False
) -> DataFrame:
    """The crawl front door, end to end: WARC records (from
    :func:`read_warc`) → a documents-shaped corpus frame. Everything
    after the parse is ONE codegen projection + filter — no second
    Python stage:

    * keep HTTP 200 ``response`` records whose payload is (x)html,
    * payload bytes → text: Spark's binary→string cast by default
      (assumes UTF-8; invalid sequences degrade to replacement chars),
      or ``exact_charset=True`` for per-document charset resolution via
      ``operators/charset.py:decode_payloads`` (BOM/header/meta
      precedence — one extra Arrow stage, the exact path for corpora
      with a legacy-charset tail),
    * ``html_to_text`` + ``clean_text`` extraction,
    * URL canonicalized for dedup keys plus its registrable domain
      (the leakage/blocklist unit downstream operators group on),
    * drop docs shorter than ``min_chars`` AFTER cleaning.

    Output: ``doc_uid`` (WARC record id), ``url``, ``url_key``,
    ``domain``, ``fetched_at``, ``text``, ``n_chars``, ``source_file``.
    """
    from ..functions.text import clean_text, html_to_text
    from ..functions.url import normalize_url, registered_domain

    is_html = F.col("http_content_type").rlike("(?i)^(text/html|application/xhtml)")
    pages = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & is_html
        & F.col("target_uri").isNotNull()
    )
    if exact_charset:
        from ..operators.charset import decode_payloads

        # the filter above runs BEFORE the Arrow stage, so only kept
        # pages pay the Python decode
        pages = decode_payloads(pages, text_col="_raw_text")
        text = clean_text(html_to_text(F.col("_raw_text")))
    else:
        text = clean_text(html_to_text(F.col("payload").cast("string")))
    return (
        pages
        .select(
            F.col("record_id").alias("doc_uid"),
            F.col("target_uri").alias("url"),
            normalize_url(F.col("target_uri")).alias("url_key"),
            registered_domain(F.col("target_uri")).alias("domain"),
            F.col("warc_date").alias("fetched_at"),
            text.alias("text"),
            F.col("source_file"),
        )
        .withColumn("n_chars", F.length("text"))
        .filter(F.col("n_chars") >= F.lit(int(min_chars)))
    )


def streaming_ingest_warc(
    spark: SparkSession,
    path: str,
    out_path: str,
    checkpoint_dir: str,
    strip_http_headers: bool = True,
    record_types: tuple[str, ...] | None = None,
    max_files_per_trigger: int | None = None,
    transform=None,
):
    """Continuous crawl ingestion, WARC edition: the streaming twin of
    :func:`read_warc` — new shards landing under ``path`` stream through
    the SAME parser stage (``binaryFile`` is a streaming file source, so
    the batch and streaming plans share everything past the scan) and
    land as parquet records under ``out_path``. Returns the started
    query (``availableNow``: drain, then stop).

    ``transform`` (``DataFrame -> DataFrame``, optional) runs on each
    micro-batch's RECORDS frame before the sink — pass
    :func:`warc_to_documents` to land a documents-shaped corpus instead
    of raw records; the batch-id overwrite idempotence is unaffected
    because the transform is deterministic per batch. Because a
    transform typically FILTERS (warc_to_documents keeps only 200/html
    responses), the ``_malformed`` quarantine rows are written
    separately under ``{out_path}/_quarantine/batch=<id>`` whenever a
    transform is set — the underscore prefix keeps them out of naive
    ``read.parquet(out_path)`` scans while preserving the in-band
    no-silent-drop guarantee.

    Same exactly-once discipline as ``streaming_ingest_jsonl``
    (sources/files.py): each micro-batch overwrites its own
    ``batch=<id>`` partition directory, so foreachBatch redelivery
    rewrites instead of duplicating, and the output dir is BOUND to its
    checkpoint via the shared ``_checkpoint`` marker — a fresh
    checkpoint pointed at a used ``out_path`` refuses instead of
    silently overwriting ``batch=0``. Malformed records travel in-band
    (``warc_type='_malformed'`` rows), so the quarantine shares the
    commit atomically with the clean rows.
    """
    from ..streaming.state import bind_state_to_checkpoint

    bind_state_to_checkpoint(spark, out_path, checkpoint_dir)
    kept = set(record_types) | {"_malformed"} if record_types else None

    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(path).select("path", "content")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        records = _records_from_files(batch_df, strip_http_headers, kept)
        if transform is not None:
            # batch-scoped persist: the quarantine split and the
            # transform both consume the parse; without it the Arrow
            # stage would re-parse every shard twice
            records = records.persist()
            try:
                records.filter(F.col("warc_type") == "_malformed").write.mode(
                    "overwrite"
                ).parquet(f"{out_path}/_quarantine/batch={batch_id}")
                transform(records).write.mode("overwrite").parquet(
                    f"{out_path}/batch={batch_id}"
                )
            finally:
                records.unpersist()
        else:
            records.write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    return (
        files.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def warc_link_graph(records: DataFrame, node: str = "domain") -> DataFrame:
    """Domain-level (or page-level, ``node="url"``) link edges from WARC
    response records — the input PageRank-style crawl quality weighting
    (``operators/graph.py:pagerank``) runs on. One codegen projection +
    explode after the parse stage:

    * source node from the record's target URI, destination nodes from
      the payload's anchor hrefs (absolute links only —
      ``functions/text.py:html_links``),
    * both sides reduced to the registrable domain when
      ``node="domain"`` (the usual granularity: page-level graphs at
      crawl scale are ~100× larger and rank the same spam),
    * self-loops dropped (intra-site links carry no cross-site signal),
      parallel edges kept — pagerank counts them as extra mass, matching
      the adjacency-matrix definition.
    """
    from ..functions.text import html_links
    from ..functions.url import normalize_url, registered_domain

    if node not in ("domain", "url"):
        raise ValueError(f"node must be 'domain' or 'url', got {node!r}")
    html = F.col("payload").cast("string")
    pages = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("http_content_type").rlike("(?i)^(text/html|application/xhtml)")
        & F.col("target_uri").isNotNull()
    ).select(
        F.col("target_uri").alias("_src_url"),
        F.explode(html_links(html)).alias("_dst_url"),
    )
    if node == "domain":
        edges = pages.select(
            registered_domain(F.col("_src_url")).alias("src"),
            registered_domain(F.col("_dst_url")).alias("dst"),
        )
    else:
        edges = pages.select(
            normalize_url(F.col("_src_url")).alias("src"),
            normalize_url(F.col("_dst_url")).alias("dst"),
        )
    return edges.filter(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
