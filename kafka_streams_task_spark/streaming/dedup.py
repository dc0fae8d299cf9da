"""Streaming deduplication: the ingest-time tier of the dedup family.

Batch dedup (operators/dedup.py) assumes the corpus is at rest; a 100 TB
pipeline ALSO needs dedup at ingest, where the same document arrives many
times (re-crawls, retries, replayed topics). Two shapes:

  streaming_dedup_exact      — unbounded exact dedup on a content digest.
      State grows with distinct keys forever; correct when the key space is
      bounded (e.g. url) or the job is periodically rebootstrapped.

  streaming_dedup_watermarked — dedup within an event-time watermark via
      ``dropDuplicatesWithinWatermark``: duplicates arriving within the
      delay window collapse; state is evicted once the watermark passes,
      so state size is bounded by (arrival rate x delay) regardless of
      corpus size — the only formulation that survives an unbounded crawl.

Both keep the digest trick from the batch tier: state stores a 16-byte md5
digest, never document text, so the state store carries ~32 bytes/doc no
matter how large documents are.

Reference parity: the reference engine keys streams and relies on
Kafka-Streams KTable upsert semantics for "latest wins" (MyStream.java:
166-173 — see streaming/changelog.py); an explicit first-wins dedup
operator does not exist there. Beyond-reference training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_digest(stream: DataFrame, text_col: str) -> DataFrame:
    return stream.withColumn("_digest", F.md5(F.col(text_col)))


def streaming_dedup_exact(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """First-seen-wins exact dedup over the whole stream lifetime.

    State: one md5 digest per distinct document ever seen (unbounded —
    gate behind a bounded key domain or scheduled state resets).
    """
    return _with_digest(stream, text_col).dropDuplicates(["_digest"]).drop("_digest")


def streaming_dedup_watermarked(
    stream: DataFrame,
    time_col: str,
    delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """First-seen-wins exact dedup within an event-time watermark window.

    A duplicate arriving more than ``delay`` after the original's event
    time may be re-emitted (its state was evicted) — the deliberate trade
    that keeps state bounded by (rate x delay). Downstream batch dedup
    (dedup_exact over the landed corpus) catches stragglers; this tier
    exists to stop the 99% duplicate mass from ever landing.
    """
    return (
        _with_digest(stream, text_col)
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )
