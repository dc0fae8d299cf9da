"""Exact charset decoding + HTML entity unescaping (r7) — the Arrow
stage behind two documented codegen boundaries:

* ``warc_to_documents`` (sources/warc.py) casts payload binary → string,
  which assumes UTF-8 and degrades other charsets to replacement chars.
  Real crawls are ~10-25% non-UTF-8 (legacy latin-1/windows-1252, GBK,
  Shift_JIS …), declared — when declared at all — in the HTTP
  Content-Type header or an HTML ``<meta>`` tag. :func:`decode_payloads`
  resolves the charset per document (BOM → header → meta tag → UTF-8
  strict → latin-1, which cannot fail) and decodes with Python's codec
  registry.
* ``html_to_text`` (functions/text.py) decodes only the common NAMED
  entities codegen-side; :func:`unescape_entities` is the exact twin
  (full named + numeric set via stdlib ``html.unescape``).

Both follow the engine's standard Arrow seam (the multimodal-columns
pattern, ``operators/multimodal.py``; same as ``unicode_norm.py``):
vectorized pandas over Arrow batches, narrow per-partition map, no
shuffle. Per-element codec work is a Python loop INSIDE the batch —
the same unavoidable shape as the image codecs, paid once per byte.

Reference provenance: no analogue in idavkaev/kafka-streams-task; part
of the 100 TB training-data-pipeline extension surface (SURVEY.md).
"""

from __future__ import annotations

import codecs
import html as _html
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CHARSET_PARAM = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
#: ascii-compatible sniff over the head bytes: <meta charset=...> and the
#: http-equiv form both match; charsets are ascii-named so a bytes regex
#: is safe regardless of the page's actual encoding
_META_CHARSET = re.compile(rb"<meta[^>]+charset\s*=\s*[\"']?([\w.:-]+)", re.I)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)

_SNIFF_BYTES = 4096


def _valid_codec(name: str | None) -> str | None:
    if not name:
        return None
    try:
        info = codecs.lookup(name)
    except LookupError:
        return None
    # bytes-to-bytes codecs (hex, zip, base64, rot13 …) pass lookup()
    # but bytes.decode() raises LookupError on them — a single page
    # declaring '<meta charset="hex">' would kill the whole ingest task
    return name if getattr(info, "_is_text_encoding", True) else None


def _resolve_and_decode(payload: bytes, declared: str | None) -> tuple[str, str]:
    """Resolve + decode in ONE pass — the UTF-8 sniff's strict decode IS
    the decode when it wins, so the (majority) undeclared-UTF-8 case
    pays exactly one full decode instead of two (ADVICE r8). Every
    branch decodes exactly once; errors under a DECLARED charset degrade
    to replacement chars (strictness already had its chance upstream)."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return name, payload.decode(name, errors="replace")
    if declared:
        m = _CHARSET_PARAM.search(declared)
        c = _valid_codec(m.group(1)) if m else None
        if c:
            return c, payload.decode(c, errors="replace")
    m = _META_CHARSET.search(payload[:_SNIFF_BYTES])
    if m:
        c = _valid_codec(m.group(1).decode("ascii", "ignore"))
        if c:
            return c, payload.decode(c, errors="replace")
    try:
        return "utf-8", payload.decode("utf-8")
    except UnicodeDecodeError:
        return "latin-1", payload.decode("latin-1")


def resolve_charset(payload: bytes, declared: str | None) -> str:
    """The precedence real browsers/crawlers use: BOM beats the HTTP
    header beats the meta tag beats content sniffing (here: UTF-8
    strict, then latin-1 — which maps every byte, so resolution never
    fails). Unknown/misspelled declared charsets fall through rather
    than error: crawl headers lie constantly. (Decoding callers should
    use the fused :func:`_resolve_and_decode` path via
    :func:`decode_payloads` — this name-only form exists for tests and
    diagnostics.)"""
    return _resolve_and_decode(payload, declared)[0]


def decode_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    declared_col: str | None = "http_content_type",
    text_col: str = "text",
    charset_col: str = "charset",
    drop_payload: bool = True,
) -> DataFrame:
    """Decode a binary payload column to text with per-document charset
    resolution (:func:`resolve_charset`), appending ``text_col`` and the
    ``charset_col`` actually used (observability: a corpus-level
    ``groupBy(charset)`` is the standard crawl health check). Decode
    errors under the RESOLVED charset degrade to replacement chars —
    per-byte strictness already had its chance in the sniff.

    One Arrow-batched stage; every other column passes through
    untouched JVM-side (the UDF sees only payload + declared header).
    """
    declared = (
        F.col(declared_col) if declared_col is not None
        else F.lit(None).cast("string")
    )

    @F.pandas_udf(f"struct<{charset_col}:string,{text_col}:string>")
    def _decode(payload: pd.Series, decl: pd.Series) -> pd.DataFrame:
        charsets: list[str | None] = []
        texts: list[str | None] = []
        for raw, d in zip(payload, decl):
            if raw is None:
                charsets.append(None)
                texts.append(None)
                continue
            b = bytes(raw)
            cs, text = _resolve_and_decode(b, d if isinstance(d, str) else None)
            charsets.append(cs)
            texts.append(text)
        return pd.DataFrame({charset_col: charsets, text_col: texts})

    out = df.withColumn("_dec", _decode(F.col(payload_col), declared)).select(
        "*", f"_dec.{charset_col}", f"_dec.{text_col}"
    ).drop("_dec")
    return out.drop(payload_col) if drop_payload else out


def unescape_entities(col: Column | str) -> Column:
    """Exact HTML entity unescape (full named + numeric set, stdlib
    ``html.unescape``) — the Arrow twin of the codegen
    ``_HTML_ENTITIES`` subset in :func:`..functions.text.html_to_text`.
    Apply AFTER tag removal (unescaping first could fabricate tags)."""

    @F.pandas_udf("string")
    def _unescape(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _html.unescape(v) if isinstance(v, str) else v)

    return _unescape(F.col(col) if isinstance(col, str) else col)
