"""WARC (Web ARChive, ISO 28500) source — the Common Crawl interchange
format, i.e. THE substrate a 100 TB webtext pipeline actually ingests.

Reference parity note: the reference scraper fetches live pages
(src/scraper.py:137-181) and never reads archives; WARC ingest is a
beyond-reference addition so the engine's extract/dedup/quality stages can
run over archived crawls instead of (or in addition to) the live frontier.

Format (public spec, ISO 28500 / WARC 1.0):

    WARC/1.0<CRLF>
    WARC-Type: response<CRLF>
    WARC-Record-ID: <urn:...><CRLF>
    WARC-Date: 2024-01-01T00:00:00Z<CRLF>
    WARC-Target-URI: http://...<CRLF>
    Content-Type: text/plain<CRLF>
    Content-Length: N<CRLF>
    <CRLF>
    ...N payload bytes...<CRLF><CRLF>

Common Crawl ships ``.warc.gz`` files as CONCATENATED gzip members (one
member per record) so readers can seek; stdlib ``gzip.decompress``
transparently decompresses multi-member streams, so :func:`maybe_gunzip`
needs no member loop.

Scale shape: :func:`read_warc` uses Spark's ``binaryFile`` source — WARC
is not line-splittable, so the unit of parallelism is the FILE (Common
Crawl segments are ~1 GB gzipped, ~100k files per crawl: plenty of tasks
for a 1000-executor cluster, and one file fits comfortably in an executor
core's memory).  Parsing is an Arrow-batched ``mapInPandas`` — pure
Python per file blob, never per row of output.  Select away ``payload``
immediately after the fields you need (length/digest/extracted text) so
the multi-GB binary column dies at the first projection; ``binaryFile``
supports ``pathGlobFilter`` and partition-directory pruning for
crawl-date slicing before any byte is read.
"""

from __future__ import annotations

import codecs
import gzip
import re
from typing import Iterable, Iterator

import pandas as pd  # noqa: F401  (module-level for pandas_udf hint resolution)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType

CRLF = b"\r\n"
_VERSION = b"WARC/1.0"

# canonical header casing for the writer; the parser is case-insensitive
_HDR_ORDER = (
    ("warc_type", "WARC-Type"),
    ("record_id", "WARC-Record-ID"),
    ("warc_date", "WARC-Date"),
    ("target_uri", "WARC-Target-URI"),
    ("content_type", "Content-Type"),
)

RECORD_SCHEMA = (
    "warc_file string, warc_type string, record_id string, warc_date string,"
    " target_uri string, content_type string, content_length long, payload binary,"
    " headers map<string,string>"
)
_RECORD_COLS = [
    "warc_file",
    "warc_type",
    "record_id",
    "warc_date",
    "target_uri",
    "content_type",
    "content_length",
    "payload",
    "headers",
]


def build_warc(records: Iterable[dict]) -> bytes:
    """Serialize records to WARC/1.0 bytes.  Deterministic: no uuid/now()
    defaults — callers pass ``record_id`` / ``warc_date`` explicitly.

    Each record dict: ``warc_type`` (required), ``payload`` (bytes,
    default empty), any of ``record_id`` / ``warc_date`` / ``target_uri``
    / ``content_type`` (omitted headers are not written), and
    ``extra_headers`` — an ordered mapping of additional header
    name → value pairs (e.g. ``WARC-Identified-Content-Language``).
    """
    out = []
    for r in records:
        payload = r.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        out.append(_VERSION + CRLF)
        for key, hdr in _HDR_ORDER:
            v = r.get(key)
            if v is not None:
                out.append(hdr.encode("ascii") + b": " + str(v).encode("utf-8") + CRLF)
        for hdr, v in (r.get("extra_headers") or {}).items():
            if v is not None:
                out.append(hdr.encode("utf-8") + b": " + str(v).encode("utf-8") + CRLF)
        out.append(b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF)
        out.append(CRLF)
        out.append(payload)
        out.append(CRLF + CRLF)
    return b"".join(out)


def maybe_gunzip(data: bytes) -> bytes:
    """Decompress iff the blob starts with the gzip magic; multi-member
    streams (the Common Crawl per-record layout) decompress in one call."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def parse_warc(data: bytes) -> Iterator[dict]:
    """Parse a (decompressed) WARC blob into record dicts.

    Tolerant in the same spirit as ``htmlx``'s lenient HTML parse: a
    record with a garbled header block (no parseable Content-Length) is
    skipped by scanning forward to the next ``WARC/`` magic; a record
    whose payload is TRUNCATED by EOF is still emitted (content_length
    reports the DECLARED length, len(payload) the actual bytes) so a
    partial tail file surfaces as data, not an exception.  Accepts both
    CRLF and bare-LF line endings.  Duplicate headers: last one wins
    (documented quirk — mirrors extract_metadata's dup-key overwrite,
    refsem.py:138).
    """
    i, n = 0, len(data)
    while True:
        j = data.find(_VERSION[:5], i)  # b"WARC/"
        if j < 0:
            return
        pos = data.find(b"\n", j)
        if pos < 0:
            return
        pos += 1
        headers: dict[str, str] = {}
        ok = True
        while True:
            eol = data.find(b"\n", pos)
            if eol < 0:
                ok = False
                break
            line = data[pos:eol].rstrip(b"\r")
            pos = eol + 1
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False  # header block is garbage — resync
                break
            headers[k.strip().decode("utf-8", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        if not ok:
            i = j + 5
            continue
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            i = j + 5
            continue
        payload = data[pos : pos + length]
        yield {
            "warc_type": headers.get("warc-type"),
            "record_id": headers.get("warc-record-id"),
            "warc_date": headers.get("warc-date"),
            "target_uri": headers.get("warc-target-uri"),
            "content_type": headers.get("content-type"),
            "content_length": length,
            "payload": payload,
            "headers": headers,
        }
        if pos + length >= n:
            return
        i = pos + length


def parse_warc_frame(
    df: DataFrame, file_col: str = "warc_file", bytes_col: str = "warc_bytes"
) -> DataFrame:
    """Explode a frame of ``(file name, WARC blob)`` rows into one row per
    WARC record (Arrow-batched ``mapInPandas``; gzip sniffed per blob).

    This is the distributed half of the source: ``read_warc`` feeds it
    from ``binaryFile``, tests feed it synthetic blobs built by
    ``build_warc``, and a fetch stage could feed it archived responses.
    """

    def gen(batches):
        for pdf in batches:
            rows = {c: [] for c in _RECORD_COLS}
            for fname, blob in zip(pdf[file_col], pdf[bytes_col]):
                for rec in parse_warc(maybe_gunzip(bytes(blob))):
                    rows["warc_file"].append(fname)
                    for c in _RECORD_COLS[1:]:
                        rows[c].append(rec[c])
            if rows["warc_file"]:
                out = pd.DataFrame(rows)
                out["content_length"] = out["content_length"].astype("int64")
                yield out

    return df.select(
        F.col(file_col).alias(file_col), F.col(bytes_col).alias(bytes_col)
    ).mapInPandas(gen, RECORD_SCHEMA)


def records_to_pages(records: DataFrame, transcode: bool = False) -> DataFrame:
    """WARC response records → the north-rule ``pages`` table
    (input_hint schema: url, warc_ts, html, text, lang) — the bridge from
    archived crawls into every downstream stage (run_crawl corpora, the
    extraction suite, the dedup/quality pipeline).

    ``text`` is (re)computed with the engine's Arrow-batched E1 extraction
    (byte-identical-to-reference contract, extract.py); ``lang`` comes
    from the ``WARC-Identified-Content-Language`` header where the
    archive recorded one (the Common Crawl convention), else NULL.
    ``warc_date`` is ISO-8601 with Z — Spark's string→timestamp cast
    handles it natively.

    ``transcode=True`` runs charset sniffing (BOM > Content-Type
    charset= > <meta>, see :func:`sniff_charset`) and rewrites non-UTF-8
    payloads to UTF-8 bytes before extraction — real archives are not all
    UTF-8, and every downstream stage assumes one encoding.  UTF-8/ASCII
    payloads pass through byte-identical, so the default-off flag only
    changes behavior where the bytes were previously mojibake.
    """
    from frontier_engine.extract import extract_text_udf

    r = records.filter(F.col("warc_type") == "response")
    html = (
        to_utf8_udf(F.col("payload"), F.col("content_type"))
        if transcode
        else F.col("payload")
    )
    return r.select(
        F.col("target_uri").alias("url"),
        F.col("warc_date").cast("timestamp").alias("warc_ts"),
        html.alias("html"),
        extract_text_udf(html).alias("text"),
        F.element_at(F.col("headers"), "warc-identified-content-language").alias("lang"),
    )


def pack_pages(pages: DataFrame, n_files: int = 8) -> DataFrame:
    """Inverse bridge: pack a ``pages`` frame into ``n_files`` gzipped
    WARC blobs (hash-bucketed by url, records url-sorted within each blob
    for determinism) — ``(warc_file, warc_bytes)`` rows ready for
    ``parse_warc_frame`` or a binary sink.  Html payloads round-trip
    byte-identically; ``lang`` rides the Common Crawl language header.

    Scale: one applyInPandas group per output file — size ``n_files`` so a
    blob (≈ corpus bytes / n_files) fits an executor core; at 100 TB this
    is the archive-export path, not a collect.
    """

    def build(key, pdf):
        import gzip as _gzip

        pdf = pdf.sort_values("url")
        recs = []
        for r in pdf.itertuples():
            ts = r.warc_ts
            recs.append(
                {
                    "warc_type": "response",
                    "record_id": f"<urn:page:{r.url}>",
                    "warc_date": (
                        ts.strftime("%Y-%m-%dT%H:%M:%SZ") if pd.notna(ts) else None
                    ),
                    "target_uri": r.url,
                    "content_type": "text/html",
                    "payload": bytes(r.html) if r.html is not None else b"",
                    "extra_headers": (
                        {"WARC-Identified-Content-Language": r.lang}
                        if r.lang is not None
                        else None
                    ),
                }
            )
        return pd.DataFrame(
            {
                "warc_file": [f"part-{key[0]:05d}.warc.gz"],
                "warc_bytes": [_gzip.compress(build_warc(recs))],
            }
        )

    bucketed = pages.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col("url")), F.lit(n_files)).cast("int")
    )
    return bucketed.groupBy("_bucket").applyInPandas(
        build, "warc_file string, warc_bytes binary"
    )


def read_warc(spark: SparkSession, path: str, path_glob: str | None = None) -> DataFrame:
    """Read WARC/WARC.GZ files under ``path`` into a record frame.

    One Spark task per file (WARC is not splittable); ``path_glob``
    pushes a ``pathGlobFilter`` into the file listing so e.g. a single
    crawl segment is selected before any byte is read.
    """
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    bf = reader.load(path)
    return parse_warc_frame(
        bf.select(F.col("path").alias("warc_file"), F.col("content").alias("warc_bytes"))
    )


# -- charset handling --------------------------------------------------------
#
# The engine's extraction decodes html bytes as UTF-8-with-replace
# (extract._as_str — the reference-parity contract).  Real archives are not
# all UTF-8: the WHATWG-ish sniff order below (BOM, then the HTTP
# Content-Type charset parameter, then an early <meta> declaration) covers
# what Common Crawl actually contains; payloads are TRANSCODED to UTF-8 at
# ingest so every downstream stage keeps its single-encoding contract.

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_CHARSET_RE = re.compile(rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.I)


def sniff_charset(
    payload: bytes, content_type: str | None = None, default: str = "utf-8"
) -> str:
    """BOM > Content-Type charset= > <meta> charset in the first 2 KB >
    default.  Unknown/bogus labels fall back to the default."""
    for bom, enc in _BOMS:
        if payload[: len(bom)] == bom:
            return enc
    m = _CHARSET_RE.search((content_type or "").encode("ascii", "ignore"))
    if not m:
        # meta charset= / http-equiv content="...charset=..." — ASCII-superset
        # scan of the prologue (covers every legacy 8-bit encoding; UTF-16
        # pages are caught by the BOM branch above)
        m = _CHARSET_RE.search(payload[:2048])
    if m:
        enc = m.group(1).decode("ascii").lower()
        try:
            codecs.lookup(enc)
            return enc
        except LookupError:
            return default
    return default


def decode_payload(payload: bytes, content_type: str | None = None) -> str:
    """Decode with the sniffed charset (replace errors), BOM stripped."""
    return payload.decode(sniff_charset(payload, content_type), errors="replace").lstrip(
        "﻿"
    )


def to_utf8(payload: bytes, content_type: str | None = None) -> bytes:
    """Transcode to UTF-8 bytes; pure-ASCII/UTF-8 payloads with no BOM pass
    through unchanged (byte-identity preserved for the common case)."""
    enc = sniff_charset(payload, content_type)
    if enc == "utf-8":
        return payload
    return decode_payload(payload, content_type).encode("utf-8")


@pandas_udf(BinaryType())
def to_utf8_udf(payload: pd.Series, content_type: pd.Series) -> pd.Series:
    """Arrow-batched :func:`to_utf8` — charset-normalize a binary column."""
    return pd.Series(
        [
            to_utf8(bytes(p), c) if p is not None else None
            for p, c in zip(payload, content_type)
        ]
    )


_BINARYFILE_SCHEMA = "path string, modificationTime timestamp, length long, content binary"


def read_warc_stream(spark: SparkSession, path: str, path_glob: str | None = None) -> DataFrame:
    """Streaming twin of :func:`read_warc` — the 'crawler is still writing
    segments while the pipeline runs' regime: new WARC files landing under
    ``path`` are discovered per micro-batch (file source requires an
    explicit schema; binaryFile's is fixed).  Everything downstream is
    identical because :func:`parse_warc_frame` (stateless mapInPandas) and
    :func:`records_to_pages` (projections + pandas UDFs) are
    streaming-safe.  The file source's checkpoint log gives exactly-once
    per segment: a restarted query neither re-parses nor skips files —
    pytest pins both halves (stream==batch identity, resume picks up only
    the new segment).
    """
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    bf = reader.load(path)
    return parse_warc_frame(
        bf.select(F.col("path").alias("warc_file"), F.col("content").alias("warc_bytes"))
    )
