"""WARC (Web ARChive) record source — the Common Crawl ingestion path.

Web-scale pretraining corpora arrive as WARC/WET files (ISO 28500:
`WARC/1.1`-framed records, usually as concatenated-member gzip). A
100 TB pipeline's very first operator is "turn a bucket of .warc.gz
into rows"; everything in this engine (dedup, quality, domains, LM
scoring) consumes what this module emits.

Spark-first shape: WARC.gz is NOT block-splittable (each record is its
own gzip member; offsets are unknown without the side index), so the
parallel unit is the FILE — exactly how Common Crawl shards its dumps
(~1 GB per file, tens of thousands of files per crawl: file-level
parallelism saturates any cluster). ``read_warc`` therefore goes
``spark.read.format("binaryFile")`` -> one ``mapInPandas`` pass that
stream-decodes each file's members and yields one row per record —
scan-stage, no shuffle, columns pruned by Catalyst downstream.

Parsing is strict to the framing spec (version line, CRLF header
block, Content-Length payload, CRLF CRLF trailer) — corrupt framing
raises, never resyncs silently. Gzip handling uses stdlib zlib with
multi-member continuation. Pure python/stdlib; no reference
counterpart (maropu/datasketches-spark has no sources), extension
component.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

__all__ = ["is_warc", "is_gzip", "parse_warc", "warc_records",
           "read_warc"]

_MAX_HEADER = 1 << 20  # spec headers are tiny; 1 MB guards corrupt sizes


def is_gzip(data: bytes) -> bool:
    return data[:2] == b"\x1f\x8b"


def is_warc(data: bytes) -> bool:
    head = bytes(data[:64])
    if is_gzip(head):
        try:
            head = zlib.decompressobj(31).decompress(bytes(data[:512]), 64)
        except zlib.error:
            return False
    return head.startswith(b"WARC/0.") or head.startswith(b"WARC/1.")


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the WARC.gz convention:
    one member per record) into one byte stream."""
    out = []
    view = memoryview(data)
    while len(view):
        d = zlib.decompressobj(31)
        out.append(d.decompress(bytes(view)))
        out.append(d.flush())
        tail = d.unused_data
        if not tail:
            break
        view = memoryview(tail)
    return b"".join(out)


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield records from raw (or gzipped) WARC bytes as dicts::

        {"warc_type", "target_uri", "warc_date", "record_id",
         "content_type", "content_length", "payload"}

    Framing per ISO 28500: ``WARC/x.y CRLF`` version line, header
    lines until a blank line, exactly Content-Length payload bytes,
    then CRLF CRLF. Unknown header keys are ignored (forward-compat);
    broken framing raises ``ValueError``."""
    data = bytes(data)
    if is_gzip(data):
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # tolerate stray blank lines between records (some writers pad)
        while pos < n and data[pos:pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(
                f"WARC: expected version line at offset {pos}, got "
                f"{data[pos:pos + 16]!r}")
        hdr_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if hdr_end < 0:
            raise ValueError("WARC: unterminated header block")
        header = data[pos:hdr_end].decode("utf-8", "replace")
        lines = header.split("\r\n")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            if _:
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/invalid Content-Length "
                             f"in record at offset {pos}") from None
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            raise ValueError("WARC: truncated record payload")
        if data[body_end:body_end + 4] not in (b"\r\n\r\n", b""):
            raise ValueError("WARC: missing record trailer (CRLF CRLF)")
        yield {
            "warc_type": fields.get("warc-type"),
            "target_uri": (fields.get("warc-target-uri") or "")
            .strip("<>") or None,
            "warc_date": fields.get("warc-date"),
            "record_id": fields.get("warc-record-id", "").strip("<>")
            or None,
            "content_type": fields.get("content-type"),
            "content_length": clen,
            "payload": data[body_start:body_end],
        }
        pos = body_end + 4


def warc_records(name: str, data: bytes) -> Iterator[tuple]:
    """Flattened (file, record) tuples for the Arrow pass (see
    ``read_warc`` for the schema order)."""
    for i, rec in enumerate(parse_warc(data)):
        yield (name, i, rec["warc_type"], rec["target_uri"],
               rec["warc_date"], rec["record_id"], rec["content_type"],
               rec["content_length"], rec["payload"])


_SCHEMA = ("path string, record_index long, warc_type string, "
           "target_uri string, warc_date string, record_id string, "
           "content_type string, content_length long, payload binary")


def read_warc(spark, path: str, types: tuple | None = None):
    """Read WARC / WARC.gz files into one row per record::

        (path, record_index, warc_type, target_uri, warc_date,
         record_id, content_type, content_length, payload)

    ``types`` keeps only the named WARC-Types at the parser (e.g.
    ``("response", "conversion")`` — conversion = WET text records);
    None keeps everything. File-level parallelism (binaryFile source);
    the per-file decode streams inside one Arrow pass. For text
    pipelines follow with ``F.decode(payload, 'utf-8')`` on conversion
    records — response records still carry their HTTP block."""
    import pandas as pd

    keep = tuple(types) if types else None
    df = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "record_index", "warc_type", "target_uri",
                "warc_date", "record_id", "content_type",
                "content_length", "payload"]
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                for tup in warc_records(name, bytes(blob)):
                    if keep is None or tup[2] in keep:
                        rows.append(tup)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, _SCHEMA)
