"""WARC (Web ARChive) record reader — the Common Crawl container format.

Common Crawl ships as WARC/1.0 files (ISO 28500 — public spec):
concatenated records, each a CRLF-delimited header block
(WARC-Type, WARC-Target-URI, Content-Length, ...) followed by exactly
Content-Length payload bytes and a blank-record separator. Crawl
archives gzip each record as its OWN gzip member so readers can split
archives without decompressing everything; stdlib zlib handles the
member-by-member walk.

This module parses WARC bytes into records entirely from scratch
(stdlib only) and exposes a distributed operator: ``warc_records``
explodes a DataFrame's binary WARC-blob column into one row per record
via mapInPandas (Arrow batches — the blob never lands on the driver).
``build_warc`` writes spec-shaped fixtures so tests and the contract
oracle need no external data.

At 100 TB the unit of parallelism is the WARC *file* (or gzip member
range): each blob is one task's input, parsing is pure CPU, and the
output is ordinary columnar rows — the same shape real crawl ingest
jobs use.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

_CRLF = b"\r\n"


def build_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """WARC/1.0 bytes from record dicts ({url, payload: bytes,
    rec_type='response'}); with ``gzip_members`` each record becomes its
    own gzip member (the Common Crawl layout)."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        hdr = (b"WARC/1.0" + _CRLF
               + b"WARC-Type: " + r.get("rec_type", "response").encode()
               + _CRLF
               + b"WARC-Target-URI: " + r["url"].encode() + _CRLF
               + b"Content-Length: " + str(len(payload)).encode() + _CRLF
               + _CRLF)
        rec = hdr + payload + _CRLF + _CRLF
        out += gzip.compress(rec) if gzip_members else rec
    return bytes(out)


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress a concatenation of gzip members (zlib leaves
    unused_data pointing at the next member)."""
    out = bytearray()
    view = memoryview(blob)   # no per-member copy of the remainder —
    pos = 0                   # a blob[pos:] slice would be O(members²)
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(view[pos:])
        tail = d.unused_data
        if not tail:
            break
        pos = len(blob) - len(tail)
    return bytes(out)


def parse_warc(blob: bytes) -> Iterator[dict]:
    """Yield {rec_idx, rec_type, url, payload} per record. Accepts plain
    or per-member-gzipped WARC bytes. Malformed framing raises."""
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    pos = 0
    idx = 0
    while pos < len(blob):
        # skip inter-record blank lines
        while blob[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= len(blob):
            break
        end_hdr = blob.index(_CRLF + _CRLF, pos)
        header = blob[pos:end_hdr].decode("utf-8", "replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"record {idx}: bad version line {lines[0]!r}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"record {idx}: missing Content-Length")
        body_start = end_hdr + 4
        payload = blob[body_start:body_start + length]
        if len(payload) != length:
            raise ValueError(f"record {idx}: truncated payload")
        yield {"rec_idx": idx,
               "rec_type": fields.get("warc-type", ""),
               "url": fields.get("warc-target-uri", ""),
               "payload": payload}
        pos = body_start + length
        idx += 1


def warc_records(df, blob_col: str = "warc", id_col: str = "blob_id"):
    """Explode binary WARC blobs into records: (blob_id, rec_idx,
    rec_type, url, n_bytes, payload) — one Arrow-batched pass, rows
    stream out per blob, nothing touches the driver."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                for r in parse_warc(bytes(blob)):
                    rows.append((bid, r["rec_idx"], r["rec_type"],
                                 r["url"], len(r["payload"]),
                                 r["payload"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "rec_idx", "rec_type", "url", "n_bytes",
                "payload"])

    return df.mapInPandas(
        fn, f"{id_col} long, rec_idx long, rec_type string, url string, "
            f"n_bytes long, payload binary")
