"""WARC (ISO 28500) record framing: reader + minimal writer (kernel).

Common Crawl ships pages as WARC files — length-prefixed records with
MIME-style headers, optionally gzip-compressed one member per record.
This module implements the framing only (no network), enough to turn
``response`` records into the engine's pages schema:

* ``iter_warc_records(data)`` — parse a (possibly multi-member-gzip)
  WARC byte stream into (headers, payload) records.
* ``split_http_response(payload)`` — strip the HTTP/1.x response
  header block from a ``response`` record's payload.
* ``build_warc(records)`` — deterministic writer for tests/synthetic
  corpora (plain or member-gzipped).

Everything is stdlib (zlib); no warcio dependency.
"""

import zlib
from datetime import datetime, timezone
from typing import Dict, Iterator, List, Optional, Tuple

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members."""
    out = bytearray()
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(rest)
        out += d.flush()
        rest = d.unused_data
        if not d.eof:  # truncated member: stop rather than loop
            break
    return bytes(out)


def _parse_headers(block: bytes) -> Dict[str, str]:
    headers: Dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            key, _, value = line.partition(b":")
            headers[key.decode("latin-1").strip()] = value.decode(
                "latin-1"
            ).strip()
    return headers


def iter_warc_records(data: bytes) -> Iterator[Tuple[Dict[str, str], bytes]]:
    """Yield (warc_headers, payload_bytes) per record.

    Accepts plain or gzip-member-compressed streams (sniffed by magic).
    Malformed trailing bytes end iteration rather than raising — a
    truncated WARC yields its complete prefix records.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)

    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(WARC_VERSION, pos)
        if start == -1:
            return
        header_end = data.find(_CRLF + _CRLF, start)
        if header_end == -1:
            return
        headers = _parse_headers(data[start + len(WARC_VERSION): header_end])
        try:
            length = int(headers.get("Content-Length", ""))
        except ValueError:
            return
        body_start = header_end + 4
        if body_start + length > n:
            return  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def split_http_response(payload: bytes) -> Tuple[Dict[str, str], bytes]:
    """(http_headers, body) of a ``response`` record payload; payloads
    without an HTTP status line pass through as bare bodies."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    split_at = payload.find(_CRLF + _CRLF)
    if split_at == -1:
        return {}, payload
    return _parse_headers(payload[:split_at]), payload[split_at + 4 :]


def parse_warc_date(value: str) -> Optional[datetime]:
    """WARC-Date (ISO-8601 Zulu) -> naive UTC datetime (Arrow/DuckDB
    timestamps are UTC-naive here)."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        return dt.astimezone(timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


# -- writer (tests / synthetic corpora) --------------------------------------

def build_record(
    url: str,
    body: bytes,
    date: str = "2024-01-01T00:00:00Z",
    record_type: str = "response",
    content_type: str = "text/html",
) -> bytes:
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF
        + body
    )
    headers = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: " + record_type.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def build_warc(
    records: List[Tuple[str, bytes, str]], gzip_members: bool = False
) -> bytes:
    """records = [(url, body, iso_date)] -> a WARC byte stream."""
    chunks = []
    for url, body, date in records:
        raw = build_record(url, body, date)
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            raw = co.compress(raw) + co.flush()
        chunks.append(raw)
    return b"".join(chunks)
