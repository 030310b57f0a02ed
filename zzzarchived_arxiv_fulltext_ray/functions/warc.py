"""WARC (ISO 28500) record framing: reader + minimal writer (kernel).

Common Crawl ships pages as WARC files — length-prefixed records with
MIME-style headers, optionally gzip-compressed one member per record.
This module implements the framing only (no network), enough to turn
``response`` records into the engine's pages schema:

* ``iter_warc_records(data)`` — parse a (possibly multi-member-gzip)
  WARC byte stream into (headers, payload) records.
* ``WarcStreamParser`` — the incremental version: ``feed(chunk)``
  yields complete records as they close, holding only the unparsed
  tail — this is what lets a 1 GB Common Crawl segment stream through
  bounded buffers (see ``sources/warc_source.py``).
* ``split_http_response(payload)`` — strip the HTTP/1.x response
  header block from a ``response`` record's payload, de-chunking
  ``Transfer-Encoding: chunked`` bodies.
* ``build_warc(records)`` — deterministic writer for tests/synthetic
  corpora (plain or member-gzipped).

Any WARC/x.y version line is accepted (ISO 28500 covers 1.0 and 1.1).
Everything is stdlib (zlib); no warcio dependency.
"""

import re
import zlib
from datetime import datetime, timezone
from typing import Dict, Iterator, List, Optional, Tuple

WARC_VERSION = b"WARC/1.0"
_VERSION_RE = re.compile(rb"WARC/\d+\.\d+")
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

    Accepts plain or gzip-member-compressed streams (sniffed by magic)
    and any WARC/x.y version line. Malformed trailing bytes end
    iteration rather than raising — a truncated WARC yields its
    complete prefix records.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)

    pos = 0
    n = len(data)
    while pos < n:
        m = _VERSION_RE.search(data, pos)
        if m is None:
            return
        start = m.start()
        header_end = data.find(_CRLF + _CRLF, start)
        if header_end == -1:
            return
        headers = _parse_headers(data[m.end(): header_end])
        try:
            length = int(headers.get("Content-Length", ""))
        except ValueError:
            return
        body_start = header_end + 4
        if body_start + length > n:
            return  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


class WarcStreamParser:
    """Incremental WARC record parser over arbitrary byte chunks.

    ``feed(chunk)`` returns the records that COMPLETED within the data
    seen so far; call ``finish()`` after the last chunk (returns any
    final records, drops a truncated tail). Gzip member compression is
    detected on the first bytes and decompressed incrementally, so the
    resident state is one unparsed record tail plus zlib's window —
    never the file.
    """

    def __init__(self):
        self._raw = bytearray()  # pre-sniff holding (first <2 bytes)
        self._buf = bytearray()
        self._decomp = None  # created lazily per gzip member
        self._gzipped = None  # unknown until 2 bytes seen

    def _decompress(self, chunk: bytes) -> bytes:
        out = bytearray()
        while chunk:
            if self._decomp is None:
                self._decomp = zlib.decompressobj(wbits=31)
            out += self._decomp.decompress(chunk)
            if self._decomp.eof:  # member boundary: start the next one
                chunk = self._decomp.unused_data
                self._decomp = None
            else:
                chunk = b""
        return bytes(out)

    def feed(self, chunk: bytes) -> List[Tuple[Dict[str, str], bytes]]:
        if self._gzipped is None:
            self._raw += chunk
            if len(self._raw) < 2:
                return []
            self._gzipped = bytes(self._raw[:2]) == b"\x1f\x8b"
            chunk = bytes(self._raw)
            self._raw.clear()
        self._buf += self._decompress(chunk) if self._gzipped else chunk
        return self._drain()

    def _drain(self) -> List[Tuple[Dict[str, str], bytes]]:
        out = []
        data = bytes(self._buf)
        pos = 0
        n = len(data)
        while pos < n:
            m = _VERSION_RE.search(data, pos)
            if m is None:
                # no version line yet: keep a small tail in case one
                # is split across the chunk boundary
                pos = max(pos, n - 16)
                break
            header_end = data.find(_CRLF + _CRLF, m.start())
            if header_end == -1:
                pos = m.start()
                break
            headers = _parse_headers(data[m.end(): header_end])
            try:
                length = int(headers.get("Content-Length", ""))
            except ValueError:
                pos = header_end + 4  # skip the malformed header block
                continue
            body_start = header_end + 4
            if body_start + length > n:
                pos = m.start()  # record incomplete: wait for more
                break
            out.append((headers, data[body_start : body_start + length]))
            pos = body_start + length
        del self._buf[:pos]
        return out

    def finish(self) -> List[Tuple[Dict[str, str], bytes]]:
        records = self._drain()
        self._buf.clear()
        return records


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body; returns the
    joined chunk data (a malformed framing falls back to the raw
    body rather than raising)."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        line_end = body.find(_CRLF, pos)
        if line_end == -1:
            return bytes(body)
        size_token = body[pos:line_end].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break  # terminal chunk (trailers ignored)
        start = line_end + 2
        if start + size > n:
            return bytes(body)
        out += body[start : start + size]
        pos = start + size + 2  # skip chunk-data CRLF
    return bytes(out)


def split_http_response(payload: bytes) -> Tuple[Dict[str, str], bytes]:
    """(http_headers, body) of a ``response`` record payload; payloads
    without an HTTP status line pass through as bare bodies. Bodies
    sent with ``Transfer-Encoding: chunked`` are de-chunked."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    split_at = payload.find(_CRLF + _CRLF)
    if split_at == -1:
        return {}, payload
    headers = _parse_headers(payload[:split_at])
    body = payload[split_at + 4 :]
    if "chunked" in headers.get("Transfer-Encoding", "").lower():
        body = _dechunk(body)
    return headers, body


def record_to_page_fields(
    headers: Dict[str, str], payload: bytes
) -> Optional[Tuple[str, Optional[datetime], bytes, str, str]]:
    """One parsed WARC record -> pages-schema fields
    ``(url, warc_ts|None, html, text, lang)``; None for non-response
    records.

    * ``lang`` comes from Common Crawl's
      ``WARC-Identified-Content-Language`` WARC header when present.
    * ``text/plain`` HTTP responses route to the ``text`` column
      (they ARE extracted text already); the cascade treats a
      text-column fallback and a sniffed KIND_TEXT payload
      identically (``cascade.py`` KIND_EMPTY/KIND_TEXT arms both call
      ``_gate(raw, source, "text", None)``), so this is a
      representation choice, not a semantic fork — it keeps
      ``n_bytes`` (payload size) parity with text-column sources.
    """
    if headers.get("WARC-Type", "response") != "response":
        return None
    http_headers, body = split_http_response(payload)
    url = headers.get("WARC-Target-URI", "")
    ts = parse_warc_date(headers.get("WARC-Date", ""))
    lang = headers.get("WARC-Identified-Content-Language", "")
    ctype = http_headers.get("Content-Type", "").lower()
    if ctype.startswith("text/plain"):
        from . import sniff as sniff_mod

        text = (
            sniff_mod.decode_payload(
                body, sniff_mod.detect_charset(body)
            )
            if body
            else ""
        )
        return url, ts, b"", text, lang
    return url, ts, body, "", lang


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
    extra_headers: Optional[Dict[str, str]] = None,
) -> bytes:
    """``extra_headers`` adds WARC (not HTTP) header lines — e.g.
    Common Crawl's ``WARC-Identified-Content-Language``."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF
        + body
    )
    extra = b""
    for k, v in (extra_headers or {}).items():
        extra += k.encode() + b": " + v.encode() + _CRLF
    headers = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: " + record_type.encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + date.encode() + _CRLF
        + extra
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
    )
    return headers + http + _CRLF + _CRLF


def build_warc(
    records: List[Tuple], gzip_members: bool = False
) -> bytes:
    """records = [(url, body, iso_date[, extra_headers[, content_type]])]
    -> a WARC byte stream."""
    chunks = []
    for rec in records:
        url, body, date = rec[0], rec[1], rec[2]
        extra = rec[3] if len(rec) > 3 else None
        ctype = rec[4] if len(rec) > 4 else "text/html"
        raw = build_record(
            url, body, date, extra_headers=extra, content_type=ctype
        )
        if gzip_members:
            co = zlib.compressobj(wbits=31)
            raw = co.compress(raw) + co.flush()
        chunks.append(raw)
    return b"".join(chunks)
