"""Payload sniffing: kind detection + charset detection (kernel).

The reference receives typed payloads over HTTP; Common-Crawl-style
pages carry an opaque ``html: binary`` column, so the engine sniffs
each payload: magic bytes for PDF (the reference's extractor dispatches
on the same ``%PDF-`` prefix semantics), tag probing for HTML, and a
chardet-style charset heuristic (BOM -> declared <meta> charset ->
strict UTF-8 probe -> Latin-1 fallback; chardet itself is not in the
sandbox image, cf. reference Pipfile:14).
"""

import codecs
import re
from typing import Tuple

KIND_PDF = "pdf"
KIND_HTML = "html"
KIND_TEXT = "text"
KIND_EMPTY = "empty"
KIND_BINARY = "binary"

_PDF_MAGIC = b"%PDF-"
_HTML_HINTS = re.compile(
    rb"<!doctype\s+html|<html[\s>]|<head[\s>]|<body[\s>]|<article[\s>]|<div[\s>]",
    re.IGNORECASE,
)
_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)
# BOM'd payloads map to the BOM-stripping codecs ("utf-16" consumes
# the BOM itself; "utf-16-le/-be" would leave a ﻿ in the text)
_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)


def detect_charset(payload: bytes, probe: int = 4096) -> str:
    """Best-effort charset: BOM, declared meta charset, UTF-8 probe,
    Latin-1 fallback (never fails)."""
    for bom, name in _BOMS:
        if payload.startswith(bom):
            return name
    m = _META_CHARSET.search(payload[:probe])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        try:
            codecs.lookup(name)
            return name
        except LookupError:
            pass
    try:
        payload.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def sniff_kind(payload: bytes, probe: int = 4096) -> str:
    """Classify a raw payload: pdf | html | text | empty | binary."""
    if not payload:
        return KIND_EMPTY
    if payload.startswith(_PDF_MAGIC):
        return KIND_PDF
    head = payload[:probe]
    for bom, name in _BOMS:
        if payload.startswith(bom):
            # BOM'd UTF-16/UTF-8 text: NUL bytes are code units, not a
            # binary signal — probe the DECODED head instead
            try:
                decoded = head.decode(name, errors="ignore")
            except LookupError:  # pragma: no cover
                break
            if _HTML_HINTS.search(decoded.encode("utf-8", "ignore")):
                return KIND_HTML
            return KIND_TEXT
    if _HTML_HINTS.search(head):
        return KIND_HTML
    # printable-text heuristic: NUL bytes or mostly non-text bytes => binary
    if b"\x00" in head:
        return KIND_BINARY
    textish = sum(
        1 for b in head if 0x20 <= b < 0x7F or b in (0x09, 0x0A, 0x0D)
    )
    if textish / len(head) < 0.7:
        return KIND_BINARY
    return KIND_TEXT


def sniff(payload: bytes) -> Tuple[str, str]:
    """(kind, charset) for a payload; charset is '' for pdf/binary/empty."""
    kind = sniff_kind(payload)
    if kind in (KIND_HTML, KIND_TEXT):
        return kind, detect_charset(payload)
    return kind, ""


def decode_payload(payload: bytes, charset: str = "") -> str:
    """Decode text-ish payload bytes with the sniffed/declared charset,
    falling back through UTF-8 then Latin-1 (which never fails)."""
    for enc in (charset or "utf-8", "utf-8", "latin-1"):
        try:
            return payload.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return payload.decode("latin-1", "replace")
