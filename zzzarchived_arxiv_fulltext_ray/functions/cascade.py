"""The quality-gated extraction cascade (kernel).

Re-expresses the reference's ``fulltext()`` control flow
(``extractor/fulltext/fulltext.py:136-178``, operator E4 in SURVEY.md)
for Common-Crawl-style payloads:

  primary extraction -> fix_unicode -> word-length gate (<= 45)
    -> on gate failure: alternate extraction -> fix_unicode -> gate
    -> still failing: "No accurate text could be extracted"

Per payload kind:

* ``html``  primary = main-content scorer (E1 analogue),
            alternate = whole-page visible text (E2/E3 analogue)
* ``pdf``   primary = PDF text layer (built-in content-stream parser;
            pdfminer only with RAYX_PDFMINER=1), alternate = tolerant
            salvage pass over every stream (E2/E3 analogue) — used
            both when the primary RAISES and when it fails the gate
* ``text``  payload (or the table's ``text`` column) is already raw
            extracted text — only normalization + gate apply
* ``empty`` falls back to the ``text`` column when present, else fails
            like the reference's NoContentError
            (``fulltext/services/extractor/extractor.py:127-128``)
* ``binary`` unrecognized payloads fail as data, never as exceptions
            (``fulltext/extract.py:212-217`` failure-record pattern)

Errors are *returned*, not raised: the pipeline stores per-row
``status``/``error`` columns exactly like the reference stores FAILED
extraction records.
"""

from typing import NamedTuple, Optional

from . import html_main, pdf_text, quality, sniff
from .unicode_fixes import fix_unicode

STATUS_OK = "succeeded"
STATUS_FAILED = "failed"

# Payloads larger than this fail fast instead of monopolizing a worker —
# the streaming analogue of the reference's 600 s per-document subprocess
# timeout (extractor/fulltext/fulltext.py:12). 64 MiB of markup is far
# beyond any real page and would dominate a batch otherwise.
MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


class ExtractResult(NamedTuple):
    text: Optional[str]
    status: str
    error: Optional[str]
    payload_kind: str


def _failed(kind: str, message: str) -> ExtractResult:
    return ExtractResult(None, STATUS_FAILED, message, kind)


def _gate(raw: str, source: str, kind: str, alternate) -> ExtractResult:
    """fix_unicode + word-length gate, with one alternate retry."""
    out = fix_unicode(raw)
    if quality.passes_quality(out):
        return ExtractResult(out, STATUS_OK, None, kind)
    if alternate is not None:
        try:
            out = fix_unicode(alternate())
        except Exception as exc:  # alternate extractor crashed
            return _failed(kind, f"alternate extraction failed: {exc}")
        if quality.passes_quality(out):
            return ExtractResult(out, STATUS_OK, None, kind)
    return _failed(
        kind, 'No accurate text could be extracted from "{}"'.format(source)
    )


def extract_payload(
    payload: bytes,
    fallback_text: Optional[str],
    source: str = "",
) -> ExtractResult:
    """Run the full cascade over one page payload.

    ``fallback_text`` is the pages table's ``text`` column (pre-
    extracted ground truth when the crawl provides it); ``source`` is
    the url, used only in error messages (mirroring the reference's
    per-file messages).
    """
    if payload is None:
        payload = b""
    if len(payload) > MAX_PAYLOAD_BYTES:
        return _failed(
            "oversized",
            f"payload exceeds {MAX_PAYLOAD_BYTES} bytes "
            f"({len(payload)}); refusing (timeout analogue)",
        )

    kind, charset = sniff.sniff(payload)

    if kind == sniff.KIND_EMPTY:
        if fallback_text:
            return _gate(fallback_text, source, "text", None)
        return _failed(kind, 'No content in "{}"'.format(source))

    if kind == sniff.KIND_PDF:
        # Full E1->E2->E3 cascade parity (fulltext.py:136-178): primary
        # parse; on parse FAILURE fall back to the salvage pass; on
        # quality-GATE failure retry with salvage as the alternate.
        salvage = lambda: pdf_text.extract_pdf_text_salvage(payload)
        try:
            raw = pdf_text.extract_pdf_text(payload)
        except pdf_text.PdfParseError as exc:
            try:
                raw = salvage()
            except pdf_text.PdfParseError:
                return _failed(kind, f"PDF extraction failed: {exc}")
            return _gate(raw, source, kind, None)
        return _gate(raw, source, kind, salvage)

    if kind == sniff.KIND_HTML:
        markup = sniff.decode_payload(payload, charset)
        try:
            raw = html_main.extract_main_text(markup)
        except Exception as exc:
            return _failed(kind, f"HTML parse failed: {exc}")
        return _gate(
            raw, source, kind, lambda: html_main.extract_all_text(markup)
        )

    if kind == sniff.KIND_TEXT:
        return _gate(sniff.decode_payload(payload, charset), source, kind, None)

    return _failed(kind, 'Unsupported payload in "{}"'.format(source))
