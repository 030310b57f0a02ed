"""Single-document convenience API (reference-parity surface).

The reference exposes one-document extraction over HTTP
(``POST /<bucket>/<identifier>`` -> ``Extraction`` record,
``fulltext/domain.py:12-74``). The engine's equivalent is a plain
function: same record fields, same status semantics, no queue — useful
for spot-debugging a single page and for parity tests. The distributed
path is ``pipelines.extraction.extraction_pipeline``.
"""

import time
from typing import Optional

from .. import EXTRACTOR_VERSION
from ..functions.cascade import extract_payload
from ..functions.psv import normalize_text_psv


def extract_document(
    payload: bytes,
    fallback_text: Optional[str] = None,
    identifier: str = "",
    bucket: str = "pages",
    fmt: str = "plain",
) -> dict:
    """Extract one document; returns an Extraction-shaped record.

    ``fmt``: ``plain`` (the extracted text) or ``psv`` (derived
    sentence view) — the reference's two supported formats
    (``fulltext/domain.py:77-84``).
    """
    if fmt not in ("plain", "psv"):
        raise ValueError(f"unsupported format: {fmt}")
    started = time.time()
    res = extract_payload(payload, fallback_text, identifier)
    content = res.text
    if content is not None and fmt == "psv":
        content = normalize_text_psv(content)
    return {
        "identifier": identifier,
        "bucket": bucket,
        "version": EXTRACTOR_VERSION,
        "status": res.status,
        "exception": res.error,
        "content": content,
        "format": fmt,
        "payload_kind": res.payload_kind,
        "started": started,
        "ended": time.time(),
    }
