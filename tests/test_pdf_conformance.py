"""Real-PDF conformance (E1 fidelity evidence).

The reference pins extraction quality on real arXiv PDFs with
min-length thresholds (extractor/tests/test_extractor.py:55-85). This
suite runs the SAME PDFs (read directly from the read-only reference
checkout — binary test data, not code) through this engine's PDF
parser and asserts the SAME thresholds: every available fixture must
extract at least as many characters as the reference demanded of
pdf2txt, via the PRIMARY parser (no salvage, no failure).

Skipped when the reference checkout is absent (the synthetic-corpus
oracles still pin the parser's round-trip contract).
"""

from pathlib import Path

import pytest

from zzzarchived_arxiv_fulltext_ray.functions import pdf_text

PDF_DIR = Path("/root/reference/extractor/tests/pdfs")

# (filename, min extracted chars) — thresholds copied from the
# reference's own assertions; only fixtures present in the checkout
REFERENCE_THRESHOLDS = [
    ("1512.03905.pdf", 20000),
    ("1804.08269.pdf", 47000),
    ("1905.00506.pdf", 47000),
    ("9108004.pdf", 45000),
    ("9109009.pdf", 27000),
    ("9912018.pdf", 47000),
]

pytestmark = pytest.mark.skipif(
    not PDF_DIR.exists(), reason="reference PDF fixtures not available"
)


@pytest.mark.parametrize("name,min_chars", REFERENCE_THRESHOLDS)
def test_real_pdf_meets_reference_threshold(name, min_chars):
    payload = (PDF_DIR / name).read_bytes()
    text = pdf_text.extract_pdf_text(payload)  # primary path, no salvage
    assert len(text) > min_chars, (name, len(text))


def test_real_pdf_cascade_failure_rate_zero():
    """Through the full cascade every real fixture must come out
    status=succeeded via strategy=primary — none may fall through to
    salvage or failure."""
    from zzzarchived_arxiv_fulltext_ray.functions.cascade import (
        extract_payload,
    )

    for name, _ in REFERENCE_THRESHOLDS:
        payload = (PDF_DIR / name).read_bytes()
        res = extract_payload(payload, None)
        assert res.status == "succeeded", (name, res.status, res.error)


def test_real_pdf_word_spacing_recovered():
    """TJ kerning must be read as word breaks: real TeX output has no
    space glyphs, so without the kern heuristic the text collapses to
    ~zero spaces."""
    payload = (PDF_DIR / "9912018.pdf").read_bytes()
    text = pdf_text.extract_pdf_text(payload)
    words = text.split()
    assert len(words) > 8000  # ~10k words in this paper
    # mean word length sane (concatenated text would be huge tokens)
    assert sum(map(len, words)) / len(words) < 9


@pytest.mark.skipif(
    pdf_text._pdfminer_extract is None,
    reason="pdfminer not installed in this image",
)
def test_pdfminer_optin_equivalence(monkeypatch):
    """With RAYX_PDFMINER=1 and pdfminer importable, the opt-in path
    must extract at least the reference thresholds too."""
    monkeypatch.setattr(pdf_text, "_PDFMINER_ENABLED", True)
    for name, min_chars in REFERENCE_THRESHOLDS:
        payload = (PDF_DIR / name).read_bytes()
        assert len(pdf_text.extract_pdf_text(payload)) > min_chars
