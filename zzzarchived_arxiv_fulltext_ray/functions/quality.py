"""Extraction-quality statistic and acceptance gate (kernel).

Re-expresses the reference QA check (``extractor/fulltext/fulltext.py:
17-18,27-44,166-178``): strip well-known extractor junk, compute the
average word length, and accept the text only when that average is at
or below a threshold (garbled extractions — ligature soup, CID runs,
single giant tokens — blow the average up).
"""

import re

# Junk emitted by broken PDF extractions: CID placeholders and
# repeated-rune runs (reference RE_REPEATS, fulltext.py:18).
_JUNK = re.compile(r"(\(cid:\d+\)|lllll|\.\.\.\.\.|\*\*\*\*\*)")

# Accept extractions whose junk-stripped average word length is at or
# below this (reference fulltext.py:166,173).
MAX_AVG_WORD_LENGTH = 45.0


def average_word_length(txt: str) -> float:
    """Junk-stripped characters per word (+1 smoothing), reference E5."""
    stripped = _JUNK.sub("", txt)
    n_words = len(stripped.split())
    return len(stripped) / (n_words + 1)


def passes_quality(txt: str, threshold: float = MAX_AVG_WORD_LENGTH) -> bool:
    """True when the text clears the reference's word-length gate."""
    return average_word_length(txt) <= threshold
