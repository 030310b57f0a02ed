"""Differential tests: our kernel vs the reference's pure functions.

Runs the reference implementations (imported directly from
/root/reference — zero service deps) and ours over an adversarial
corpus and asserts byte-identical output. Skipped when the reference
checkout is absent; the committed golden fixtures in
tests/fixtures/kernel_golden.json pin the same contract standalone.
"""

import json
from pathlib import Path

import pytest

from zzzarchived_arxiv_fulltext_ray.functions import psv, quality, unicode_fixes

FIXTURES = Path(__file__).parent / "fixtures" / "kernel_golden.json"

CORPUS = [
    "",
    "plain ascii text. nothing special here.",
    "ligatures: ﬁnal ﬂow oﬀer aﬃx baﬄe ﬆop cœur Æon Straße ᵫber Ĳsselmeer",
    "quotes ‘a’ “b” dash—dash soft\xadhyphen mid\xb7dot nb\xa0sp",
    "beta at word start: ßeta and inside: groß and große",
    "accent garble: a\xa8\nb gr\x60\nave circ\x5e\num til\x7e\nde \xf8 \xd8 \xe6 \xc6 \xdf",
    "(cid:123)(cid:4) lllll ..... ***** repeated junk",
    "hyphen break: the saus- \nage continued on the next line. \nDone. ",
    "Fig. 1 shows Eqs. 2-3 in Sect. 4; see Refs. 5, Prof. X and Dr. Y.",
    "arxiv:1234.5678 stamp line\nreal content here.\n1234\nUniversity of Testing\nmore.",
    "body text line one.\nbody text line two.\nReferences\n[1] A. Author 1999.",
    "short.\nBibliography\n" + "\n".join(f"[{i}] ref {i}." for i in range(20)),
    "U.S.A. and U.S. and a b c single letters x.",
    "tabs\tand\fform\x0bfeeds\rand\r\nmixed eols",
    "numbers 3.14/ 2.71 42 1x2y3z 10.5/20",
    "  leading whitespace\n   more  spaces   everywhere    ",
    "UPPER case LINES\nlowercase continuation line\n. starts with dot space",
    "wérd ünïcode açcents naïve café résumé",
    "a" * 5000,
    "word " * 2000,
    "‘’“”—\xad\xb7\xa0ﬀﬁﬂﬃﬄ",
    "no trailing newline but a References heading\nReferences",
    "  REFERENCES  \nafter refs only one line",
    "1\nInstitute of Things\n2\nuniversity town\nnormal line",
]


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURES) as f:
        return json.load(f)


def test_fix_unicode_matches_fixtures(golden):
    for case in golden["cases"]:
        assert unicode_fixes.fix_unicode(case["input"]) == case["fix_unicode"]


def test_awl_matches_fixtures(golden):
    for case in golden["cases"]:
        assert quality.average_word_length(case["input"]) == case["awl"]


def test_psv_matches_fixtures(golden):
    for case in golden["cases"]:
        assert psv.normalize_text_psv(case["input"]) == case["psv"]
        got_body, got_tail = psv.process_text(case["input"])
        assert got_body == case["body"]
        assert got_tail == case["tail"]


def test_corpus_covered_by_fixtures(golden):
    assert [c["input"] for c in golden["cases"]] == CORPUS


def test_differential_against_reference(reference_kernel):
    for text in CORPUS:
        assert unicode_fixes.fix_unicode(text) == reference_kernel["fix_unicode"](text)
        assert quality.average_word_length(text) == reference_kernel[
            "average_word_length"
        ](text)
        assert psv.normalize_text_psv(text) == reference_kernel["normalize_text_psv"](
            text
        )


def test_differential_randomized(reference_kernel):
    """Seeded random mixtures of tricky alphabets, ours vs reference."""
    import random

    rng = random.Random(20260817)
    alphabet = (
        "abc XYZ .,;:!?()[]{}\n\r\t\f 0123456789-_/ "
        "ﬁﬂﬀÆæŒœß‘’“”—\xad\xb7\xa0\xf8\xd8\xe6\xc6\xa8\xb4`^~"
        "References Bibliography arxiv university Fig. Eq. w.w. a b "
    )
    for _ in range(200):
        n = rng.randrange(0, 400)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert unicode_fixes.fix_unicode(text) == reference_kernel["fix_unicode"](text)
        assert psv.normalize_text_psv(text) == reference_kernel["normalize_text_psv"](
            text
        )
        assert quality.average_word_length(text) == reference_kernel[
            "average_word_length"
        ](text)
