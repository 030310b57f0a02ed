"""Property-based differential tests: ours vs the reference's pure
functions over hypothesis-generated text. Skipped without the
reference checkout (fixtures + seeded corpus cover that case)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zzzarchived_arxiv_fulltext_ray.functions import psv, quality, unicode_fixes

# Bias generation toward the characters the kernels special-case.
_special = (
    "ﬁﬂﬀﬃﬄÆæŒœßᵫĲĳﬆﬅ‘’“”—·\xad\xa0\xf8\xd8\xe6\xc6\xa8\xb4\xb8\xb0`^~"
    "\n\r\t\f\x0b .,-()[]0123456789"
)
_text = st.text(
    alphabet=st.one_of(
        st.sampled_from(_special),
        st.characters(codec="utf-8", exclude_categories=("Cs",)),
    ),
    max_size=300,
)

_settings = settings(
    max_examples=150,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(_text)
@_settings
def test_fix_unicode_differential(reference_kernel, text):
    assert unicode_fixes.fix_unicode(text) == reference_kernel["fix_unicode"](
        text
    )


@given(_text)
@_settings
def test_awl_differential(reference_kernel, text):
    assert quality.average_word_length(text) == reference_kernel[
        "average_word_length"
    ](text)


@given(_text)
@_settings
def test_psv_differential(reference_kernel, text):
    assert psv.normalize_text_psv(text) == reference_kernel[
        "normalize_text_psv"
    ](text)


@given(st.lists(st.text(max_size=80), max_size=20))
@_settings
def test_tidy_lines_differential(reference_kernel, lines):
    assert psv.tidy_lines(list(lines)) == reference_kernel["tidy"](list(lines))


# -- total-function fuzz: the cascade never raises ---------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(payload=st.binary(min_size=0, max_size=4096),
       fallback=st.one_of(st.none(), st.text(max_size=200)))
def test_cascade_total_on_arbitrary_bytes(payload, fallback):
    """Errors-as-data contract: ANY payload yields an ExtractResult
    row (status succeeded|failed), never an exception — the property
    that keeps a 100 TB run from dying on one malformed record."""
    from zzzarchived_arxiv_fulltext_ray.functions.cascade import (
        extract_payload,
    )

    res = extract_payload(payload, fallback or None, "https://fuzz/x")
    assert res.status in ("succeeded", "failed")
    if res.status == "succeeded":
        assert isinstance(res.text, str) and res.text
    else:
        assert res.text is None and res.error


@settings(max_examples=150, deadline=None)
@given(payload=st.binary(min_size=0, max_size=2048))
def test_sniff_total(payload):
    from zzzarchived_arxiv_fulltext_ray.functions import sniff

    kind, charset = sniff.sniff(payload)
    assert kind in ("empty", "pdf", "html", "text", "binary")
    if kind in ("html", "text"):
        # decode never raises on the sniffed charset
        sniff.decode_payload(payload, charset)
