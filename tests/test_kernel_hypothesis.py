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


# ------------------------- gopher counting tricks vs straight Python

_gopher_text = st.text(
    alphabet=st.one_of(
        st.sampled_from("ab #.\n\t-* x1"),  # bias toward rule triggers
        st.characters(codec="utf-8", exclude_categories=("Cs",)),
    ),
    max_size=200,
)


@given(st.lists(_gopher_text, min_size=1, max_size=8))
@_settings
def test_gopher_stats_property(texts):
    """The vectorized non-overlapping-match counting tricks equal a
    straight Python recount on arbitrary text (ASCII whitespace
    class, matching RE2 semantics on both engines)."""
    import re

    import pyarrow as pa

    from zzzarchived_arxiv_fulltext_ray.stages.webtext import (
        GOPHER_STOPWORDS,
        gopher_stats_batch,
    )

    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = gopher_stats_batch(batch)
    for i, t in enumerate(texts):
        # RE2's \s is [\t\n\f\r ] — NO \x0b — unlike Python's
        # re.ASCII; both the engine (Arrow) and the oracle (DuckDB)
        # are RE2, so the model must use the RE2 class
        words = re.findall(r"[^ \t\n\f\r]+", t)
        lines = t.split("\n")
        assert out["n_words"][i].as_py() == len(words)
        assert out["n_word_chars"][i].as_py() == sum(len(w) for w in words)
        assert out["n_alpha_words"][i].as_py() == sum(
            1 for w in words if re.search(r"[A-Za-z]", w, re.ASCII)
        )
        assert out["n_symbols"][i].as_py() == t.count("#") + t.count("...")
        assert out["n_lines"][i].as_py() == len(lines)
        assert out["n_bullet_lines"][i].as_py() == sum(
            1 for l in lines if l.startswith(("- ", "* "))
        )
        assert out["n_ellipsis_lines"][i].as_py() == sum(
            1 for l in lines if l.endswith("...")
        )
        assert out["n_stop"][i].as_py() == sum(
            1 for w in GOPHER_STOPWORDS if w in words
        )


@given(st.lists(_gopher_text, min_size=1, max_size=6))
@_settings
def test_intra_doc_dup_property(texts):
    import pyarrow as pa

    from zzzarchived_arxiv_fulltext_ray.stages.webtext import (
        intra_doc_dup_batch,
    )

    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = intra_doc_dup_batch(batch)
    for i, t in enumerate(texts):
        lines = t.split("\n")
        assert out["n_lines"][i].as_py() == len(lines)
        assert out["n_dup_lines"][i].as_py() == len(lines) - len(set(lines))
        assert out["chars_total"][i].as_py() == sum(len(l) for l in lines)
        assert out["chars_dup"][i].as_py() == sum(
            len(l) for l in lines
        ) - sum(len(l) for l in set(lines))


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2**64 - 1), st.integers(1, 1000)
        ),
        min_size=1,
        max_size=60,
    ),
    st.data(),
)
@_settings
def test_ams_sketch_additive_under_arbitrary_splits(items, data):
    """AMS merge law: any split of any stream into two parts merges
    to the same Z vector and estimate as the whole stream — including
    duplicate keys landing on both sides."""
    import numpy as np

    from zzzarchived_arxiv_fulltext_ray.functions.sketches import AMSSketch

    hashes = np.array([h for h, _ in items], dtype=np.uint64)
    counts = np.array([c for _, c in items], dtype=np.int64)

    whole = AMSSketch(depth=5, width=4)
    whole.add_hashes(hashes, counts)

    split = data.draw(
        st.lists(
            st.integers(0, 1), min_size=len(items), max_size=len(items)
        )
    )
    mask = np.array(split, dtype=bool)
    a, b = AMSSketch(depth=5, width=4), AMSSketch(depth=5, width=4)
    a.add_hashes(hashes[mask], counts[mask])
    b.add_hashes(hashes[~mask], counts[~mask])
    merged = a.merge(b)
    assert np.array_equal(merged.z, whole.z)
    assert merged.estimate_num() == whole.estimate_num()
