"""WARC framing + WARC -> pipeline end-to-end tests."""

from zzzarchived_arxiv_fulltext_ray.functions import warc


def _records():
    return [
        ("https://example.org/a", b"<html><body><p>" + b"alpha content, with commas, long enough to be scored. " * 3 + b"</p></body></html>", "2024-03-01T10:00:00Z"),
        ("https://example.org/b", b"plain text body here", "2024-03-01T11:30:00Z"),
    ]


class TestFraming:
    def test_roundtrip_plain(self):
        blob = warc.build_warc(_records())
        out = list(warc.iter_warc_records(blob))
        assert [h["WARC-Target-URI"] for h, _ in out] == [
            "https://example.org/a", "https://example.org/b"
        ]
        http, body = warc.split_http_response(out[1][1])
        assert body == b"plain text body here"
        assert http["Content-Type"] == "text/html"

    def test_roundtrip_gzip_members(self):
        blob = warc.build_warc(_records(), gzip_members=True)
        assert blob[:2] == b"\x1f\x8b"
        out = list(warc.iter_warc_records(blob))
        assert len(out) == 2

    def test_truncated_stream_yields_prefix(self):
        blob = warc.build_warc(_records())
        out = list(warc.iter_warc_records(blob[: len(blob) - 40]))
        assert len(out) == 1  # second record truncated -> dropped

    def test_date_parse(self):
        dt = warc.parse_warc_date("2024-03-01T10:00:00Z")
        assert (dt.year, dt.hour) == (2024, 10) and dt.tzinfo is None
        assert warc.parse_warc_date("nonsense") is None

    def test_warc_11_version_accepted(self):
        blob = warc.build_warc(_records()).replace(
            b"WARC/1.0", b"WARC/1.1"
        )
        out = list(warc.iter_warc_records(blob))
        assert len(out) == 2

    def test_chunked_transfer_encoding_dechunked(self):
        body = b"7\r\nchunked\r\n6\r\n body \r\n4\r\ndata\r\n0\r\n\r\n"
        payload = (
            b"HTTP/1.1 200 OK\r\n"
            b"Transfer-Encoding: chunked\r\n"
            b"\r\n" + body
        )
        http, out = warc.split_http_response(payload)
        assert out == b"chunked body data"

    def test_plain_body_untouched(self):
        payload = b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nwxyz"
        _, out = warc.split_http_response(payload)
        assert out == b"wxyz"


class TestStreamParser:
    def _collect(self, blob, chunk_size):
        p = warc.WarcStreamParser()
        out = []
        for i in range(0, len(blob), chunk_size):
            out.extend(p.feed(blob[i : i + chunk_size]))
        out.extend(p.finish())
        return out

    def test_equivalent_to_whole_buffer_any_chunking(self):
        many = _records() * 20
        for gz in (False, True):
            blob = warc.build_warc(many, gzip_members=gz)
            want = list(warc.iter_warc_records(blob))
            assert len(want) == 40
            for chunk_size in (1, 7, 64, 1000, len(blob)):
                got = self._collect(blob, chunk_size)
                assert got == want, (gz, chunk_size)

    def test_truncated_tail_dropped(self):
        blob = warc.build_warc(_records())
        got = self._collect(blob[: len(blob) - 40], chunk_size=50)
        assert len(got) == 1

    def test_property_chunking_invariance(self):
        """Property: for random record sets and random chunk splits,
        the stream parser equals the whole-buffer parser."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            bodies=st.lists(
                st.binary(min_size=0, max_size=300), min_size=1, max_size=8
            ),
            chunk=st.integers(min_value=1, max_value=400),
            gz=st.booleans(),
        )
        def check(bodies, chunk, gz):
            recs = [
                (f"https://h/{i}", body, "2024-03-01T10:00:00Z")
                for i, body in enumerate(bodies)
            ]
            blob = warc.build_warc(recs, gzip_members=gz)
            want = list(warc.iter_warc_records(blob))
            got = self._collect(blob, chunk)
            assert got == want

        check()


def test_warc_to_pipeline(ray_session, tmp_path):
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        read_pages_from_warc,
    )

    (tmp_path / "crawl.warc.gz").write_bytes(
        warc.build_warc(_records(), gzip_members=True)
    )
    pages = read_pages_from_warc(str(tmp_path / "crawl.warc.gz"))
    out = (
        extraction_pipeline(pages, dedup=None, derive_psv=False)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out.status.tolist() == ["succeeded", "succeeded"]
    assert out.payload_kind.tolist() == ["html", "text"]
    assert out.warc_ts.iloc[0].hour == 10


def test_streaming_warc_datasource(ray_session, tmp_path):
    """Chunked datasource over a multi-member gz WARC, read in tiny
    chunks and tiny blocks, matches the whole-file reader."""
    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        read_pages_from_warc,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
    )

    many = _records() * 25  # 50 records across gzip members
    path = tmp_path / "big.warc.gz"
    path.write_bytes(warc.build_warc(many, gzip_members=True))

    streamed = (
        read_pages_from_warc_stream(
            str(path), chunk_bytes=256, block_rows=8
        )
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    whole = (
        read_pages_from_warc(str(path))
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    assert len(streamed) == 50
    assert streamed.equals(whole)


def test_streaming_warc_to_pipeline(ray_session, tmp_path):
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
    )

    path = tmp_path / "crawl.warc"
    path.write_bytes(warc.build_warc(_records()))
    out = (
        extraction_pipeline(
            read_pages_from_warc_stream(str(path), chunk_bytes=128),
            dedup=None,
            derive_psv=False,
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out.status.tolist() == ["succeeded", "succeeded"]


def test_jsonl_pages_source(ray_session, tmp_path):
    """JSONL -> pages schema: base64 html decodes, warc_ts parses from
    ISO strings and epoch micros, defaults fill, missing url raises."""
    import base64
    import json

    import pyarrow as pa

    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        PAGES_SCHEMA,
        read_pages_from_jsonl,
    )

    good = tmp_path / "pages.jsonl"
    rows = [
        {
            "url": "https://a.example/1",
            "warc_ts": "2024-03-01T12:00:00",
            "html": base64.b64encode(b"<html><p>hi</p></html>").decode(),
            "lang": "en",
        },
        {"url": "https://a.example/2", "text": "plain text row"},
    ]
    good.write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    ds = read_pages_from_jsonl([str(good)])
    got = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got.columns) == [f.name for f in PAGES_SCHEMA]
    assert got["html"][0] == b"<html><p>hi</p></html>"
    assert str(got["warc_ts"][0]) == "2024-03-01 12:00:00"
    assert got["text"][1] == "plain text row"
    assert got["lang"][0] == "en"
    assert got["html"][1] == b""  # default fills
    assert str(got["warc_ts"][1]).startswith("2024-01-01")

    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"text": "no url field"}) + "\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="url"):
        read_pages_from_jsonl([str(bad)]).to_pandas()


def test_pages_warc_roundtrip(ray_session, tmp_path):
    """pages -> WARC shards -> streaming read back == the original
    pages table row-for-row (all 20 payload kinds, re-crawl dups,
    lang via WARC-Identified-Content-Language, text-only rows via
    text/plain bodies), and the extraction output over both sources
    is byte-identical."""
    import pyarrow as pa
    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        PAGES_SCHEMA,
        synthesize_rows,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
        write_pages_as_warc,
    )

    n = 60  # 3 full kind cycles; doc_id%10==0 rows crawl 3x
    cols = synthesize_rows(
        list(range(n)),
        [
            f"Document {i} body text, long enough to pass the gate, "
            "with punctuation and several distinct words." for i in range(n)
        ],
        ["en" if i % 3 else "de" for i in range(n)],
    )
    pages = pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)
    pages_ds = rd.from_arrow(pages).repartition(4)

    manifest = write_pages_as_warc(
        pages_ds, str(tmp_path / "warc"), rows_per_file=16
    )
    assert manifest.n_records.sum() == pages.num_rows
    assert len(manifest) >= 4

    back = (
        read_pages_from_warc_stream(
            sorted(manifest.path.tolist()), chunk_bytes=1024, block_rows=8
        )
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    orig = (
        pages.to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    # WARC carries one body per record: for rows WITH a payload the
    # redundant text-fallback column is not transported (the cascade
    # never reads it when the payload is non-empty); payload-less rows
    # round-trip their text exactly via text/plain bodies.
    expected = orig.copy()
    expected.loc[expected.html.str.len() > 0, "text"] = ""
    assert back.equals(expected), "pages table must round-trip exactly"

    def extract(src_ds):
        return (
            extraction_pipeline(src_ds, concurrency=(1, 2), batch_size=32)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    from_warc = extract(
        read_pages_from_warc_stream(sorted(manifest.path.tolist()))
    )
    from_table = extract(rd.from_arrow(pages))
    assert from_warc.equals(from_table), (
        "extraction over WARC source must be byte-identical"
    )


def test_curate_pages_from_warc(ray_session, tmp_path):
    """The flagship 4-family curation composition (dedup -> extraction
    -> gopher gate -> url-keyed token budget) over WARC shards equals
    the same composition over the pages table — the reference's real
    ingest format drives the whole curation chain, not just the
    extraction headline."""
    import pyarrow as pa
    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.pipelines.queries_corpus import (
        curate_pages_from,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        PAGES_SCHEMA,
        synthesize_rows,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
        write_pages_as_warc,
    )

    n = 60
    cols = synthesize_rows(
        list(range(n)),
        [
            f"Curated document {i} body text, long enough to pass the "
            "gopher gate, with punctuation, stopwords like the and of, "
            "and several distinct words appearing across sentences. "
            "Another full sentence follows here so the word count "
            "clears the thirty word minimum with comfortable margin."
            for i in range(n)
        ],
        ["en" if i % 3 else "de" for i in range(n)],
    )
    pages = pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)
    manifest = write_pages_as_warc(
        rd.from_arrow(pages).repartition(4),
        str(tmp_path / "warc"),
        rows_per_file=16,
    )

    from_warc = curate_pages_from(
        read_pages_from_warc_stream(sorted(manifest.path.tolist()))
    )
    from_table = curate_pages_from(rd.from_arrow(pages))
    assert len(from_table) > 0
    assert from_warc.equals(from_table)
