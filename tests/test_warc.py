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
