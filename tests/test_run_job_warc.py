"""run_job WARC-native ingest: the resumable production entry point
over raw crawl segments (.warc.gz), byte-identical to the parquet
pages path and resumable per WARC shard.

Reference parity: the reference's real input is crawl files fetched
per document (SURVEY S1, fulltext/services/legacy/legacy.py); here a
glob of WARC segments streams through sources/warc_source.py into the
same extraction pipeline via run_resumable's read_fn hook.
"""

import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from run_job import detect_input_format  # noqa: E402

from zzzarchived_arxiv_fulltext_ray.state import manifest as mf

SF = "/root/testdata/sf0.001"


class TestDetectInputFormat:
    def test_all_warc_auto(self):
        assert (
            detect_input_format(["a.warc.gz", "b.warc"]) == "warc"
        )

    def test_all_parquet_auto(self):
        assert detect_input_format(["a.parquet", "b.parquet"]) == "parquet"

    def test_mixed_is_an_error_not_a_guess(self):
        with pytest.raises(SystemExit):
            detect_input_format(["a.warc.gz", "b.parquet"])

    def test_explicit_overrides(self):
        assert detect_input_format(["weird.bin"], "warc") == "warc"

    def test_empty_watch_glob_defaults_parquet(self):
        assert detect_input_format([]) == "parquet"


@pytest.fixture()
def warc_and_parquet_shards(ray_session, tmp_path):
    """The same 300 synthesized pages materialized BOTH ways: parquet
    shards and .warc.gz crawl segments."""
    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.sources.pages import (
        pages_batch_from_documents,
    )
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        write_pages_as_warc,
    )

    docs = pq.read_table(f"{SF}/documents.parquet").slice(0, 300)
    pages = rd.from_arrow(docs).map_batches(
        pages_batch_from_documents, batch_format="pyarrow"
    )

    pq_dir = tmp_path / "pages_pq"
    pages.write_parquet(str(pq_dir))
    pq_files = sorted(str(p) for p in pq_dir.glob("*.parquet"))

    warc_dir = tmp_path / "pages_warc"
    pages = rd.from_arrow(docs).map_batches(
        pages_batch_from_documents, batch_format="pyarrow"
    )
    write_pages_as_warc(pages, str(warc_dir), rows_per_file=64)
    warc_files = sorted(str(p) for p in warc_dir.glob("*.warc.gz"))
    assert len(warc_files) >= 4  # multiple shards so resume is real
    return pq_files, warc_files


def _build(ds):
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )

    return extraction_pipeline(ds, derive_psv=False, concurrency=(1, 2))


def _warc_read_fn(paths):
    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
    )

    return read_pages_from_warc_stream(list(paths))


def test_warc_job_byte_identical_to_parquet_job(
    ray_session, warc_and_parquet_shards, tmp_path
):
    pq_files, warc_files = warc_and_parquet_shards

    out_pq = tmp_path / "out_pq"
    via_pq = mf.run_resumable(
        [pq_files], _build, str(out_pq),
    )

    out_warc = tmp_path / "out_warc"
    shards = mf.shard_input_files(warc_files, 2)
    via_warc = mf.run_resumable(
        shards, _build, str(out_warc), read_fn=_warc_read_fn,
    )

    assert via_warc["rows"] == via_pq["rows"] > 0
    # combined content hash is additive over (url, text) row digests,
    # so it is shard- and order-insensitive: equal hash == same bytes
    assert via_warc["content_hash"] == via_pq["content_hash"]


def test_warc_job_resumes_per_shard(
    ray_session, warc_and_parquet_shards, tmp_path
):
    _, warc_files = warc_and_parquet_shards
    shards = mf.shard_input_files(warc_files, 2)
    out = tmp_path / "out"

    partial = mf.run_resumable(
        shards[:1], _build, str(out), read_fn=_warc_read_fn
    )
    assert partial["processed"] == 1

    resumed = mf.run_resumable(
        shards, _build, str(out), read_fn=_warc_read_fn
    )
    assert resumed["skipped"] == 1
    assert resumed["processed"] == len(shards) - 1

    again = mf.run_resumable(
        shards, _build, str(out), read_fn=_warc_read_fn
    )
    assert again["processed"] == 0 and again["skipped"] == len(shards)
    assert again["content_hash"] == resumed["content_hash"]
