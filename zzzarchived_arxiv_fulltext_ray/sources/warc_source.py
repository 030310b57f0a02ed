"""Chunked WARC datasource: stream Common-Crawl-sized .warc(.gz)
files into the pages schema under bounded memory.

``read_binary_files`` would hold each WARC as ONE row (a real crawl
segment is ~1 GB compressed — that blows block budgets). This
datasource reads each file in ``chunk_bytes`` slices through
:class:`functions.warc.WarcStreamParser` and emits an Arrow block
whenever ``block_rows`` response records (or end-of-file) accumulate,
so the resident state per read task is one chunk + one partial record
+ one output block. File-level parallelism comes from Ray Data's file
splitting (one or more files per read task); record framing itself is
inherently sequential per file.
"""

from typing import Iterator, List, Union

import pyarrow as pa

from ..functions import warc as warc_mod
from .pages import BASE_TS, PAGES_SCHEMA

DEFAULT_CHUNK_BYTES = 4 * 1024 * 1024
DEFAULT_BLOCK_ROWS = 512


def _records_to_pages(records) -> pa.Table:
    urls, stamps, payloads, texts, langs = [], [], [], [], []
    for headers, payload in records:
        fields = warc_mod.record_to_page_fields(headers, payload)
        if fields is None:
            continue
        url, ts, html, text, lang = fields
        urls.append(url)
        stamps.append(ts or BASE_TS)
        payloads.append(html)
        texts.append(text)
        langs.append(lang)
    return pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": stamps,
            "html": payloads,
            "text": texts,
            "lang": langs,
        },
        schema=PAGES_SCHEMA,
    )


try:
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """``ray.data.read_datasource``-able WARC reader (pages schema)."""

        _FILE_EXTENSIONS = ["warc", "warc.gz", "gz"]

        def __init__(
            self,
            paths: Union[str, List[str]],
            chunk_bytes: int = DEFAULT_CHUNK_BYTES,
            block_rows: int = DEFAULT_BLOCK_ROWS,
            **kwargs,
        ):
            super().__init__(paths, **kwargs)
            self._chunk_bytes = chunk_bytes
            self._block_rows = block_rows

        def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
            parser = warc_mod.WarcStreamParser()
            pending = []
            while True:
                chunk = f.read(self._chunk_bytes)
                if not chunk:
                    break
                pending.extend(parser.feed(chunk))
                while len(pending) >= self._block_rows:
                    yield _records_to_pages(pending[: self._block_rows])
                    del pending[: self._block_rows]
            pending.extend(parser.finish())
            if pending:
                yield _records_to_pages(pending)

except ImportError:  # pragma: no cover - datasource API moved
    WarcDatasource = None


def read_pages_from_warc_stream(
    paths,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    block_rows: int = DEFAULT_BLOCK_ROWS,
):
    """Streaming WARC -> pages Dataset (the scale path for real crawl
    segments; per-task memory is O(chunk + block), not O(file))."""
    import ray.data

    if WarcDatasource is None:  # pragma: no cover
        raise RuntimeError("FileBasedDatasource API unavailable")
    return ray.data.read_datasource(
        WarcDatasource(paths, chunk_bytes=chunk_bytes, block_rows=block_rows)
    )


# -- pages -> WARC (synthetic crawl segments for the WARC-native
# headline witness and for tests) ------------------------------------

def pages_batch_to_warc_bytes(
    batch: pa.Table, gzip_members: bool = True
) -> bytes:
    """One pages-schema batch -> one WARC byte stream.

    Inverse of :func:`_records_to_pages` under the documented mapping:
    non-empty ``html`` rides as the HTTP body (content-type by sniff:
    pdf/binary/html), text-only rows ride as ``text/plain`` bodies,
    ``lang`` rides Common Crawl's ``WARC-Identified-Content-Language``
    WARC header. Round-tripping a pages table through
    ``build -> read_pages_from_warc_stream`` reproduces it row-for-row
    (see tests/test_warc.py::test_pages_warc_roundtrip).
    """
    from ..functions import sniff as sniff_mod

    records = []
    for url, ts, html, text, lang in zip(
        batch["url"].to_pylist(),
        batch["warc_ts"].to_pylist(),
        batch["html"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
    ):
        date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        extra = (
            {"WARC-Identified-Content-Language": lang} if lang else None
        )
        if html:
            kind = sniff_mod.sniff_kind(html)
            ctype = {
                sniff_mod.KIND_PDF: "application/pdf",
                sniff_mod.KIND_HTML: "text/html",
                sniff_mod.KIND_BINARY: "application/octet-stream",
            }.get(kind, "text/html")
            records.append((url, html, date, extra, ctype))
        else:
            body = text.encode("utf-8") if text else b""
            records.append((url, body, date, extra, "text/plain"))
    return warc_mod.build_warc(records, gzip_members=gzip_members)


def write_pages_as_warc(
    pages_ds,
    out_dir: str,
    gzip_members: bool = True,
    rows_per_file: int = 4096,
):
    """Materialize a pages Dataset as a directory of .warc(.gz) shard
    files (one file per output batch; names content-addressed by the
    first record so re-runs land on the same shards). Returns the
    per-shard manifest as a pandas frame (path, n_records, n_bytes).
    """
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if gzip_members else "warc"

    def write_shard(batch: pa.Table) -> pa.Table:
        blob = pages_batch_to_warc_bytes(batch, gzip_members=gzip_members)
        tag = hashlib.sha1(
            (batch["url"][0].as_py() + str(batch["warc_ts"][0].as_py())
             + str(batch.num_rows)).encode()
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{tag}.{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: readers never see partials
        return pa.Table.from_pydict(
            {
                "path": [path],
                "n_records": [batch.num_rows],
                "n_bytes": [len(blob)],
            }
        )

    return (
        pages_ds.map_batches(
            write_shard, batch_format="pyarrow", batch_size=rows_per_file
        )
        .to_pandas()
    )
