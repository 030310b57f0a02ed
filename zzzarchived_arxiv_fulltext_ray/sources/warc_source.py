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
    urls, stamps, payloads = [], [], []
    for headers, payload in records:
        if headers.get("WARC-Type", "response") != "response":
            continue
        _, body = warc_mod.split_http_response(payload)
        urls.append(headers.get("WARC-Target-URI", ""))
        stamps.append(
            warc_mod.parse_warc_date(headers.get("WARC-Date", ""))
            or BASE_TS
        )
        payloads.append(body)
    return pa.Table.from_pydict(
        {
            "url": urls,
            "warc_ts": stamps,
            "html": payloads,
            "text": [""] * len(urls),
            "lang": [""] * len(urls),
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
