"""Extraction stages (Ray Data transforms over Arrow batches).

``sniff_stats_batch`` (stateless tasks) derives payload metadata;
``ExtractorPool`` (actor pool) runs the quality-gated cascade per row;
``psv_batch`` (stateless tasks) derives the PSV format. The html
payload column is dropped by the extractor — project heavy binary away
as early as possible so downstream shuffles move text, not markup
(SURVEY.md §4.2).

The per-row work in the extractor is a whole-document parse + regex
chain — inherently scalar (rows ARE documents, cf. SURVEY.md §7.3), so
the "vectorized" contract here is batch-in/batch-out Arrow with heavy
per-row kernels, like any parser/model-inference stage.
"""

import signal
import threading

import pyarrow as pa
import pyarrow.compute as pc

from .. import EXTRACTOR_VERSION
from ..functions import psv as psv_kernel
from ..functions.cascade import extract_payload

# Per-document wall-clock cap, mirroring the reference's 600 s
# subprocess timeout (extractor/fulltext/fulltext.py:12,74). A stuck
# parse becomes a status='failed' ROW; the actor survives.
DEFAULT_ROW_TIMEOUT_SEC = 600.0


class RowTimeout(Exception):
    """One document exceeded its extraction wall-clock budget."""


def _alarm_handler(signum, frame):
    raise RowTimeout()


def run_with_row_timeout(fn, seconds, *args):
    """Run ``fn(*args)`` under a SIGALRM watchdog.

    Interrupts pure-Python work (incl. catastrophic regex alternation
    written in Python and busy loops) between bytecodes; a single
    C-level call that never returns cannot be interrupted this way —
    that residual risk is what the size cap (MAX_PAYLOAD_BYTES) and
    the giant lane bound. No-ops off the main thread (Ray actor tasks
    run on the main thread of the worker process; anything else falls
    back to uncapped execution rather than crashing)."""
    if (
        not seconds
        or threading.current_thread() is not threading.main_thread()
    ):
        return fn(*args)
    old = signal.signal(signal.SIGALRM, _alarm_handler)
    signal.setitimer(signal.ITIMER_REAL, seconds)
    try:
        return fn(*args)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, old)

OUTPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("payload_kind", pa.string()),
        ("n_bytes", pa.int64()),
        ("size_bucket", pa.int32()),
        ("text", pa.string()),
        ("status", pa.string()),
        ("error", pa.string()),
        ("extractor_version", pa.string()),
    ]
)


def sniff_stats_batch(batch: pa.Table) -> pa.Table:
    """Add payload size + log2 size bucket (skew key, SURVEY.md A3)."""
    import numpy as np

    n_bytes = pc.binary_length(batch["html"]).cast(pa.int64())
    sizes = n_bytes.to_numpy(zero_copy_only=False)
    buckets = np.zeros(len(sizes), dtype=np.int32)
    pos = sizes > 0
    buckets[pos] = np.floor(np.log2(sizes[pos])).astype(np.int32)
    batch = batch.append_column("n_bytes", n_bytes)
    return batch.append_column("size_bucket", pa.array(buckets, pa.int32()))


class ExtractorPool:
    """Stateful extraction stage: one instance per actor, reused across
    batches (the warm-parser replacement for the reference's
    docker-container-per-document, SURVEY.md ST1).

    Use with ``ds.map_batches(ExtractorPool, batch_format="pyarrow",
    concurrency=N, batch_size=B)``.
    """

    def __init__(
        self,
        extractor_version: str = EXTRACTOR_VERSION,
        derive_psv: bool = False,
        row_timeout_sec: float = DEFAULT_ROW_TIMEOUT_SEC,
    ):
        # Per-actor setup happens once: the kernel modules' compiled
        # regex tables and (when present) pdfminer resources are loaded
        # on first import in this worker process.
        self.extractor_version = extractor_version
        self.derive_psv = derive_psv
        self.row_timeout_sec = row_timeout_sec
        from ..functions import cascade, html_main, pdf_text  # warm imports

        self._extract = cascade.extract_payload
        self.n_rows = 0
        self.n_failed = 0

    def _extract_row(self, payload, fallback, url):
        from ..functions.cascade import ExtractResult

        try:
            return run_with_row_timeout(
                self._extract, self.row_timeout_sec,
                payload or b"", fallback or None, url,
            )
        except RowTimeout:
            return ExtractResult(
                None,
                "failed",
                f"extraction timed out after {self.row_timeout_sec}s "
                f'for "{url}"',
                "timeout",
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        texts = batch["text"].to_pylist()

        out_text, out_status, out_error, out_kind = [], [], [], []
        out_psv = [] if self.derive_psv else None
        for url, payload, fallback in zip(urls, payloads, texts):
            res = self._extract_row(payload, fallback, url)
            out_text.append(res.text)
            out_status.append(res.status)
            out_error.append(res.error)
            out_kind.append(res.payload_kind)
            if out_psv is not None:
                # fused PSV derivation: the pool is the CPU-heavy stage,
                # a separate task stage would contend with it for cores
                out_psv.append(
                    psv_kernel.normalize_text_psv(res.text)
                    if res.text is not None
                    else None
                )
            self.n_rows += 1
            if res.status != "succeeded":
                self.n_failed += 1

        n = len(urls)
        arrays = [
            batch["url"].combine_chunks(),
            batch["warc_ts"].combine_chunks(),
            batch["lang"].combine_chunks(),
            pa.array(out_kind, type=pa.string()),
            batch["n_bytes"].combine_chunks(),
            batch["size_bucket"].combine_chunks(),
            pa.array(out_text, type=pa.string()),
            pa.array(out_status, type=pa.string()),
            pa.array(out_error, type=pa.string()),
            pa.array([self.extractor_version] * n, type=pa.string()),
        ]
        schema = OUTPUT_SCHEMA
        if out_psv is not None:
            arrays.append(pa.array(out_psv, type=pa.string()))
            schema = OUTPUT_SCHEMA.append(pa.field("psv", pa.string()))
        return pa.Table.from_arrays(arrays, schema=schema)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless-task variant of :class:`ExtractorPool` (same output)."""
    return ExtractorPool()(batch)


def psv_batch(batch: pa.Table) -> pa.Table:
    """Derive the PSV format from extracted plain text (E21; the
    reference derives psv from the stored plain content,
    ``fulltext/extract.py:226-227``)."""
    texts = batch["text"].to_pylist()
    psv_col = pa.array(
        [
            psv_kernel.normalize_text_psv(t) if t is not None else None
            for t in texts
        ],
        type=pa.string(),
    )
    return batch.append_column("psv", psv_col)
