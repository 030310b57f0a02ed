"""Per-row HTTP fetch source: rate-limited actor-pool stage with the
reference's retry/backoff semantics (errors as data).

Re-expresses the reference's canonical-PDF retrieve loop
(``fulltext/services/legacy/legacy.py:64-112``, operator S3 in
SURVEY.md) as a Ray Data stage instead of a per-task HTTP call:

* 404                       -> permanent ``missing`` (no retry)
* other non-200             -> permanent ``failed`` (no retry —
                               reference raises ``IOError`` outright)
* 200 but wrong content-type-> "not generated yet": sleep + retry up
                               to ``max_retries`` (reference: 5 x 5 s),
                               then ``failed``
* transport exception       -> transient (connection reset/timeout):
                               sleep + retry up to ``max_retries``

Unlike the reference (exception per document, Celery redelivers), a
batch engine must not kill a 10k-row task for one bad url, so failures
land in ``fetch_status`` / ``fetch_error`` columns — the same
errors-as-data pattern as the extraction cascade.

Scale posture: one actor = one polite client (session reuse, token-
bucket rate limit PER ACTOR, so cluster-wide QPS = rate x pool size —
size the pool to the target's crawl budget, not the node's CPUs; the
stage is IO-bound so ``num_cpus`` can stay fractional). The transport
is injectable and shipped to actors via constructor kwargs: the
default :class:`UrllibTransport` does live HTTP;
:class:`DictTransport` serves an in-memory corpus for tests and for
sandboxes with no network (this one).
"""

import time
from typing import Callable, Dict, Optional, Tuple

import pyarrow as pa

FETCHED = "fetched"
MISSING = "missing"
FAILED = "failed"


class FetchResponse:
    """Minimal response: status code, content-type, body bytes."""

    __slots__ = ("status_code", "content_type", "body")

    def __init__(self, status_code: int, content_type: str, body: bytes):
        self.status_code = status_code
        self.content_type = content_type
        self.body = body


class UrllibTransport:
    """Live-HTTP transport (stdlib only; no requests in the image).

    Instantiate INSIDE the actor (pass the class, not an instance) so
    each actor holds its own opener/connection state.
    """

    def __init__(self, timeout: float = 30.0, user_agent: str = "graft-fetch/1.0"):
        import urllib.request

        self._timeout = timeout
        self._opener = urllib.request.build_opener()
        self._opener.addheaders = [("User-Agent", user_agent)]

    def __call__(self, url: str) -> FetchResponse:
        import urllib.error

        try:
            with self._opener.open(url, timeout=self._timeout) as r:
                return FetchResponse(
                    r.status, r.headers.get("Content-Type", ""), r.read()
                )
        except urllib.error.HTTPError as e:  # non-2xx WITH a response
            return FetchResponse(
                e.code, e.headers.get("Content-Type", ""), b""
            )
        # URLError / socket errors propagate -> transient retry


class DictTransport:
    """Offline transport: serves ``{url: (content_type, body)}``.

    ``not_ready``: ``{url: n}`` — the first ``n`` calls for that url
    return 200 text/html (the reference's "PDF not generated yet"
    shape) before the real payload; ``flaky``: ``{url: n}`` — the
    first ``n`` calls raise ``ConnectionError``. Unknown urls get 404.
    Call counts live in the instance, and retries happen inside one
    actor's loop, so the schedule is deterministic under any row
    partitioning.
    """

    def __init__(
        self,
        corpus: Dict[str, Tuple[str, bytes]],
        not_ready: Optional[Dict[str, int]] = None,
        flaky: Optional[Dict[str, int]] = None,
        error_urls: Optional[Dict[str, int]] = None,
    ):
        self._corpus = corpus
        self._not_ready = dict(not_ready or {})
        self._flaky = dict(flaky or {})
        self._errors = dict(error_urls or {})
        self.calls: Dict[str, int] = {}

    def __call__(self, url: str) -> FetchResponse:
        self.calls[url] = self.calls.get(url, 0) + 1
        if self._flaky.get(url, 0) > 0:
            self._flaky[url] -= 1
            raise ConnectionError(f"injected transient failure for {url}")
        if url in self._errors:
            return FetchResponse(self._errors[url], "text/plain", b"")
        if url not in self._corpus:
            return FetchResponse(404, "text/plain", b"")
        if self._not_ready.get(url, 0) > 0:
            self._not_ready[url] -= 1
            return FetchResponse(
                200, "text/html", b"<html>not yet generated</html>"
            )
        ctype, body = self._corpus[url]
        return FetchResponse(200, ctype, body)


class FetchPool:
    """``map_batches`` actor: fetch each row's ``url`` politely.

    Output = input columns + ``html`` (fetched payload, empty on
    failure), ``fetch_status`` (fetched|missing|failed) and
    ``fetch_error``.
    """

    def __init__(
        self,
        transport_factory: Callable[[], Callable[[str], FetchResponse]]
        = UrllibTransport,
        max_retries: int = 5,
        retry_sleep: float = 5.0,
        rate_limit: Optional[float] = None,  # requests/sec PER ACTOR
        expected_content_type: Optional[str] = None,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._transport = transport_factory()
        self._max_retries = max_retries
        self._retry_sleep = retry_sleep
        self._min_interval = 1.0 / rate_limit if rate_limit else 0.0
        self._expected_ctype = expected_content_type
        self._clock = clock
        self._sleep = sleep
        self._next_allowed = 0.0

    def _throttle(self):
        if not self._min_interval:
            return
        now = self._clock()
        if now < self._next_allowed:
            self._sleep(self._next_allowed - now)
            now = self._next_allowed
        self._next_allowed = now + self._min_interval

    def _fetch_one(self, url: str) -> Tuple[bytes, str, str, str]:
        retries = self._max_retries
        while True:
            self._throttle()
            try:
                resp = self._transport(url)
            except Exception as exc:  # transient transport failure
                if retries < 1:
                    return b"", FAILED, f"transport error: {exc}", ""
                retries -= 1
                self._sleep(self._retry_sleep)
                continue
            if resp.status_code == 404:
                return b"", MISSING, "No such resource", ""
            if resp.status_code != 200:
                return (
                    b"", FAILED,
                    f"unexpected status for {url}: {resp.status_code}", "",
                )
            if (
                self._expected_ctype
                and not resp.content_type.startswith(self._expected_ctype)
            ):
                # reference legacy.py:97-110: 200 + wrong content-type
                # means "not generated yet" -> sleep and re-GET
                if retries < 1:
                    return b"", FAILED, "Could not retrieve; giving up", ""
                retries -= 1
                self._sleep(self._retry_sleep)
                continue
            return resp.body, FETCHED, "", resp.content_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies, statuses, errors, ctypes = [], [], [], []
        for url in batch["url"].to_pylist():
            body, st, err, ctype = self._fetch_one(url)
            bodies.append(body)
            statuses.append(st)
            errors.append(err)
            ctypes.append(ctype)
        out = batch
        for name in ("html", "fetch_status", "fetch_error",
                     "fetch_content_type"):
            if name in out.column_names:
                out = out.drop_columns([name])
        return (
            out.append_column("html", pa.array(bodies, pa.large_binary()))
            .append_column("fetch_status", pa.array(statuses, pa.string()))
            .append_column("fetch_error", pa.array(errors, pa.string()))
            .append_column(
                "fetch_content_type", pa.array(ctypes, pa.string())
            )
        )


def fetch_pages(
    urls_ds,
    transport_factory=UrllibTransport,
    *,
    max_retries: int = 5,
    retry_sleep: float = 5.0,
    rate_limit: Optional[float] = None,
    expected_content_type: Optional[str] = None,
    concurrency=(1, 8),
    batch_size: int = 64,
    num_cpus: float = 0.25,
):
    """urls Dataset (``url`` column [+ passthrough columns]) -> the
    same rows + ``html``/``fetch_status``/``fetch_error``.

    Compose with the extraction pipeline by filling the pages schema::

        pages = to_pages_schema(fetch_pages(urls, ...))
        extraction_pipeline(pages)

    IO-bound: default ``num_cpus=0.25`` packs 4 polite clients per
    core; total QPS = ``rate_limit`` x pool size.
    """
    return urls_ds.map_batches(
        FetchPool,
        fn_constructor_kwargs={
            "transport_factory": transport_factory,
            "max_retries": max_retries,
            "retry_sleep": retry_sleep,
            "rate_limit": rate_limit,
            "expected_content_type": expected_content_type,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def to_pages_schema(fetched_ds, default_lang: str = ""):
    """Shape a ``fetch_pages`` output into the canonical pages schema.

    ``text/plain`` bodies route to the ``text`` column (charset-sniffed
    decode, the SAME rule and code path as
    ``functions/warc.py::record_to_page_fields``); every other content
    type stays binary in ``html``. Missing/failed rows keep empty
    payloads and fail downstream with the cascade's own "No content"
    status — errors stay data."""
    from ..functions import sniff as sniff_mod
    from .pages import BASE_TS, PAGES_SCHEMA

    def shape(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = (
            batch["warc_ts"]
            if "warc_ts" in batch.column_names
            else pa.array([BASE_TS] * n, pa.timestamp("us"))
        )
        lang = (
            batch["lang"]
            if "lang" in batch.column_names
            else pa.array([default_lang] * n, pa.string())
        )
        if "fetch_content_type" in batch.column_names:
            ctypes = batch["fetch_content_type"].to_pylist()
        else:
            ctypes = [""] * n
        htmls, texts = [], []
        for body, ctype in zip(batch["html"].to_pylist(), ctypes):
            body = body or b""
            if ctype.lower().startswith("text/plain"):
                htmls.append(b"")
                texts.append(
                    sniff_mod.decode_payload(
                        body, sniff_mod.detect_charset(body)
                    )
                    if body
                    else ""
                )
            else:
                htmls.append(body)
                texts.append("")
        return pa.Table.from_arrays(
            [
                batch["url"].cast(pa.string()),
                ts,
                pa.array(htmls, pa.large_binary()),
                pa.array(texts, pa.string()),
                lang,
            ],
            schema=PAGES_SCHEMA,
        )

    return fetched_ds.map_batches(shape, batch_format="pyarrow")
