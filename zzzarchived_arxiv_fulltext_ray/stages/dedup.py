"""URL-level dedup: keep the latest crawl per url (SURVEY.md A1/J2).

Two physical strategies for the same logical operator:

* ``latest_crawl_broadcast`` — aggregate ``max(warc_ts)`` per url over
  a *projected* (url, warc_ts) stream (the shuffle moves two tiny
  columns, never payloads), broadcast the winner set once via
  ``ray.put``, and filter the full stream against it inside
  ``map_batches``. The winner map is O(#urls-with-duplicates) when
  pre-filtered, so this is the fast path whenever the duplicate-url
  directory fits in memory on each node.

* ``latest_crawl_shuffle`` — hash-shuffle full rows by url and keep the
  max-``warc_ts`` row per group. No driver-side state; the fallback
  when the url directory itself is too big to broadcast (true
  10^12-row regime), at the price of shuffling payloads.

Assumption (documented per SURVEY.md): (url, warc_ts) pairs are unique
— re-crawls carry strictly increasing timestamps (the synthesizer
guarantees this; real WARC data does too at second granularity).
"""

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc


def latest_crawl_broadcast(ds, dup_threshold: Optional[int] = None):
    """Keep the latest crawl per url via a projected aggregate +
    broadcast anti-filter. Only urls that actually have >1 crawl enter
    the broadcast map, so its size tracks the duplicate rate, not the
    corpus size.

    Apply this to the RAW pages Dataset (before any payload-touching
    stage): the ``select_columns`` projection then pushes down into the
    Parquet read, so the winner pre-pass scans two tiny columns instead
    of payload bytes."""
    import ray

    # map-side combine (vectorized per-batch groupby) + driver merge:
    # shuffle-free, and the driver state is exactly the winner map the
    # broadcast path already assumes fits in memory. (A groupby-based
    # variant would scale further but costs an all-to-all — that's
    # what latest_crawl_shuffle is for.)
    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["url", "warc_ts"]).group_by("url").aggregate(
            [("warc_ts", "max"), ("url", "count")]
        )
        return g.rename_columns(["url", "max_ts", "n"])

    max_ts: dict = {}
    counts: dict = {}
    for b in (
        ds.select_columns(["url", "warc_ts"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for url, ts, n in zip(
            b["url"].to_pylist(), b["max_ts"].to_pylist(), b["n"].to_pylist()
        ):
            counts[url] = counts.get(url, 0) + n
            prev = max_ts.get(url)
            if prev is None or ts > prev:
                max_ts[url] = ts

    winners = {u: max_ts[u] for u, c in counts.items() if c > 1}
    winners_ref = ray.put(winners)

    def keep_latest(batch: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        if not wmap:
            return batch
        urls = batch["url"].to_pylist()
        stamps = batch["warc_ts"].to_pylist()
        mask = pa.array(
            [
                (u not in wmap) or (ts == wmap[u])
                for u, ts in zip(urls, stamps)
            ],
            type=pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep_latest, batch_format="pyarrow")


def latest_crawl_shuffle(ds):
    """Keep the latest crawl per url via a full hash shuffle on url.

    Scale path: no driver-side or broadcast state. Prefer running this
    AFTER payload columns are projected away, or accept that the
    shuffle moves payload bytes.
    """

    def newest(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        idx = pc.index(
            group["warc_ts"], pc.max(group["warc_ts"]).as_py()
        ).as_py()
        return group.slice(idx, 1)

    return ds.groupby("url").map_groups(newest, batch_format="pyarrow")


def latest_crawl(ds, method: str = "broadcast"):
    if method == "broadcast":
        return latest_crawl_broadcast(ds)
    if method == "shuffle":
        return latest_crawl_shuffle(ds)
    raise ValueError(f"unknown dedup method: {method}")
