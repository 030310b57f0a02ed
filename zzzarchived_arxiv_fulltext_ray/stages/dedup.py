"""URL-level dedup: keep the latest crawl per url (SURVEY.md A1/J2).

Two physical strategies for the same logical operator:

* ``latest_crawl_broadcast`` — aggregate ``max(warc_ts)`` per url over
  a *projected* (url, warc_ts) stream (the shuffle moves two tiny
  columns, never payloads), broadcast the winner set once via
  ``ray.put``, and filter the full stream against it inside
  ``map_batches``. The per-url aggregate runs as a distributed
  ``groupby("url")`` shuffle (batch-level combine first); only urls
  with >1 crawl ever reach the driver, so driver/broadcast state is
  O(#urls-with-duplicates), never O(#urls).

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


def dup_winner_map(
    ds, num_buckets: int = 64, combine_partitions: int = 16
) -> dict:
    """url -> max(warc_ts as int64 micros), for urls with >1 crawl.

    Distributed: batch-level combine (vectorized per-batch groupby)
    first, so the shuffle moves at most one (url, max_ts, n) row per
    url per batch; the tiny partial stream is coalesced to
    ``combine_partitions`` blocks (Ray's sort-shuffle overhead is
    per-block — coalescing 256 -> 16 blocks measured 7-9 s -> ~2 s on
    170k partial rows), then hash-exchanged on crc32(url) %
    ``num_buckets`` with a vectorized Arrow combine per bucket. The
    duplicate filter runs distributed, so the driver only ever
    iterates urls that actually have >1 crawl — O(dup-rate) driver
    state, never O(#urls). Sizing: each reduce task holds about
    #urls/num_buckets (url, int64, int64) rows — raise both knobs
    proportionally in the 10^10+-url regime.
    """
    from zlib import crc32

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                batch["url"].combine_chunks(),
                batch["warc_ts"].cast(pa.int64()).combine_chunks(),
            ],
            names=["url", "ts_us"],
        )
        g = t.group_by("url").aggregate([("ts_us", "max"), ("url", "count")])
        g = g.rename_columns(["url", "max_ts", "n"])
        buckets = pa.array(
            [crc32(u.encode()) % num_buckets for u in g["url"].to_pylist()],
            pa.int32(),
        )
        return g.append_column("bucket", buckets)

    def combine_bucket(group: pa.Table) -> pa.Table:
        g = group.select(["url", "max_ts", "n"]).group_by("url").aggregate(
            [("max_ts", "max"), ("n", "sum")]
        )
        g = g.rename_columns(["url", "max_ts", "n"])
        return g.filter(pc.greater(g["n"], 1))

    dup_winners = (
        ds.select_columns(["url", "warc_ts"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(combine_partitions)
        .groupby("bucket")
        .map_groups(combine_bucket, batch_format="pyarrow")
    )

    winners: dict = {}
    for b in dup_winners.iter_batches(batch_format="pyarrow"):
        for url, ts in zip(b["url"].to_pylist(), b["max_ts"].to_pylist()):
            winners[url] = ts
    return winners


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

    winners_ref = ray.put(dup_winner_map(ds))

    def keep_latest(batch: pa.Table) -> pa.Table:
        wmap = ray.get(winners_ref)
        if not wmap:
            return batch
        urls = batch["url"].to_pylist()
        stamps = batch["warc_ts"].cast(pa.int64()).to_pylist()
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


def partition_pages_by_url(ds, out_dir: str, num_buckets: int = 64):
    """Write the pages stream hash-partitioned by url (hive layout,
    ``url_bucket=N/`` dirs) — the shuffle-free alternative to a global
    cross-shard dedup pass: once re-crawls of a url are CO-LOCATED in
    one bucket, sharding job input by bucket makes per-shard
    latest-crawl dedup globally correct by construction, and any later
    url-keyed operator (blocklist joins, per-url aggregation) reads
    only its bucket. One-time cost: one all-to-all write of the
    corpus; amortized across every downstream run.

    Bucket = crc32(url) % num_buckets (process-stable; matches no
    other operator's bucketing on purpose — this is a storage layout,
    not an in-flight exchange).
    """
    from zlib import crc32

    def add_bucket(batch: pa.Table) -> pa.Table:
        buckets = pa.array(
            [crc32(u.encode()) % num_buckets
             for u in batch["url"].to_pylist()],
            pa.int32(),
        )
        return batch.append_column("url_bucket", buckets)

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["url_bucket"]
    )
    return out_dir
