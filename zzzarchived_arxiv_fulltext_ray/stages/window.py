"""Distributed exact grouped ordered running totals (window cumsum).

Ray Data has no window functions; this stage computes the SQL
``sum(val) OVER (PARTITION BY group ORDER BY hash(id), id)`` exactly,
with no global sort:

1. annotate each row with its deterministic order key (md5 prefix of
   the id — the SQL-reconstructable ``stages.mixing`` convention) and
   a contiguous range bucket of that key (bucket order refines hash
   order);
2. one fixed-size exchange: the (group, bucket) value histogram;
   the driver prefix-sums it into per-(group, bucket) base offsets —
   O(groups x n_buckets) state, never rows;
3. per-(group, bucket) tasks sort their own slice (~1/n_buckets of a
   group) and emit base + local cumsum.

At 10^12 rows, pick ``n_buckets`` so a single (group, bucket) slice
fits a task (n_buckets ~ group_size / 10^6); the exchange stays tiny
because the histogram is pre-combined per batch.

:func:`shard_assign` applies it to the canonical use: carving a
corpus into fixed-token-budget shards per group, the deterministic
"which output shard does this document belong to" mapping a resumable
100 TB write needs.
"""

from typing import Dict

import numpy as np
import pyarrow as pa

from .mixing import doc_hash_keys

_SEP = "\x1f"  # composite (group, bucket) key separator


def grouped_ordered_cumsum(
    ds,
    group_col: str,
    id_col: str,
    val_col: str,
    n_buckets: int = 256,
):
    """Dataset[(group, id, val, ...)] -> Dataset[(id, group, val, cum)]
    where ``cum`` is the inclusive running total of ``val`` within
    ``group`` in ``(md5(id) prefix, id)`` order."""
    from ray.data.aggregate import Sum

    def annotate(batch: pa.Table) -> pa.Table:
        h = doc_hash_keys(batch[id_col].to_pylist())
        bucket = ((h * np.uint64(n_buckets)) >> np.uint64(32)).astype(
            np.int64
        )
        gk = pa.compute.binary_join_element_wise(
            pa.compute.cast(batch[group_col], pa.string()),
            pa.compute.cast(pa.array(bucket), pa.string()),
            _SEP,
        )
        return pa.Table.from_pydict(
            {
                "id": batch[id_col].combine_chunks(),
                "group": batch[group_col].combine_chunks(),
                "val": batch[val_col].combine_chunks(),
                "h": pa.array(h, pa.uint64()),
                "gk": gk,
            }
        )

    annotated = ds.map_batches(annotate, batch_format="pyarrow")

    # fixed-size exchange: (group, bucket) -> sum(val), pre-combined
    def partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select(["gk", "val"])
            .group_by(["gk"])
            .aggregate([("val", "sum")])
            .rename_columns(["gk", "val"])
        )

    hist = (
        annotated.map_batches(partial, batch_format="pyarrow")
        .groupby("gk")
        .aggregate(Sum("val", alias_name="val"))
        .to_pandas()
    )

    # driver: exclusive prefix within each group, buckets ascending
    base: Dict[str, int] = {}
    rows = []
    for gk, v in zip(hist["gk"], hist["val"]):
        group, bucket = gk.rsplit(_SEP, 1)
        rows.append((group, int(bucket), gk, int(v)))
    rows.sort()
    run_group, run = None, 0
    for group, _bucket, gk, v in rows:
        if group != run_group:
            run_group, run = group, 0
        base[gk] = run
        run += v

    def cum_of_group(g: pa.Table) -> pa.Table:
        # np.asarray over the pylist gives '<U..' dtype for string ids
        # (np.lexsort rejects object arrays) and int64 for ints
        ids = np.asarray(g["id"].to_pylist())
        hs = g["h"].to_numpy(zero_copy_only=False)
        vals = g["val"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, hs))  # primary h, tie-break id
        start = base.get(g["gk"][0].as_py(), 0)
        cum = start + np.cumsum(vals[order])
        return pa.Table.from_pydict(
            {
                "id": pa.array(ids[order]),
                "group": pa.array(
                    np.asarray(g["group"].to_pylist(), dtype=object)[order]
                ),
                "val": pa.array(vals[order], pa.int64()),
                "cum": pa.array(cum, pa.int64()),
            }
        )

    return annotated.groupby("gk").map_groups(
        cum_of_group, batch_format="pyarrow"
    )


def global_row_number(
    ds,
    id_col: str,
    key_col: str,
    descending: bool = True,
):
    """Exact global ``row_number() OVER (ORDER BY key [DESC], id)``
    without a global sort — the ranking window primitive.

    Plan: a (key -> count) histogram (pre-combined per batch; the
    exchange is over DISTINCT key values, which for integer features
    like lengths is far smaller than the corpus) -> driver exclusive
    prefix over the sorted key domain -> per-key groups rank their own
    rows by id against the broadcast base offset. A key value shared
    by many rows makes one task proportional to that tie group — cap
    via a finer (composite) key if a feature is extremely heavy-tied.

    Returns Dataset[(id, key, rnk)], rnk starting at 1.
    """
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([key_col])
            .group_by([key_col])
            .aggregate([([], "count_all")])
            .rename_columns([key_col, "n"])
        )

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(key_col, ascending=not descending)
    )
    base: Dict[int, int] = {}
    run = 0
    for k, n in zip(hist[key_col], hist["n"]):
        base[k] = run
        run += int(n)

    def rank_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col].to_pylist())
        order = np.argsort(ids, kind="stable")
        start = base.get(g[key_col][0].as_py(), 0)
        rnk = start + np.arange(1, len(ids) + 1, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "id": pa.array(ids[order]),
                "key": g[key_col].take(
                    pa.array(order, pa.int64())
                ).combine_chunks(),
                "rnk": pa.array(rnk, pa.int64()),
            }
        )

    return ds.select_columns([id_col, key_col]).groupby(key_col).map_groups(
        rank_group, batch_format="pyarrow"
    )


def grouped_row_number(
    ds,
    part_col: str,
    id_col: str,
    key_col: str,
    descending: bool = False,
    with_hist: bool = False,
):
    """Exact ``row_number() OVER (PARTITION BY part ORDER BY key
    [DESC], id)`` — the partitioned spelling of
    :func:`global_row_number`, same no-global-sort plan with the
    histogram keyed by (part, key).

    Returns Dataset[(id, part, key, rnk)], rnk starting at 1 within
    each partition. ``with_hist=True`` returns ``(ds, hist)`` where
    ``hist`` is the already-computed (part, key, n) pandas histogram —
    callers needing group sizes (ntile, quantiles) derive them from it
    instead of paying a second corpus scan.
    """
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([part_col, key_col])
            .group_by([part_col, key_col])
            .aggregate([([], "count_all")])
            .rename_columns([part_col, key_col, "n"])
        )

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby([part_col, key_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(
            [part_col, key_col], ascending=[True, not descending]
        )
    )
    base: Dict[tuple, int] = {}
    run_part, run = None, 0
    for p, k, n in zip(hist[part_col], hist[key_col], hist["n"]):
        if p != run_part:
            run_part, run = p, 0
        base[(p, k)] = run
        run += int(n)

    def annotate(batch: pa.Table) -> pa.Table:
        gk = pa.compute.binary_join_element_wise(
            pa.compute.cast(batch[part_col], pa.string()),
            pa.compute.cast(batch[key_col], pa.string()),
            _SEP,
        )
        return pa.Table.from_pydict(
            {
                "id": batch[id_col].combine_chunks(),
                "part": batch[part_col].combine_chunks(),
                "key": batch[key_col].combine_chunks(),
                "gk": gk,
            }
        )

    def rank_group(g: pa.Table) -> pa.Table:
        ids = np.asarray(g["id"].to_pylist())
        order = np.argsort(ids, kind="stable")
        start = base.get(
            (g["part"][0].as_py(), g["key"][0].as_py()), 0
        )
        rnk = start + np.arange(1, len(ids) + 1, dtype=np.int64)
        take = pa.array(order, pa.int64())
        return pa.Table.from_pydict(
            {
                "id": pa.array(ids[order]),
                "part": g["part"].take(take).combine_chunks(),
                "key": g["key"].take(take).combine_chunks(),
                "rnk": pa.array(rnk, pa.int64()),
            }
        )

    out = (
        ds.select_columns([part_col, id_col, key_col])
        .map_batches(annotate, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(rank_group, batch_format="pyarrow")
    )
    return (out, hist) if with_hist else out


def ntile_of_rank(rnk: np.ndarray, n: int, tiles: int) -> np.ndarray:
    """SQL NTILE semantics from 1-based ranks: the first ``n % tiles``
    tiles hold ``n // tiles + 1`` rows, the rest ``n // tiles``."""
    big = n // tiles + 1
    cut = (n % tiles) * big  # rows covered by the big tiles
    r = np.asarray(rnk, dtype=np.int64)
    in_big = r <= cut
    t_big = (r - 1) // max(big, 1) + 1
    small = max(n // tiles, 1)
    t_small = (n % tiles) + (r - cut - 1) // small + 1
    return np.where(in_big, t_big, t_small).astype(np.int64)


def shard_assign(
    docs_ds,
    shard_tokens: int,
    group_col: str = "lang",
    n_buckets: int = 256,
):
    """Deterministic fixed-token-budget shard ids per group: documents
    are laid out in hash order and cut every ``shard_tokens`` tokens;
    a document belongs to the shard its FIRST token lands in
    (``(cum - n_tokens) // shard_tokens``, the exclusive prefix).

    Returns a pandas frame (doc_id, lang, n_tokens, shard_id) sorted
    by doc_id.
    """

    def tokens(batch: pa.Table) -> pa.Table:
        n = pa.array(
            [len(t.split()) for t in batch["text"].to_pylist()], pa.int64()
        )
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].combine_chunks(),
                group_col: batch[group_col].combine_chunks(),
                "n_tokens": n,
            }
        )

    tok = docs_ds.map_batches(tokens, batch_format="pyarrow")
    cum = grouped_ordered_cumsum(
        tok, group_col, "doc_id", "n_tokens", n_buckets=n_buckets
    )

    def to_shard(batch: pa.Table) -> pa.Table:
        c = batch["cum"].to_numpy(zero_copy_only=False)
        v = batch["val"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["id"].combine_chunks(),
                group_col: batch["group"].combine_chunks(),
                "n_tokens": pa.array(v, pa.int64()),
                "shard_id": pa.array((c - v) // shard_tokens, pa.int64()),
            }
        )

    out = cum.map_batches(to_shard, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)

def grouped_rank_dense(ds, part_col: str, key_col: str,
                       descending: bool = True, with_pct: bool = False):
    """Exact ``rank()`` and ``dense_rank()`` ``OVER (PARTITION BY part
    ORDER BY key [DESC])`` — the tie-AWARE siblings of
    :func:`grouped_row_number`.

    Unlike row_number, both ranks are pure functions of the (part,
    key) VALUE: rank(v) = 1 + count of rows in the partition with a
    strictly better key, dense_rank(v) = 1 + count of DISTINCT better
    keys. So the whole window collapses to the same pre-aggregated
    value histogram the row_number plan builds (driver state bounded
    by distinct (part, key) pairs, never row count) plus ONE
    stateless map_batches that probes per-part sorted value arrays
    with ``np.searchsorted`` — no exchange, no group shuffle at all.

    Returns the input columns + ``rnk`` + ``drnk`` (both int64,
    1-based). ``with_pct=True`` adds ``pct_rank`` (= (rnk-1)/(n-1),
    0.0 for single-row partitions) and ``cume_dist`` (= rows ordered
    at-or-before v / n) — also pure value-functions of the same
    histogram, so still no exchange.

    Bound honesty: "bounded by distinct (part, key) pairs" degenerates
    to row count when the key is near-unique (continuous scores, raw
    ids) — the same bounded-distinct assumption every histogram plan
    in this repo makes (`global_row_number`, `lang_length_median`).
    This operator is for REPEATING keys, where ties make
    rank/dense_rank differ from row_number in the first place; for
    near-unique keys bucketize/quantize first, or use a sort-based
    ranking."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.select([part_col, key_col])
            .group_by([part_col, key_col])
            .aggregate([([], "count_all")])
            .rename_columns([part_col, key_col, "n"])
        )

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby([part_col, key_col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if hist[key_col].isna().any() or hist[part_col].isna().any():
        raise ValueError(
            "grouped_rank_dense: null partition/order keys are not "
            "supported (SQL NULL ordering is dialect-dependent; filter "
            "or fill them first)"
        )
    # per part: ascending distinct keys -> (rank, dense_rank) arrays
    lut: Dict[object, tuple] = {}
    for part, grp in hist.groupby(part_col):
        vals = grp[key_col].to_numpy()
        order = np.argsort(vals, kind="stable")
        vals = vals[order]
        cnt = grp["n"].to_numpy()[order].astype(np.int64)
        k = len(vals)
        csum = np.cumsum(cnt)
        total = int(csum[-1])
        if descending:
            rnk = csum[-1] - csum + 1          # 1 + #strictly greater
            drnk = np.arange(k, 0, -1, dtype=np.int64)
            at_or_before = total - csum + cnt  # rows with key >= v
        else:
            rnk = np.concatenate(([1], csum[:-1] + 1)).astype(np.int64)
            drnk = np.arange(1, k + 1, dtype=np.int64)
            at_or_before = csum                # rows with key <= v
        pct = (
            (rnk - 1) / (total - 1) if total > 1
            else np.zeros(k, dtype=np.float64)
        )
        cume = at_or_before / total
        lut[part] = (vals, rnk, drnk, pct, cume)

    def annotate(batch: pa.Table) -> pa.Table:
        parts = np.asarray(batch[part_col].to_pylist())
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        rnk = np.zeros(len(parts), dtype=np.int64)
        drnk = np.zeros(len(parts), dtype=np.int64)
        pct = np.zeros(len(parts), dtype=np.float64)
        cume = np.zeros(len(parts), dtype=np.float64)
        for part, (vals, r, d, p, c) in lut.items():
            m = parts == part
            if m.any():
                idx = np.searchsorted(vals, keys[m])
                rnk[m] = r[idx]
                drnk[m] = d[idx]
                pct[m] = p[idx]
                cume[m] = c[idx]
        out = batch.append_column(
            "rnk", pa.array(rnk, pa.int64())
        ).append_column("drnk", pa.array(drnk, pa.int64()))
        if with_pct:
            out = out.append_column(
                "pct_rank", pa.array(pct, pa.float64())
            ).append_column("cume_dist", pa.array(cume, pa.float64()))
        return out

    return ds.map_batches(annotate, batch_format="pyarrow")

def global_row_number_sorted(
    ds,
    id_col: str,
    key_col: str,
    descending: bool = True,
):
    """Exact global ``row_number() OVER (ORDER BY key [DESC], id)``
    via Ray's distributed SORT — the scale-general sibling of
    :func:`global_row_number` for NEAR-UNIQUE keys, where the
    histogram plan's driver state would degenerate to row count.

    Plan: ``ds.sort`` range-partitions into globally ordered blocks;
    block row counts come from the materialized blocks' metadata (an
    exclusive prefix over #blocks integers — the only driver state);
    each block then annotates ``base + arange`` in place. The
    annotation step drops to raw Ray tasks because a Dataset map
    cannot see its block's global position — exactly the documented
    last-resort case; order and lineage are preserved by operating on
    the materialized sorted block refs.

    Returns Dataset[(id, key, rnk)], rnk starting at 1.
    """
    import ray
    import ray.data as rd

    sorted_ds = (
        ds.select_columns([id_col, key_col])
        .sort([key_col, id_col], descending=[descending, False])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    bases = np.concatenate(([0], np.cumsum(counts)[:-1]))

    @ray.remote
    def _annotate(t: pa.Table, base: int) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "id": t[id_col].combine_chunks(),
                "key": t[key_col].combine_chunks(),
                "rnk": pa.array(
                    base + np.arange(1, t.num_rows + 1, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    return rd.from_arrow_refs(
        [
            _annotate.remote(r, int(b))
            for r, b in zip(refs, bases)
        ]
    )
