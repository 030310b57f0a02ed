"""Distributed triangle counting / clustering coefficient over an
undirected edge list.

The classic degree-ordered node-iterator (wedge-closure) algorithm,
expressed in Ray Data primitives:

1. degree per node — partial counts inside ``map_batches`` then one
   small groupby (never a whole-adjacency shuffle);
2. orient every edge from its lower-``(degree, id)`` endpoint to the
   higher one — after this orientation every node's OUT-degree is
   O(sqrt(m)) for any graph (Chiba-Nishizeki / Schank-Wagner), so no
   per-node hot spot survives and wedge volume is bounded by m^1.5;
3. wedges: group oriented edges by source, emit ordered out-neighbor
   pairs (numpy ``triu_indices``, vectorized);
4. closure: a bucketed hash semi-join of wedges against the oriented
   edge set on the composite (src, dst) key — ONE exchange, no
   broadcast adjacency.

Degree attachment uses two :func:`partitioned_hash_join` passes
(edges x degrees on u, then on v) — all exchanges are hash-bucketed;
driver state is O(1) (five scalar statistics).

Reference parity note: the reference engine has no graph operators;
this extends the near-dup/link-graph family (components, pagerank)
with the standard local-structure statistic a crawl-graph / dup-graph
analysis needs.
"""

import logging
from typing import Optional

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)


def _canonicalize(edges_ds):
    """Force u < v, drop self-loops, global distinct (one pair-key
    exchange)."""

    def canon(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        keep = lo != hi
        return pa.Table.from_pydict(
            {
                "u": pa.array(lo[keep], pa.int64()),
                "v": pa.array(hi[keep], pa.int64()),
            }
        )

    return edges_ds.map_batches(canon, batch_format="pyarrow").groupby(
        ["u", "v"]
    ).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def triangle_stats(
    edges_ds,
    num_buckets: int = 64,
    assume_canonical: bool = False,
):
    """Exact triangle count + global clustering coefficient of the
    undirected graph given as an edge list (columns ``u``, ``v``,
    int64). Returns a one-row pandas DataFrame
    ``(n_nodes, n_edges, n_wedges, n_triangles, global_clustering)``
    with exact integer statistics and
    ``global_clustering = 3.0 * n_triangles / n_wedges`` (0.0 for a
    wedge-free graph) — a single float expression of exact ints, so a
    SQL oracle reproduces it bit-for-bit.

    ``assume_canonical=True`` skips the dedup exchange when the input
    is already u<v, loop-free and distinct (e.g. built by an upstream
    groupby)."""
    from ray.data.aggregate import Sum

    from .relational import partitioned_hash_join

    # normalize first: empty input blocks (pandas-backed repartition
    # leftovers) carry no column types and would poison the joins'
    # schema inference — force every block to a typed (u, v) table
    def as_typed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.Table.from_pydict(
                {"u": pa.array([], pa.int64()),
                 "v": pa.array([], pa.int64())}
            )
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "u": pc.cast(batch["u"].combine_chunks(), pa.int64()),
                "v": pc.cast(batch["v"].combine_chunks(), pa.int64()),
            }
        )

    edges_ds = edges_ds.map_batches(as_typed, batch_format="pyarrow")
    edges = edges_ds if assume_canonical else _canonicalize(edges_ds)
    edges = edges.materialize()  # reused by degrees + 2 joins + count

    # -- degrees: batch-local partial counts -> one small groupby
    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        nodes, counts = np.unique(both, return_counts=True)
        return pa.Table.from_pydict(
            {
                "node": pa.array(nodes, pa.int64()),
                "d": pa.array(counts, pa.int64()),
            }
        )

    degrees = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .materialize()
    )

    n_nodes = degrees.count()
    n_edges = edges.count()

    # wedge total = sum C(d, 2) — tiny partial-sum tree
    def wedge_partial(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.Table.from_pydict(
            {"w": pa.array([int((d * (d - 1) // 2).sum())], pa.int64())}
        )

    wrow = (
        degrees.map_batches(wedge_partial, batch_format="pyarrow")
        .sum("w")
    )
    n_wedges = int(wrow) if wrow is not None else 0

    # -- attach degrees to both endpoints (two bucketed joins)
    def rename(cols):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(cols)

        return fn

    deg_u = degrees.map_batches(rename(["u", "deg_u"]),
                                batch_format="pyarrow")
    deg_v = degrees.map_batches(rename(["v", "deg_v"]),
                                batch_format="pyarrow")
    with_du = partitioned_hash_join(edges, deg_u, "u",
                                    num_buckets=num_buckets)
    with_dv = partitioned_hash_join(with_du, deg_v, "v",
                                    num_buckets=num_buckets)

    # -- orient: lower (deg, id) -> higher (deg, id)
    def orient(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        du = batch["deg_u"].to_numpy(zero_copy_only=False)
        dv = batch["deg_v"].to_numpy(zero_copy_only=False)
        u_first = (du < dv) | ((du == dv) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        ddst = np.where(u_first, dv, du)
        return pa.Table.from_pydict(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "dst_deg": pa.array(ddst, pa.int64()),
            }
        )

    oriented = with_dv.map_batches(
        orient, batch_format="pyarrow"
    ).materialize()  # reused: wedge gen + closure probe

    # -- wedges per source, out-neighbors ordered by (deg, id)
    def wedges_of_group(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy(zero_copy_only=False)
        dd = group["dst_deg"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, dd))
        dst = dst[order]
        n = dst.size
        if n < 2:
            return pa.Table.from_pydict(
                {"src": pa.array([], pa.int64()),
                 "dst": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(n, k=1)
        return pa.Table.from_pydict(
            {
                "src": pa.array(dst[ii], pa.int64()),
                "dst": pa.array(dst[jj], pa.int64()),
            }
        )

    wedges = oriented.groupby("src").map_groups(
        wedges_of_group, batch_format="pyarrow"
    )

    closed = partitioned_hash_join(
        wedges,
        oriented.map_batches(
            lambda b: b.select(["src", "dst"]), batch_format="pyarrow"
        ),
        ["src", "dst"],
        num_buckets=num_buckets,
        how="semi",
    )
    n_triangles = closed.count()

    import pandas as pd

    clustering = 3.0 * n_triangles / n_wedges if n_wedges > 0 else 0.0
    return pd.DataFrame(
        {
            "n_nodes": [np.int64(n_nodes)],
            "n_edges": [np.int64(n_edges)],
            "n_wedges": [np.int64(n_wedges)],
            "n_triangles": [np.int64(n_triangles)],
            "global_clustering": [clustering],
        }
    )


def cooccurrence_edges(
    ds,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_group: int = 256,
) -> "object":
    """Undirected co-occurrence edge list: items sharing a group form
    a pair; an edge survives if the pair co-occurs in >= ``min_count``
    distinct groups. One exchange on the group key (pair generation is
    numpy per group, items deduplicated within a group), one exchange
    on the pair key (the count aggregate). Groups larger than
    ``max_group`` items are dropped AND logged — the hot-key contract
    shared with the neardup bucket pair generator."""
    from ray.data.aggregate import Sum

    def pairs_of_group(group: pa.Table) -> pa.Table:
        items = np.unique(
            group[item_col].to_numpy(zero_copy_only=False)
        )
        if items.size < 2 or items.size > max_group:
            if items.size > max_group:
                logger.warning(
                    "cooccurrence_edges: dropping hot group key=%s "
                    "with %d items (max_group=%d)",
                    group[group_col][0].as_py(), items.size, max_group,
                )
            return pa.Table.from_pydict(
                {"u": pa.array([], pa.int64()),
                 "v": pa.array([], pa.int64())}
            )
        ii, jj = np.triu_indices(items.size, k=1)
        return pa.Table.from_pydict(
            {
                "u": pa.array(items[ii], pa.int64()),
                "v": pa.array(items[jj], pa.int64()),
            }
        )

    pairs = ds.groupby(group_col).map_groups(
        pairs_of_group, batch_format="pyarrow"
    )

    def local_count(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["u", "v"])
            .aggregate([([], "count_all")])
            .rename_columns(["u", "v", "n"])
        )

    counted = (
        pairs.map_batches(local_count, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Sum("n", alias_name="n"))
    )
    if min_count > 1:
        counted = counted.filter(
            expr=f"n >= {min_count}"
        )
    return counted.select_columns(["u", "v"])
