"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch computes a float64 matmul
  against it and emits its LOCAL top-k per query (partial top-k
  combiner), and a tiny groupby merges the partials. The shuffle moves
  O(queries x k x batches) rows, never the corpus.
* ``embedding_neardup`` — exact all-pairs cosine >= threshold via a
  broadcast normalized matrix; each batch compares its rows against
  the full matrix and emits pairs (i < j) once.
* ``embedding_neardup_lsh`` — the scale path: random-hyperplane
  signatures bucket the corpus; only in-bucket pairs are verified.
  Recall depends on planes/bands; verified pairs are exact.
"""

from typing import List

import numpy as np
import pyarrow as pa


def _matrix_of(batch: pa.Table) -> np.ndarray:
    return np.array(batch["embedding"].to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def load_query_matrix(emb_ds, query_ids: List[int]):
    """Materialize + broadcast the (small) query matrix once."""
    import ray

    qset = set(query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            [v in qset for v in batch["vec_id"].to_pylist()], pa.bool_()
        )
        return batch.filter(mask)

    qdf = (
        emb_ds.map_batches(pick, batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    qmat = _normalize(
        np.array(qdf["embedding"].tolist(), dtype=np.float64)
    )
    return ray.put((qdf["vec_id"].to_numpy(), qmat))


def ann_topk(emb_ds, query_ids: List[int], k: int = 10):
    """(query_id, neighbor_id) pairs: the exact cosine top-k neighbors
    of each query vector (queries excluded from their own results)."""
    import ray

    qref = load_query_matrix(emb_ds, query_ids)

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        mat = _normalize(_matrix_of(batch))
        sims = qmat @ mat.T  # (n_q, n_batch)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            row = sims[qi]
            valid = vids != qid
            order = np.argsort(-row)  # stable enough; ties resolved below
            taken = 0
            for idx in order:
                if not valid[idx]:
                    continue
                out_q.append(int(qid))
                out_n.append(int(vids[idx]))
                out_s.append(float(row[idx]))
                taken += 1
                if taken >= k:
                    break
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = emb_ds.map_batches(local_topk, batch_format="pyarrow")

    def merge_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(
                group["sim"].to_pylist(),
                group["neighbor_id"].to_pylist(),
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group["query_id"][0].as_py()
        return pa.Table.from_pydict(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )


def _broadcast_corpus(emb_ds):
    import ray

    df = emb_ds.to_pandas()
    ids = df["vec_id"].to_numpy()
    mat = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))
    return ray.put((ids, mat))


def embedding_neardup(emb_ds, threshold: float = 0.4):
    """Exact cosine near-dup pairs (vec_a < vec_b, sim >= threshold).

    Broadcast-matrix brute force: right for corpora whose embedding
    matrix fits per node (<= ~10M x 64 float32). Beyond that use
    :func:`embedding_neardup_lsh`."""
    import ray

    cref = _broadcast_corpus(emb_ds)

    def pairs(batch: pa.Table) -> pa.Table:
        ids, mat = ray.get(cref)
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        bm = _normalize(_matrix_of(batch))
        sims = bm @ mat.T  # (n_batch, n_corpus)
        out_a, out_b, out_s = [], [], []
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] >= threshold)[0]
            for c in hits:
                if vids[r] < ids[c]:  # emit each unordered pair once
                    out_a.append(int(vids[r]))
                    out_b.append(int(ids[c]))
                    out_s.append(float(sims[r, c]))
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return emb_ds.map_batches(pairs, batch_format="pyarrow")


class HyperplaneLSH:
    """Random-hyperplane signature stage (actor pool): vec -> sign-bit
    bucket keys over ``bands`` groups of ``planes_per_band`` planes."""

    def __init__(
        self,
        dim: int = 64,
        bands: int = 8,
        planes_per_band: int = 8,
        seed: int = 271828,
    ):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal(
            (bands, planes_per_band, dim)
        )
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_matrix_of(batch))
        vids = batch["vec_id"].to_pylist()
        keys, ids = [], []
        for b in range(self.bands):
            bits = (mat @ self.planes[b].T) > 0  # (n, planes)
            words = np.packbits(bits, axis=1)
            for i, vid in enumerate(vids):
                keys.append((b << 32) | int.from_bytes(words[i].tobytes(), "big"))
                ids.append(vid)
        return pa.Table.from_pydict(
            {"bucket_key": pa.array(keys, pa.int64()),
             "doc_id": pa.array(ids, pa.int64())}
        )


def embedding_neardup_lsh(
    emb_ds, threshold: float = 0.4, bands: int = 8, planes_per_band: int = 8
):
    """LSH-bucketed near-dup: hyperplane buckets -> in-bucket candidate
    pairs -> exact cosine verify against the broadcast matrix."""
    import ray

    from .neardup import bucket_pairs

    cref = _broadcast_corpus(emb_ds)
    dim = len(emb_ds.take(1)[0]["embedding"])

    keyed = emb_ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={
            "dim": dim, "bands": bands, "planes_per_band": planes_per_band
        },
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    candidates = bucket_pairs(keyed, max_bucket=4096)

    def verify(batch: pa.Table) -> pa.Table:
        ids, mat = ray.get(cref)
        pos = {int(v): i for i, v in enumerate(ids)}
        out_a, out_b, out_s = [], [], []
        for a, b in zip(
            batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()
        ):
            s = float(mat[pos[a]] @ mat[pos[b]])
            if s >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_s.append(s)
        return pa.Table.from_pydict(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    return candidates.map_batches(verify, batch_format="pyarrow")


# -- IVF (inverted-file) ANN: the coarse-quantizer scale path ---------------

def train_ivf_centroids(
    emb_ds, n_clusters: int = 16, iters: int = 10, seed: int = 314159,
    sample_size: int = 4096,
):
    """Deterministic k-means (seeded init, fixed iterations) over a
    sample of the corpus — the coarse quantizer of an IVF index.

    The sample + training run on the driver (centroids are tiny and
    training data is a bounded sample regardless of corpus size);
    assignment of the full corpus is distributed.
    """
    import pandas as pd

    # deterministic sample: first N rows by vec_id (corpus order is
    # a hash-ordered synthetic table; a seeded random_sample would be
    # equivalent but costs a pass)
    df = emb_ds.limit(sample_size).to_pandas()
    x = _normalize(np.array(df["embedding"].tolist(), dtype=np.float64))

    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)),
                             replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ivf_assign(emb_ds, centroids):
    """Distributed coarse assignment: add the nearest-centroid id."""
    import ray

    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        mat = _normalize(_matrix_of(batch))
        lists = np.argmax(mat @ cents.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists, pa.int32()))

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def ivf_topk(
    emb_ds, query_ids, k: int = 10, n_clusters: int = 16, n_probe: int = 4,
):
    """IVF ANN top-k: probe only the ``n_probe`` closest inverted lists
    per query instead of scanning the corpus — the scale path when the
    corpus stops fitting a broadcast matrix. Exactness depends on
    n_probe/n_clusters (recall tested against the brute-force baseline
    in tests)."""
    import ray

    centroids = train_ivf_centroids(emb_ds, n_clusters=n_clusters)
    assigned = ivf_assign(emb_ds, centroids)

    qref = load_query_matrix(emb_ds, query_ids)
    probe_lists = {}
    qids_arr, qmat = ray.get(qref)
    sims_qc = qmat @ centroids.T
    for qi, qid in enumerate(qids_arr):
        probe_lists[int(qid)] = set(
            np.argsort(-sims_qc[qi])[:n_probe].tolist()
        )
    pref = ray.put(probe_lists)

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat_w = ray.get(qref)
        probes = ray.get(pref)
        vids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        lists = np.asarray(batch["ivf_list"].to_pylist(), dtype=np.int32)
        mat = _normalize(_matrix_of(batch))
        sims = qmat_w @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            allowed = probes[int(qid)]
            mask = np.array([l in allowed for l in lists]) & (vids != qid)
            idxs = np.where(mask)[0]
            order = idxs[np.argsort(-sims[qi, idxs])][:k]
            for idx in order:
                out_q.append(int(qid))
                out_n.append(int(vids[idx]))
                out_s.append(float(sims[qi, idx]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = assigned.map_batches(local_topk, batch_format="pyarrow")

    def merge_topk(group: pa.Table) -> pa.Table:
        rows = sorted(
            zip(group["sim"].to_pylist(), group["neighbor_id"].to_pylist()),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        qid = group["query_id"][0].as_py()
        return pa.Table.from_pydict(
            {
                "query_id": pa.array([qid] * len(rows), pa.int64()),
                "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    return partials.groupby("query_id").map_groups(
        merge_topk, batch_format="pyarrow"
    )
