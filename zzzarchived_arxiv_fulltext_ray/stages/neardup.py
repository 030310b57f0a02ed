"""Near-duplicate detection operators over a document corpus.

Three candidate-generation strategies feeding one exact verifier:

* ``ngram``   — inverted index on shingle hashes: explode (shingle,
  doc) -> groupby shingle -> in-bucket pairs. 100% recall for any pair
  sharing a shingle; candidate volume is bounded by capping bucket
  size (hot shingles are stop-shingles; cap + log, like stop-words).
* ``minhash`` — MinHash signatures -> LSH band buckets -> in-bucket
  pairs. Tunable recall/cost: (bands=64, rows=2) gives ~certain recall
  at J>=0.5 on small docs (miss prob (1-J^2)^64); the scale preset is
  (bands=16, rows=8) for J>=0.8 corpora.
* ``simhash`` — 64-bit SimHash; pairs within ``max_hamming`` found via
  the 4x16-bit pigeonhole blocks (hamming<=3 implies one equal block).

The verifier computes exact shingle Jaccard (or hamming) per candidate
pair. Candidate pairs are a tiny fraction of n^2, so the shingle sets
of involved docs are looked up from a broadcast map here; at 10^12-doc
scale replace the broadcast with a hash-partitioned join of pairs
against the shingle table on doc_a (then doc_b) — same algebra, two
shuffles, documented trade-off.
"""

from typing import Dict, List

import numpy as np
import pyarrow as pa

from ..functions import shingles as sk

SHINGLE_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("shingles", pa.list_(pa.uint64()))]
)


def shingle_batch(batch: pa.Table, k: int = 3) -> pa.Table:
    """documents batch -> (doc_id, distinct shingle hashes)."""
    hashes = [
        sk.shingle_hashes(t, k) for t in batch["text"].to_pylist()
    ]
    return pa.Table.from_arrays(
        [
            batch["doc_id"].combine_chunks(),
            pa.array([h.tolist() for h in hashes], type=pa.list_(pa.uint64())),
        ],
        schema=SHINGLE_SCHEMA,
    )


def explode_shingle_keys(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles) -> one (bucket_key, doc_id) row per shingle."""
    keys: List[int] = []
    ids: List[int] = []
    for doc_id, hs in zip(
        batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()
    ):
        keys.extend(hs)
        ids.extend([doc_id] * len(hs))
    return pa.Table.from_pydict(
        {"bucket_key": pa.array(keys, pa.uint64()),
         "doc_id": pa.array(ids, pa.int64())}
    )


class MinHashBandStage:
    """Actor-pool stage: (doc_id, shingles) -> (bucket_key, doc_id) per
    LSH band. The MinHasher permutation table is built once per actor."""

    def __init__(self, num_perm: int = 128, bands: int = 64, rows: int = 2):
        self.hasher = sk.MinHasher(num_perm)
        self.bands = bands
        self.rows = rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys: List[int] = []
        ids: List[int] = []
        for doc_id, hs in zip(
            batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()
        ):
            sig = self.hasher.signature(np.array(hs, dtype=np.uint64))
            for key in sk.band_keys(sig, self.bands, self.rows):
                keys.append(key)
                ids.append(doc_id)
        return pa.Table.from_pydict(
            {"bucket_key": pa.array(keys, pa.uint64()),
             "doc_id": pa.array(ids, pa.int64())}
        )


def simhash_block_keys(batch: pa.Table) -> pa.Table:
    """(doc_id, shingles) -> 4 rows keyed by (block_idx << 16 | block):
    hamming<=3 pairs must share at least one 16-bit block (pigeonhole).
    Also carries the full simhash for verification."""
    keys: List[int] = []
    ids: List[int] = []
    sims: List[int] = []
    for doc_id, hs in zip(
        batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()
    ):
        sh = sk.simhash64(np.array(hs, dtype=np.uint64))
        for q in range(4):
            block = (sh >> (16 * q)) & 0xFFFF
            keys.append((q << 16) | block)
            ids.append(doc_id)
            sims.append(sh)
    return pa.Table.from_pydict(
        {
            "bucket_key": pa.array(keys, pa.uint64()),
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sims, pa.uint64()),
        }
    )


def bucket_pairs(ds, max_bucket: int = 256):
    """groupby bucket_key -> unordered candidate pairs (doc_a < doc_b),
    deduplicated. Buckets above ``max_bucket`` docs are dropped (hot
    shingles/bands are boilerplate; a real run logs them)."""

    def pairs_of_group(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["doc_id"].to_pylist()))
        if len(ids) < 2 or len(ids) > max_bucket:
            return pa.Table.from_pydict(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64())}
            )
        a: List[int] = []
        b: List[int] = []
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.Table.from_pydict(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    pairs = ds.groupby("bucket_key").map_groups(
        pairs_of_group, batch_format="pyarrow"
    )
    # distinct pairs: a groupby on the pair key collapses duplicates
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )


def verify_jaccard(pairs_ds, shingle_map_ref, threshold: float):
    """Exact shingle-Jaccard filter over candidate pairs; the integer
    intersection/union division matches a DuckDB oracle bit-for-bit."""
    import ray

    def verify(batch: pa.Table) -> pa.Table:
        smap: Dict[int, np.ndarray] = ray.get(shingle_map_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(
            batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()
        ):
            j = sk.jaccard_arrays(smap[a], smap[b])
            if j >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return pairs_ds.map_batches(verify, batch_format="pyarrow")


def _broadcast_shingle_map(shingled_ds):
    """Collect doc_id -> shingle array into the object store once.

    Fine up to O(10^7) docs per node; the 10^12 path swaps this for a
    partitioned join (see module docstring)."""
    import ray

    smap: Dict[int, np.ndarray] = {}
    for batch in shingled_ds.iter_batches(batch_format="pyarrow"):
        for doc_id, hs in zip(
            batch["doc_id"].to_pylist(), batch["shingles"].to_pylist()
        ):
            smap[doc_id] = np.array(hs, dtype=np.uint64)
    return ray.put(smap)


def neardup_pairs(
    docs_ds,
    method: str = "ngram",
    threshold: float = 0.5,
    k: int = 3,
    num_perm: int = 128,
    bands: int = 64,
    rows: int = 2,
    max_bucket: int = 256,
):
    """End-to-end near-dup pairs: shingle -> candidates -> verify.

    Returns a Dataset of (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    shingled = docs_ds.map_batches(
        lambda b: shingle_batch(b, k), batch_format="pyarrow"
    )
    smap_ref = _broadcast_shingle_map(shingled)

    if method == "ngram":
        exploded = shingled.map_batches(
            explode_shingle_keys, batch_format="pyarrow"
        )
    elif method == "minhash":
        exploded = shingled.map_batches(
            MinHashBandStage,
            fn_constructor_kwargs={
                "num_perm": num_perm, "bands": bands, "rows": rows
            },
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
    else:
        raise ValueError(f"unknown candidate method: {method}")

    candidates = bucket_pairs(exploded, max_bucket=max_bucket)
    return verify_jaccard(candidates, smap_ref, threshold)


def simhash_pairs(docs_ds, max_hamming: int = 3, k: int = 3):
    """SimHash near-dup pairs: (doc_a, doc_b, hamming), hamming <=
    ``max_hamming`` (<=3 guarantees block-level recall via pigeonhole)."""
    shingled = docs_ds.map_batches(
        lambda b: shingle_batch(b, k), batch_format="pyarrow"
    )
    keyed = shingled.map_batches(simhash_block_keys, batch_format="pyarrow")

    def pairs_of_group(group: pa.Table) -> pa.Table:
        rows_ = sorted(
            set(zip(group["doc_id"].to_pylist(), group["simhash"].to_pylist()))
        )
        a, b, h = [], [], []
        for i in range(len(rows_) - 1):
            for j in range(i + 1, len(rows_)):
                d = sk.hamming64(rows_[i][1], rows_[j][1])
                if d <= max_hamming and rows_[i][0] != rows_[j][0]:
                    a.append(rows_[i][0])
                    b.append(rows_[j][0])
                    h.append(d)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(a, pa.int64()),
                "doc_b": pa.array(b, pa.int64()),
                "hamming": pa.array(h, pa.int32()),
            }
        )

    pairs = keyed.groupby("bucket_key").map_groups(
        pairs_of_group, batch_format="pyarrow"
    )
    return (
        pairs.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    )
