"""Shingling, MinHash, SimHash and Jaccard kernels (pure, deterministic).

Building blocks for the near-duplicate-detection operators. All
hashing is seeded/stable across processes (blake2b + seeded splitmix64
permutation mixes) — a requirement for distributed
runs, where every worker must agree on every signature.

Word 3-shingles are the canonical unit here: the oracle SQL mirrors
them as ``w[i] || ' ' || w[i+1] || ' ' || w[i+2]``.
"""

import hashlib
from typing import List, Set

import numpy as np

DEFAULT_NUM_PERM = 128


def word_shingles(text: str, k: int = 3) -> List[str]:
    """Overlapping word k-grams as space-joined strings."""
    words = text.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def stable_hash64(value: str) -> int:
    """Process-stable 64-bit hash (Python's hash() is salted).

    First 8 bytes of the md5 digest, little-endian — chosen to be
    BIT-IDENTICAL to DuckDB's ``md5_number_upper(value)`` so SQL
    oracles can reconstruct every signature built on this hash
    (SimHash, token ids); verified in
    ``tests/test_textstats_multimodal.py``."""
    return int.from_bytes(
        hashlib.md5(value.encode("utf-8")).digest()[:8], "little"
    )


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct stable 64-bit hashes of the word k-shingles."""
    return np.array(
        sorted({stable_hash64(s) for s in word_shingles(text, k)}),
        dtype=np.uint64,
    )


def _splitmix64(z: "np.ndarray") -> "np.ndarray":
    """Vectorized splitmix64 finalizer (wrapping uint64 arithmetic)."""
    z = (z + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(
        np.uint64
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(
        np.uint64
    )
    return (z ^ (z >> np.uint64(31))).astype(np.uint64)


class MinHasher:
    """``num_perm`` independent hash permutations (seeded splitmix64
    mixes - pure wrapping uint64, fully numpy-vectorizable) applied to
    shingle hashes; signature = per-permutation minimum. Construct once
    per actor (the seed table is the warm state)."""

    def __init__(self, num_perm: int = DEFAULT_NUM_PERM, seed: int = 1729):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.seeds = rng.integers(
            0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64
        )

    def signature(self, hashes: "np.ndarray") -> "np.ndarray":
        if hashes.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        # (num_perm, n) matrix of permuted values, one vectorized pass
        mixed = _splitmix64(hashes[None, :] ^ self.seeds[:, None])
        return mixed.min(axis=1)

    def signatures(self, hash_sets) -> "np.ndarray":
        return np.stack([self.signature(h) for h in hash_sets])

    def signatures_flat(
        self, flat: "np.ndarray", offsets: "np.ndarray"
    ) -> "np.ndarray":
        """Signatures for a whole batch at once: ``flat`` is the
        concatenation of every document's shingle hashes, ``offsets``
        the int64 segment boundaries (len = n_docs + 1). One
        (num_perm, total_shingles) mix + per-segment
        ``minimum.reduceat`` — identical values to calling
        :meth:`signature` per document (pinned in tests), without the
        per-document numpy dispatch overhead. Empty segments get the
        all-MAX signature, like :meth:`signature` on empty input."""
        n_docs = len(offsets) - 1
        maxv = np.iinfo(np.uint64).max
        if flat.size == 0:
            return np.full((self.num_perm, n_docs), maxv, np.uint64)
        mixed = _splitmix64(flat[None, :] ^ self.seeds[:, None])
        starts = offsets[:-1].astype(np.int64)
        # segments starting at/after the end are empty and must be
        # EXCLUDED (clipping their start would shorten the previous
        # segment's reduceat range); offsets are monotone so they can
        # only trail
        in_range = starts < flat.size
        sig = np.full((self.num_perm, n_docs), maxv, np.uint64)
        sig[:, in_range] = np.minimum.reduceat(
            mixed, starts[in_range], axis=1
        )
        empty = offsets[1:] == offsets[:-1]
        if empty.any():  # reduceat yields arr[start] for empty segments
            sig[:, empty] = maxv
        return sig


def band_keys(sig: np.ndarray, bands: int, rows: int) -> List[int]:
    """LSH band bucket keys: stable hash of each band's row slice,
    namespaced by band index."""
    assert bands * rows <= sig.size
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        digest = hashlib.blake2b(
            chunk, digest_size=8, salt=b.to_bytes(8, "big")
        ).digest()
        keys.append(int.from_bytes(digest, "big"))
    return keys


def band_key_matrix(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """LSH band bucket keys for a WHOLE batch, vectorized.

    ``sig`` is (num_perm, n_docs); returns (bands, n_docs) uint64.
    Each key is a splitmix64 fold of the band's ``rows`` signature
    values seeded by the band index — two keys are equal iff the band
    row-slices are equal (up to 2^-64 fold collisions, which only ADD
    candidates that the exact-Jaccard verify then rejects). This
    replaces the per-document blake2b loop in ``band_keys``: any
    injective-enough map of (band, row slice) produces the same
    verified near-dup output, and this one is pure wrapping-uint64
    numpy. ``band_keys`` remains for single-document use."""
    assert bands * rows <= sig.shape[0]
    n_docs = sig.shape[1]
    rs = sig[: bands * rows].reshape(bands, rows, n_docs)
    salts = _splitmix64(
        (np.arange(bands, dtype=np.uint64) + np.uint64(1))
        * np.uint64(0x9E3779B97F4A7C15)
    )
    acc = np.broadcast_to(salts[:, None], (bands, n_docs)).copy()
    for r in range(rows):
        acc = _splitmix64(acc ^ rs[:, r, :])
    return acc


def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash over shingle hashes (unweighted)."""
    if hashes.size == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if votes[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# 256-entry byte popcount table (numpy < 2.0 has no bitwise_count)
_POPCOUNT8 = np.array(
    [bin(i).count("1") for i in range(256)], dtype=np.uint8
)


def popcount64(arr: np.ndarray) -> np.ndarray:
    """Per-element popcount of a uint64 array, vectorized (byte-table
    lookup; popcount is byte-order independent so the view is safe)."""
    if arr.size == 0:
        return np.empty(0, dtype=np.int64)
    b = np.ascontiguousarray(arr, dtype=np.uint64).view(np.uint8)
    return (
        _POPCOUNT8[b].reshape(arr.size, 8).sum(axis=1).astype(np.int64)
    )


def jaccard(a: Set, b: Set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def jaccard_arrays(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard of two sorted distinct uint64 arrays (exact; the int
    division a DuckDB oracle performs gives the bit-identical double)."""
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0
