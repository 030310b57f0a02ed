"""Mergeable sketches: HyperLogLog distinct counting and a fixed-depth
mergeable quantile histogram (pure, deterministic).

The scale pattern (ray_guide "Aggregation at scale"): each batch emits
ONE serialized sketch; a tiny second stage merges them. No all-to-all
shuffle, bounded memory, exactly mergeable.
"""

import math
from typing import Iterable, Sequence

import numpy as np

from .shingles import _splitmix64

# -- HyperLogLog -------------------------------------------------------------


class HyperLogLog:
    """Classic HLL (Flajolet et al.): ``2**p`` registers, stable
    splitmix64 hashing, standard bias correction. Relative error is
    ~1.04/sqrt(2**p) (p=12 -> ~1.6%)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray):
        if hashes.size == 0:
            return
        mixed = _splitmix64(hashes.astype(np.uint64))
        idx = (mixed >> np.uint64(64 - self.p)).astype(np.int64)
        remaining = mixed << np.uint64(self.p)
        # rank = position of the first set bit in the remaining 64-p
        # bits, +1; vectorized as a loop over BIT POSITIONS (fixed 52
        # iterations of whole-array ops, not per-value Python)
        ranks = np.full(len(mixed), 64 - self.p + 1, dtype=np.uint8)
        found = np.zeros(len(mixed), dtype=bool)
        for bit in range(64 - self.p):
            mask = ~found & (
                (remaining >> np.uint64(63 - bit)) & np.uint64(1)
            ).astype(bool)
            ranks[mask] = bit + 1
            found |= mask
        np.maximum.at(self.registers, idx, ranks)

    def add_values(self, values: Iterable[str]):
        from .shingles import stable_hash64

        # md5-derived stable_hash64 (== DuckDB md5_number_upper) so a
        # SQL oracle can rebuild the registers exactly
        hashes = np.array(
            [stable_hash64(str(v)) for v in values], dtype=np.uint64
        )
        self.add_hashes(hashes)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        # Exact-integer harmonic denominator: sum(2^-r) == S / 2^K
        # with K = max rank = 64-p+1 and S = sum(2^(K-r)) an exact
        # Python int — the estimate is a deterministic function of the
        # registers, independent of float summation ORDER (numpy's
        # pairwise sum is not), so a SQL oracle can replay it
        # bit-for-bit (one HUGEINT sum + the same scalar float ops).
        K = 64 - self.p + 1
        counts = np.bincount(self.registers, minlength=K + 1)
        S = sum(int(c) << (K - r) for r, c in enumerate(counts) if c)
        est = alpha * m * m * float(1 << K) / S
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * math.log(m / zeros)
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "HyperLogLog":
        out = cls(blob[0])
        out.registers = np.frombuffer(blob[1:], dtype=np.uint8).copy()
        return out


class KMVSketch:
    """k-minimum-values distinct-count sketch (Bar-Yossef et al.):
    keep the ``k`` smallest distinct 64-bit hashes seen; merge = union
    + re-truncate. Estimate = ``(k - 1) * 2^64 / kth_smallest`` once
    full (exact count while under ``k`` values) — one float expression
    of the exact integer ``kth``, so it is order-independent and a SQL
    oracle replays it bit-for-bit from ``md5_number_upper`` hashes.
    Relative error ~1/sqrt(k). State is a bounded sorted uint64 array
    (``8k`` bytes), mergeable in any tree shape."""

    def __init__(self, k: int = 256):
        self.k = k
        self.values = np.empty(0, dtype=np.uint64)  # sorted, distinct

    def add_hashes(self, hashes: np.ndarray):
        if hashes.size == 0:
            return
        merged = np.union1d(self.values, hashes.astype(np.uint64))
        self.values = merged[: self.k]

    def add_values(self, values: Iterable[str]):
        from .shingles import stable_hash64

        hashes = np.array(
            [stable_hash64(str(v)) for v in values], dtype=np.uint64
        )
        self.add_hashes(hashes)

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        assert self.k == other.k
        out = KMVSketch(self.k)
        out.values = np.union1d(self.values, other.values)[: self.k]
        return out

    def kth(self) -> int:
        """The k-th smallest hash (0 while the sketch is not full)."""
        return (
            int(self.values[self.k - 1])
            if self.values.size >= self.k
            else 0
        )

    def estimate(self) -> float:
        if self.values.size < self.k:
            return float(self.values.size)  # exact under k distinct
        # float of exact ints: (k-1) * 2^64 / kth
        return float(self.k - 1) * 18446744073709551616.0 / float(
            self.kth()
        )

    def serialize(self) -> bytes:
        return bytes([0]) + np.uint32(self.k).tobytes() + (
            self.values.tobytes()
        )

    @classmethod
    def deserialize(cls, blob: bytes) -> "KMVSketch":
        k = int(np.frombuffer(blob[1:5], dtype=np.uint32)[0])
        out = cls(k)
        out.values = np.frombuffer(blob[5:], dtype=np.uint64).copy()
        return out


# -- mergeable quantile histogram --------------------------------------------


class QuantileHistogram:
    """Fixed-bin log-scale histogram over positive values: mergeable by
    adding counts; quantile answers are exact to within one bin
    (bins per decade = ``resolution`` -> relative error ~10^(1/res)-1).
    """

    def __init__(self, resolution: int = 64, max_decades: int = 12):
        self.resolution = resolution
        self.n_bins = resolution * max_decades + 2
        self.counts = np.zeros(self.n_bins, dtype=np.int64)

    @staticmethod
    def bin_boundaries(resolution: int, n_bins: int) -> np.ndarray:
        """Integer-exact bin lower bounds: ``B[k] = ceil(10^(k/res))``
        computed with pure-integer arithmetic (smallest v with
        ``v**res >= 10**k``) — no transcendental call whose last-ulp
        rounding could differ between numpy and a SQL engine. Binning
        is defined BY these boundaries (bin = #boundaries <= v), which
        equals ``floor(log10(v)*res)+1`` exactly for integer-valued
        inputs; for non-integers the boundary is rounded up to the
        next integer (documented contract — one-bin accuracy holds
        either way). All boundaries < 2^53 are exact as float64."""
        bounds = []
        for k in range(n_bins - 1):
            target = 10**k
            v = int(round(10 ** (k / resolution)))  # float seed
            while v**resolution >= target:
                v -= 1
            while (v + 1) ** resolution < target:
                v += 1
            bounds.append(v + 1)
        return np.array(bounds, dtype=np.float64)

    _bounds_cache: dict = {}

    def _bin_of(self, values: np.ndarray) -> np.ndarray:
        key = (self.resolution, self.n_bins)
        bounds = self._bounds_cache.get(key)
        if bounds is None:
            bounds = self.bin_boundaries(self.resolution, self.n_bins)
            self._bounds_cache[key] = bounds
        v = np.asarray(values, dtype=np.float64)
        out = np.zeros(len(v), dtype=np.int64)
        pos = v > 0
        out[pos] = np.clip(
            np.searchsorted(bounds, v[pos], side="right"), 1, self.n_bins - 1
        )
        return out

    def add(self, values: Sequence[float]):
        bins = self._bin_of(np.asarray(values))
        np.add.at(self.counts, bins, 1)

    def merge(self, other: "QuantileHistogram") -> "QuantileHistogram":
        assert self.n_bins == other.n_bins
        out = QuantileHistogram(self.resolution, 1)
        out.n_bins = self.n_bins
        out.counts = self.counts + other.counts
        return out

    def quantile(self, q: float) -> float:
        total = int(self.counts.sum())
        if total == 0:
            return float("nan")
        target = q * total
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, target, side="left"))
        if b == 0:
            return 0.0
        return float(10 ** ((b - 1) / self.resolution))

    def serialize(self) -> bytes:
        head = np.array([self.resolution, self.n_bins], dtype=np.int64)
        return head.tobytes() + self.counts.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileHistogram":
        head = np.frombuffer(blob[:16], dtype=np.int64)
        out = cls(int(head[0]), 1)
        out.n_bins = int(head[1])
        out.counts = np.frombuffer(blob[16:], dtype=np.int64).copy()
        return out


# -- Count-Min sketch --------------------------------------------------------


class CountMinSketch:
    """Mergeable Count-Min sketch (Cormode & Muthukrishnan): ``depth``
    rows of ``width`` counters, each row a distinct seeded splitmix64
    hash. Point estimates overcount only (min over rows); error is
    ~ 2N/width with prob 1 - 2^-depth. Exactly mergeable by addition —
    one sketch per batch, tiny final merge (heavy-hitter counting at
    corpus scale without a token groupby shuffle)."""

    def __init__(self, width: int = 1 << 14, depth: int = 4,
                 seed: int = 8675309):
        self.width = width
        self.depth = depth
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(
            0, np.iinfo(np.uint64).max, size=depth, dtype=np.uint64
        )
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _rows_cols(self, hashes: np.ndarray) -> np.ndarray:
        # (depth, n) column indices
        return (
            _splitmix64(hashes[None, :] ^ self.seeds[:, None])
            % np.uint64(self.width)
        ).astype(np.int64)

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray):
        if hashes.size == 0:
            return
        cols = self._rows_cols(hashes)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], counts)

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=np.int64)
        cols = self._rows_cols(hashes)
        ests = np.stack(
            [self.table[d][cols[d]] for d in range(self.depth)]
        )
        return ests.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.width, self.depth) == (other.width, other.depth)
        self.table += other.table
        return self

    def serialize(self) -> bytes:
        return self.table.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes, width: int = 1 << 14,
                    depth: int = 4, seed: int = 8675309):
        cms = cls(width=width, depth=depth, seed=seed)
        cms.table = (
            np.frombuffer(blob, dtype="<i8")
            .reshape(depth, width)
            .astype(np.int64)
        )
        return cms


# -- Bloom filter -------------------------------------------------------------


class BloomFilter:
    """Mergeable Bloom filter over 64-bit key hashes: ``n_bits`` bits
    (power of two), ``k`` probes via double hashing
    (h_i = h1 + i*h2, h2 forced odd). Same contract as every sketch
    here: deterministic, one sketch per batch, OR-mergeable.

    Semantics for exists-already guards: NO false negatives — every
    inserted key always probes positive, so a seen document is never
    re-processed; false positives (rate ~(1-e^{-kn/m})^k) skip a NEW
    document. That trade is the point: 2**27 bits = 16 MiB covers
    ~10^7 urls at k=4 under 1% FP where the exact manifest anti-join
    would hold the full url set."""

    def __init__(self, n_bits: int = 1 << 27, k: int = 4):
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits >> 3, dtype=np.uint8)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        steps = np.arange(self.k, dtype=np.uint64)
        return (
            (h1[:, None] + steps[None, :] * h2[:, None])
            & np.uint64(self.n_bits - 1)
        ).ravel()

    def add_hashes(self, hashes: np.ndarray):
        if hashes.size == 0:
            return
        pos = self._positions(hashes)
        np.bitwise_or.at(
            self.bits,
            (pos >> np.uint64(3)).astype(np.int64),
            (np.uint64(1) << (pos & np.uint64(7))).astype(np.uint8),
        )

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashes)
        hit = (
            self.bits[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)
        ) & 1
        return hit.reshape(-1, self.k).all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert (self.n_bits, self.k) == (other.n_bits, other.k)
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())

    def serialize(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def deserialize(
        cls, blob: bytes, n_bits: int = 1 << 27, k: int = 4
    ) -> "BloomFilter":
        bf = cls(n_bits, k)
        bf.bits = np.frombuffer(blob, dtype=np.uint8).copy()
        return bf


# -- AMS (tug-of-war) F2 sketch ----------------------------------------------


class AMSSketch:
    """Mergeable AMS "tug-of-war" sketch (Alon-Matias-Szegedy) for the
    second frequency moment F2 = sum over keys of count^2, in the
    textbook MEDIAN-OF-MEANS construction: ``depth`` independent
    groups of ``width`` counters Z_j = sum_t sign_j(t) * count(t),
    sign_j(t) = +-1 from bit 0 of splitmix64(hash(t) ^ seed_j).
    E[Z^2] = F2; each group's statistic is the EXACT integer
    sum_w Z^2 (variance down by 1/width), the estimate the median
    group sum (depth odd -> one exact integer) divided by width in
    ONE final float op — the same order-independent exact-arithmetic
    discipline as every sketch here, which is what lets a SQL oracle
    replay the estimate bit-for-bit from md5-derived hashes. Exactly
    mergeable by adding the Z vectors, so per-batch partials reduce
    with a (depth*width)*8-byte exchange — F2 at corpus scale without
    a key groupby shuffle."""

    def __init__(self, depth: int = 9, width: int = 16,
                 seed: int = 424242):
        if depth % 2 == 0:
            raise ValueError("depth must be odd (exact integer median)")
        self.depth = depth
        self.width = width
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(
            0, np.iinfo(np.uint64).max, size=depth * width,
            dtype=np.uint64,
        )
        self.z = np.zeros(depth * width, dtype=np.int64)

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray):
        """Add ``counts[i]`` occurrences of the key with 64-bit hash
        ``hashes[i]``. The sign is a pure function of the key hash, so
        the same key may arrive in any batch split (additivity)."""
        if hashes.size == 0:
            return
        bits = (
            _splitmix64(hashes[None, :] ^ self.seeds[:, None])
            & np.uint64(1)
        ).astype(np.int64)
        signs = bits * 2 - 1
        self.z += (signs * counts[None, :].astype(np.int64)).sum(axis=1)

    def merge(self, other: "AMSSketch") -> "AMSSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        self.z += other.z
        return self

    def estimate_num(self) -> int:
        """Exact integer numerator: median over groups of the group's
        sum of squared counters (the estimate times ``width``)."""
        sums = sorted(
            sum(int(v) * int(v) for v in grp)
            for grp in self.z.reshape(self.depth, self.width)
        )
        return sums[self.depth // 2]

    def estimate(self) -> float:
        return self.estimate_num() / self.width

    def serialize(self) -> bytes:
        return self.z.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, blob: bytes, depth: int = 9, width: int = 16,
                    seed: int = 424242):
        s = cls(depth=depth, width=width, seed=seed)
        s.z = np.frombuffer(blob, dtype="<i8").astype(np.int64)
        return s
