"""Central physical-plan choice for broadcast<->partitioned twins.

Every operator family with two physical plans (a small-side broadcast
fast path and an at-scale partitioned/shuffle plan producing the
IDENTICAL result) routes its crossover decision through
:func:`choose_broadcast`, which adds two properties the per-site
row-count checks lacked:

* ``GRAFT_FORCE_PARTITIONED=1`` disables EVERY broadcast fast path in
  one shot, so a single ``scripts/check_oracle.py`` run gives
  gate-level coverage of all at-scale twins (not just their dedicated
  pytest pins). CI spelling::

      GRAFT_FORCE_PARTITIONED=1 python scripts/check_oracle.py

* The decision is memory-aware: callers pass the estimated bytes PER
  ROW of the would-be broadcast state, and the crossover compares
  ``n_rows * est_row_bytes`` against a byte budget
  (``GRAFT_BROADCAST_BYTES_LIMIT``, default 2 GiB — a small fraction
  of one worker's object store) IN ADDITION to the row-count limit.
  A fat-row corpus (e.g. 4096-dim float64 embeddings: 32 KiB/row
  means ~65k rows already exceed 2 GiB) flips to the partitioned plan
  where row count alone would have broadcast it.
"""

import os

# Default per-node budget for a single broadcast object: 2 GiB.
# Rationale: Ray's default object store is 30% of node RAM; on the
# smallest sensible worker (16 GiB) that is ~5 GiB, and the broadcast
# object must coexist with in-flight blocks. Override per deployment
# with GRAFT_BROADCAST_BYTES_LIMIT.
DEFAULT_BROADCAST_BYTES_LIMIT = 2 * 1024**3


def force_partitioned() -> bool:
    """True when every broadcast fast path must be disabled
    (``GRAFT_FORCE_PARTITIONED=1``)."""
    return os.environ.get("GRAFT_FORCE_PARTITIONED", "") not in ("", "0")


def broadcast_bytes_limit() -> int:
    v = os.environ.get("GRAFT_BROADCAST_BYTES_LIMIT", "")
    return int(v) if v else DEFAULT_BROADCAST_BYTES_LIMIT


def choose_broadcast(
    n_rows: int,
    row_limit: int,
    est_row_bytes: float = None,
    byte_limit: int = None,
) -> bool:
    """Should this operator take its broadcast fast path?

    ``n_rows``/``row_limit``: the legacy row-count crossover.
    ``est_row_bytes``: estimated serialized bytes per row of the
    broadcast state (signature width, edge record width, embedding
    dim x itemsize, mean blob width...). When given, the estimated
    total must also fit ``byte_limit`` (default
    :func:`broadcast_bytes_limit`).
    """
    if force_partitioned():
        return False
    if n_rows > row_limit:
        return False
    if est_row_bytes is not None:
        limit = byte_limit if byte_limit is not None else broadcast_bytes_limit()
        if n_rows * est_row_bytes > limit:
            return False
    return True
