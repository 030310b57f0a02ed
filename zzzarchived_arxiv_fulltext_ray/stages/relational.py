"""Relational operators: partitioned hash join, broadcast anti-join.

The reference has no relational joins (SURVEY.md §2.5) — these exist
because a table-shaped corpus needs them, and they demonstrate the two
physical join strategies the engine standardizes on:

* **both sides large** → explicit bucketed hash join: add
  ``bucket = stable_hash(key) % B`` to both sides, tag the side,
  union, ``groupby(bucket)``, and merge the two sides inside each
  group. One all-to-all exchange, no driver state; salt hot keys by
  raising B. (Recent Ray releases ship ``Dataset.join`` — this is the
  portable spelling that also documents the partitioning contract.)
* **one side small** → broadcast semi/anti join: ``ray.put`` the key
  set once, filter inside ``map_batches``.
"""

from typing import List

import numpy as np
import pyarrow as pa


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    # splitmix-style mix so sequential int keys spread across buckets
    z = keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(31)
    return (z % np.uint64(num_buckets)).astype(np.int64)


def partitioned_hash_join(
    left_ds,
    right_ds,
    key: str,
    num_buckets: int = 64,
    how: str = "inner",
):
    """Join two large Datasets on an int64 ``key`` without broadcast.

    Column names (other than ``key``) must be disjoint. Returns the
    joined Dataset; the exchange is a single groupby shuffle on the
    bucket column.
    """
    def _arrow_fields(schema_obj):
        # pandas-backed Datasets report numpy dtypes / `object` in
        # .types — normalize everything to Arrow types
        fields = []
        for name, typ in zip(schema_obj.names, schema_obj.types):
            if not isinstance(typ, pa.DataType):
                typ = (
                    pa.string()
                    if typ is object or typ == np.dtype("O")
                    else pa.from_numpy_dtype(np.dtype(typ))
                )
            fields.append((name, typ))
        return fields

    left_fields = _arrow_fields(left_ds.schema())
    right_fields = _arrow_fields(right_ds.schema())
    left_cols = [n for n, _ in left_fields]
    right_cols = [n for n, _ in right_fields]
    overlap = (set(left_cols) & set(right_cols)) - {key}
    if overlap:
        raise ValueError(f"overlapping non-key columns: {overlap}")

    # union needs one schema: each side carries null columns for the
    # other side's fields (cheap — null arrays are bitmap-only)
    all_fields = left_fields + [
        (n, t) for n, t in right_fields if n not in left_cols
    ]

    def tag(side: str, own_cols: List[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = []
            for name, typ in all_fields:
                if name in own_cols:
                    arrays.append(batch[name])
                else:
                    arrays.append(pa.nulls(n, type=typ))
            keys = batch[key].to_numpy(zero_copy_only=False)
            arrays.append(pa.array(_bucket_of(keys, num_buckets)))
            arrays.append(pa.array([side] * n, pa.string()))
            return pa.Table.from_arrays(
                arrays,
                names=[n for n, _ in all_fields] + ["__bucket", "__side"],
            )

        return fn

    tagged = left_ds.map_batches(
        tag("l", left_cols), batch_format="pyarrow"
    ).union(right_ds.map_batches(tag("r", right_cols), batch_format="pyarrow"))

    import pandas as pd

    # null-padding widens int columns to float in pandas; restore the
    # declared integer types on the merged output
    int_cols = {
        n: str(t) for n, t in all_fields if pa.types.is_integer(t)
    }

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        lf = group.loc[group["__side"] == "l", left_cols]
        rf = group.loc[group["__side"] == "r", right_cols]
        merged = lf.merge(rf, on=key, how=how)
        for col, typ in int_cols.items():
            if col in merged.columns and not merged[col].isna().any():
                merged[col] = merged[col].astype(typ)
        return merged

    return tagged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas"
    )


def broadcast_anti_join(ds, key: str, blocked_keys):
    """Keep rows whose ``key`` is NOT in ``blocked_keys`` (the
    broadcast anti-join / blocklist-filter pattern)."""
    import ray

    ref = ray.put(frozenset(blocked_keys))

    def keep(batch: pa.Table) -> pa.Table:
        blocked = ray.get(ref)
        mask = pa.array(
            [v not in blocked for v in batch[key].to_pylist()], pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")
