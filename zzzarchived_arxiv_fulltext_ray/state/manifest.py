"""Resumable, manifest-checkpointed pipeline runs (SURVEY.md §4.2).

The unit of resumability is an input *shard* (one or more input Parquet
files). Each shard is processed with full cluster parallelism and
written to its own output directory atomically (write to ``*.tmp``,
rename), then a manifest JSON records lineage + metrics:

* lineage: shard id (stable hash of the input paths — independent of
  cluster size, so a 4N-node resume sees the same shards), input paths,
  input fingerprint (size+mtime per file)
* metrics: output rows, succeeded/failed counts, wall seconds
* integrity: an order-independent content hash (sum of per-row
  blake2b(url, text) digests mod 2^64) so a resumed run can be checked
  byte-equivalent to a clean one

``run_resumable`` skips shards whose manifest exists, whose input
fingerprint still matches AND whose config fingerprint (extractor
version + pipeline knobs) still matches — re-running after a crash (or
with new input files dropped in) processes exactly the missing work,
and bumping ``EXTRACTOR_VERSION`` (or any config in the fingerprint)
lazily re-extracts everything, mirroring the reference's
version-namespaced store (``fulltext/services/store/store.py:130-165``)
on top of its skip-if-output-exists resume
(``extractor/fulltext/fulltext.py:239-242``) and placeholder-based
work dedup (``fulltext/extract.py:89-107``).

Shards run sequentially (each saturates the cluster); at 10^12-doc
scale shard = a few thousand input files, so the sequential loop is
hundreds of iterations, not millions.
"""

import hashlib
import json
import shutil
import time
from pathlib import Path
from typing import Callable, Dict, Iterable, List, Optional, Sequence

import pyarrow as pa

from .. import EXTRACTOR_VERSION

MANIFEST_SUFFIX = ".manifest.json"
_HASH_MOD = 1 << 64


def default_config_fingerprint(**extra) -> Dict:
    """The config identity a shard output is valid FOR: extractor
    version plus any pipeline knobs the caller passes (dedup method,
    giant threshold, ...). Stored in the manifest; a mismatch on
    resume invalidates the shard."""
    fp = {"extractor_version": EXTRACTOR_VERSION}
    fp.update(extra)
    return fp


def shard_id_for(paths: Sequence[str]) -> str:
    digest = hashlib.sha256("\n".join(sorted(paths)).encode()).hexdigest()
    return digest[:12]


def input_fingerprint(paths: Sequence[str]) -> Dict[str, List[int]]:
    fp = {}
    for p in sorted(paths):
        st = Path(p).stat()
        fp[p] = [st.st_size, int(st.st_mtime)]
    return fp


def shard_input_files(
    paths: Iterable[str], files_per_shard: int = 1
) -> List[List[str]]:
    """Group input files into shards (stable order)."""
    ordered = sorted(paths)
    return [
        ordered[i : i + files_per_shard]
        for i in range(0, len(ordered), files_per_shard)
    ]


def content_hash_batch(batch: pa.Table, columns: Sequence[str]) -> int:
    """Order-independent partial content hash of a batch."""
    total = 0
    arrays = [batch[c].to_pylist() for c in columns]
    for values in zip(*arrays):
        h = hashlib.blake2b(digest_size=8)
        for v in values:
            h.update(repr(v).encode())
            h.update(b"\x1f")
        total = (total + int.from_bytes(h.digest(), "big")) % _HASH_MOD
    return total


def dataset_content_hash(ds, columns: Sequence[str]) -> int:
    """Order-independent content hash of a Dataset (distributed partial
    hashes, tiny final sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"h": pa.array([content_hash_batch(batch, columns)], pa.uint64())}
        )

    total = 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v in b["h"].to_pylist():
            total = (total + int(v)) % _HASH_MOD
    return total


def shard_digests(
    ds, hash_columns: Sequence[str], sketch_column: Optional[str] = None
):
    """One pass over a shard's output producing BOTH the
    order-independent content hash and (optionally) an HLL distinct
    sketch of ``sketch_column`` — the mergeable per-shard accounting
    state. Distributed partials; the driver folds one uint64 and one
    4 KiB register array per batch."""
    import base64

    from ..functions.sketches import HyperLogLog

    def partial(batch: pa.Table) -> pa.Table:
        cols = {
            "h": pa.array(
                [content_hash_batch(batch, hash_columns)], pa.uint64()
            )
        }
        if sketch_column is not None:
            hll = HyperLogLog()
            hll.add_values(
                str(v) for v in batch[sketch_column].to_pylist()
            )
            cols["hll"] = pa.array([hll.serialize()], pa.large_binary())
        return pa.Table.from_pydict(cols)

    total = 0
    merged = HyperLogLog() if sketch_column is not None else None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for v in b["h"].to_pylist():
            total = (total + int(v)) % _HASH_MOD
        if merged is not None:
            for blob in b["hll"].to_pylist():
                merged = merged.merge(HyperLogLog.deserialize(blob))
    sketch_b64 = (
        base64.b64encode(merged.serialize()).decode()
        if merged is not None
        else None
    )
    return total, sketch_b64


def run_distinct_estimate(out_dir: str) -> Optional[float]:
    """Corpus-level distinct estimate by merging the per-shard HLL
    sketches out of the manifests — no data re-scan. Returns None when
    no shard carries a sketch."""
    import base64

    from ..functions.sketches import HyperLogLog

    merged = None
    for m in run_status(out_dir):
        blob = (m.get("sketch") or {}).get("hll")
        if not blob:
            continue
        hll = HyperLogLog.deserialize(base64.b64decode(blob))
        merged = hll if merged is None else merged.merge(hll)
    return merged.estimate() if merged is not None else None


def manifest_path(out_dir: str, shard_id: str) -> Path:
    return Path(out_dir) / f"shard={shard_id}{MANIFEST_SUFFIX}"


def shard_out_dir(out_dir: str, shard_id: str) -> Path:
    return Path(out_dir) / f"shard={shard_id}"


def is_shard_done(
    out_dir: str,
    shard: Sequence[str],
    config_fingerprint: Optional[Dict] = None,
) -> bool:
    """Manifest present, input unchanged, output dir present, and (when
    given) produced under the same config fingerprint — a version bump
    re-extracts instead of serving stale text."""
    sid = shard_id_for(shard)
    mpath = manifest_path(out_dir, sid)
    if not mpath.exists() or not shard_out_dir(out_dir, sid).exists():
        return False
    try:
        manifest = json.loads(mpath.read_text())
    except json.JSONDecodeError:
        return False
    if manifest.get("input_fingerprint") != input_fingerprint(shard):
        return False
    if config_fingerprint is not None:
        return manifest.get("config_fingerprint") == config_fingerprint
    return True


def run_resumable(
    input_shards: Sequence[Sequence[str]],
    build: Callable,
    out_dir: str,
    hash_columns: Sequence[str] = ("url", "text"),
    read_fn: Optional[Callable] = None,
    config_fingerprint: Optional[Dict] = None,
    sketch_column: Optional[str] = "__first_hash_column__",
) -> Dict:
    """Process every not-yet-done shard: read -> build(ds) -> atomic
    write + manifest. Returns a run summary (shards done/skipped,
    rows, combined content hash).

    ``config_fingerprint`` defaults to the extractor version: resuming
    after a version bump reprocesses every shard.

    ``sketch_column`` (default: first hash column) adds a per-shard
    HLL distinct sketch to the manifest — mergeable corpus accounting
    (see :func:`run_distinct_estimate`); pass None to disable."""
    if sketch_column == "__first_hash_column__":
        sketch_column = hash_columns[0] if hash_columns else None
    import ray.data as rd

    read_fn = read_fn or (lambda paths: rd.read_parquet(list(paths)))
    if config_fingerprint is None:
        config_fingerprint = default_config_fingerprint()
    Path(out_dir).mkdir(parents=True, exist_ok=True)

    summary = {"processed": 0, "skipped": 0, "rows": 0, "failed_rows": 0}
    combined_hash = 0
    for shard in input_shards:
        sid = shard_id_for(shard)
        if is_shard_done(out_dir, shard, config_fingerprint):
            summary["skipped"] += 1
            manifest = json.loads(manifest_path(out_dir, sid).read_text())
            summary["rows"] += manifest["rows"]
            summary["failed_rows"] += manifest.get("failed_rows", 0)
            combined_hash = (combined_hash + manifest["content_hash"]) % _HASH_MOD
            continue

        started = time.time()
        ds = build(read_fn(shard))

        final_dir = shard_out_dir(out_dir, sid)
        tmp_dir = final_dir.with_suffix(".tmp")
        for stale in (tmp_dir, final_dir):
            if stale.exists():
                shutil.rmtree(stale)
        ds.write_parquet(str(tmp_dir))
        tmp_dir.rename(final_dir)

        out_ds = rd.read_parquet(str(final_dir))
        rows = out_ds.count()
        chash, sketch_b64 = shard_digests(
            rd.read_parquet(str(final_dir)), hash_columns, sketch_column
        )
        n_failed = 0
        if "status" in [f.name for f in out_ds.schema().base_schema]:
            import pyarrow.compute as pc

            def fails(batch: pa.Table) -> pa.Table:
                n = pc.sum(
                    pc.equal(batch["status"], "failed").cast(pa.int64())
                ).as_py() or 0
                return pa.Table.from_pydict({"n": pa.array([n], pa.int64())})

            n_failed = sum(
                v
                for b in rd.read_parquet(str(final_dir))
                .map_batches(fails, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
                for v in b["n"].to_pylist()
            )

        manifest = {
            "shard_id": sid,
            "input_paths": sorted(shard),
            "input_fingerprint": input_fingerprint(shard),
            "config_fingerprint": config_fingerprint,
            "rows": rows,
            "failed_rows": n_failed,
            "content_hash": chash,
            "hash_columns": list(hash_columns),
            "sketch": (
                {"column": sketch_column, "hll": sketch_b64}
                if sketch_b64
                else None
            ),
            "started": started,
            "ended": time.time(),
            "wall_sec": round(time.time() - started, 3),
        }
        mtmp = manifest_path(out_dir, sid).with_suffix(".tmp")
        mtmp.write_text(json.dumps(manifest, indent=1))
        mtmp.rename(manifest_path(out_dir, sid))

        summary["processed"] += 1
        summary["rows"] += rows
        summary["failed_rows"] += n_failed
        combined_hash = (combined_hash + chash) % _HASH_MOD

    summary["content_hash"] = combined_hash
    return summary


def global_latest_crawl_pass(
    out_dir: str, hash_columns: Sequence[str] = ("url", "text")
) -> Dict:
    """Second-pass winner resolution ACROSS shard outputs (the global
    analogue of the reference's placeholder dedup,
    ``fulltext/extract.py:89-107``).

    ``run_resumable`` dedups within each shard; re-crawls of one url
    split across shards survive it. This pass projects (url, warc_ts)
    over every finished shard's output, resolves global winners with
    the same distributed aggregate the in-pipeline dedup uses
    (O(cross-shard-dup) driver state), then rewrites ONLY the shards
    that hold losing rows — atomically, with their manifests updated
    (rows/content_hash recomputed, ``global_dedup`` stamped) so a
    subsequent resume still validates.

    Idempotent: a second invocation finds no losers and rewrites
    nothing.

    Manifest sketches are left as written: removing a LOSING crawl
    never removes a distinct url from the corpus (its winner survives
    in another shard), so the merged distinct-url estimate
    (:func:`run_distinct_estimate`) stays correct.
    """
    import ray.data as rd

    from ..stages.dedup import dup_winner_table, winner_filter_batch

    manifests = {m["shard_id"]: m for m in run_status(out_dir)}
    summary = {"shards_rewritten": 0, "rows_removed": 0}
    if not manifests:
        return summary

    shard_dirs = {
        sid: shard_out_dir(out_dir, sid)
        for sid in manifests
        if shard_out_dir(out_dir, sid).exists()
    }
    # read_parquet accepts one dir or a list of FILES, not a dir list
    out_files = [
        str(f)
        for d in shard_dirs.values()
        for f in sorted(Path(d).glob("*.parquet"))
    ]
    all_out = rd.read_parquet(out_files, columns=["url", "warc_ts"])
    wt = dup_winner_table(all_out)
    if wt.num_rows == 0:
        return summary

    import ray

    winners_ref = ray.put(
        (wt["url"].combine_chunks(), wt["max_ts"].combine_chunks())
    )

    def keep_winners(batch: pa.Table) -> pa.Table:
        return winner_filter_batch(batch, ray.get(winners_ref))

    for sid, sdir in shard_dirs.items():
        before = manifests[sid]["rows"]
        kept = rd.read_parquet(str(sdir)).map_batches(
            keep_winners, batch_format="pyarrow"
        )
        tmp_dir = sdir.parent / (sdir.name + ".gdtmp")
        if tmp_dir.exists():
            shutil.rmtree(tmp_dir)
        kept.write_parquet(str(tmp_dir))
        rows = rd.read_parquet(str(tmp_dir)).count()
        if rows == before:
            shutil.rmtree(tmp_dir)  # no losers in this shard
            continue
        # swap with old-data preserved at every intermediate state: a
        # crash mid-swap leaves either the old dir (recoverable rename
        # retry) or the new dir in place — never a window with the
        # shard's data directory missing while its manifest survives
        old_dir = sdir.parent / (sdir.name + ".gdold")
        if old_dir.exists():
            shutil.rmtree(old_dir)
        sdir.rename(old_dir)
        tmp_dir.rename(sdir)
        shutil.rmtree(old_dir)

        manifest = manifests[sid]
        manifest["rows"] = rows
        manifest["content_hash"] = dataset_content_hash(
            rd.read_parquet(str(sdir)), manifest.get("hash_columns", hash_columns)
        )
        manifest["global_dedup"] = True
        mtmp = manifest_path(out_dir, sid).with_suffix(".tmp")
        mtmp.write_text(json.dumps(manifest, indent=1))
        mtmp.rename(manifest_path(out_dir, sid))

        summary["shards_rewritten"] += 1
        summary["rows_removed"] += before - rows

    return summary


def global_neardup_guard(
    out_dir: str,
    threshold: float = 0.5,
    k: int = 3,
    max_bucket: int = 256,
    on_drop: str = "error",
) -> Dict:
    """Incremental near-CONTENT dedup of newly ingested shards against
    the already-guarded base corpus (the continuous-crawl analogue of
    the reference's exists-already guard,
    ``fulltext/services/store/store.py``, generalized from exact url
    match to shingle-Jaccard near-match).

    Shards whose manifest carries ``neardup_guarded: true`` form the
    immutable BASE; every other finished shard is INCOMING. Incoming
    docs whose extracted text has Jaccard >= ``threshold`` against any
    base doc are removed (their shards rewritten atomically, manifests
    re-hashed and stamped). Same-url pairs are ignored — recrawl
    winner resolution is :func:`global_latest_crawl_pass`'s job, and
    dropping an incoming recrawl because its OWN older crawl is in the
    base would invert keep-latest semantics.

    The first invocation (no guarded base yet) only stamps — it
    establishes the base without self-comparison; near-dups WITHIN one
    ingest batch are the corpus-wide ``neardup_pairs`` job's domain.

    Stateless + idempotent by construction: a crashed guard pass
    leaves un-stamped shards that the next invocation re-guards
    against the same base; a repeat invocation finds no unguarded
    shards and does nothing. Driver state is O(flagged incoming docs)
    — bounded by the incoming batch's near-dup rate, the same bound
    as the url winner table.

    Physical plan: :func:`..stages.neardup.cross_neardup_counts` —
    exact |A∩B| from shared-shingle bucket co-occurrence counts,
    candidates restricted to (incoming, base) pairs, so the exchange
    scales with the incoming batch, never the base-pair count.
    """
    import numpy as np
    import ray
    import ray.data as rd

    from ..functions.hashing import hash64_column
    from ..stages.neardup import cross_neardup_counts

    manifests = {m["shard_id"]: m for m in run_status(out_dir)}
    base_sids = sorted(
        sid for sid, m in manifests.items() if m.get("neardup_guarded")
    )
    new_sids = sorted(
        sid
        for sid in manifests
        if sid not in set(base_sids) and shard_out_dir(out_dir, sid).exists()
    )
    summary = {
        "shards_guarded": len(new_sids),
        "shards_rewritten": 0,
        "rows_removed": 0,
    }

    def stamp(sid: str, manifest: Dict) -> None:
        manifest["neardup_guarded"] = True
        mtmp = manifest_path(out_dir, sid).with_suffix(".tmp")
        mtmp.write_text(json.dumps(manifest, indent=1))
        mtmp.rename(manifest_path(out_dir, sid))

    if not new_sids:
        return summary

    def docs_of(sids: Sequence[str]):
        files = [
            str(f)
            for sid in sids
            for f in sorted(shard_out_dir(out_dir, sid).glob("*.parquet"))
        ]

        def to_docs(batch: pa.Table) -> pa.Table:
            # >>1 keeps ids NONNEGATIVE (cross_neardup_counts reserves
            # negative ids for hot-bucket marker rows); 63 bits of a
            # 64-bit hash is still collision-safe at corpus scale
            ids = (hash64_column(batch["url"]) >> np.uint64(1)).astype(
                np.int64
            )
            text = batch["text"]
            if text.null_count:
                import pyarrow.compute as pc

                text = pc.fill_null(text, "")
            return pa.Table.from_pydict(
                {"doc_id": pa.array(ids, pa.int64()), "text": text}
            )

        return rd.read_parquet(files, columns=["url", "text"]).map_batches(
            to_docs, batch_format="pyarrow"
        )

    flagged = np.empty(0, np.int64)
    if base_sids:
        pairs = cross_neardup_counts(
            docs_of(new_sids),
            docs_of(base_sids),
            threshold=threshold,
            k=k,
            max_bucket=max_bucket,
            on_drop=on_drop,
        )
        rows = pairs.take_all() if pairs.count() else []
        flagged = np.unique(
            np.array(
                [
                    r["left_id"]
                    for r in rows
                    if r["left_id"] != r["right_id"]  # same url: not ours
                ],
                dtype=np.int64,
            )
        )

    flagged_ref = ray.put(flagged) if flagged.size else None

    def keep_unflagged(batch: pa.Table) -> pa.Table:
        bad = ray.get(flagged_ref)
        ids = (hash64_column(batch["url"]) >> np.uint64(1)).astype(np.int64)
        return batch.filter(pa.array(~np.isin(ids, bad)))

    for sid in new_sids:
        manifest = manifests[sid]
        sdir = shard_out_dir(out_dir, sid)
        if flagged.size:
            before = manifest["rows"]
            kept = rd.read_parquet(str(sdir)).map_batches(
                keep_unflagged, batch_format="pyarrow"
            )
            tmp_dir = sdir.parent / (sdir.name + ".ngtmp")
            if tmp_dir.exists():
                shutil.rmtree(tmp_dir)
            kept.write_parquet(str(tmp_dir))
            rows = rd.read_parquet(str(tmp_dir)).count()
            if rows == before:
                shutil.rmtree(tmp_dir)
            else:
                # rename-aside swap (the global-dedup pattern): no
                # crash point leaves a manifest without its data dir
                old_dir = sdir.parent / (sdir.name + ".ngold")
                if old_dir.exists():
                    shutil.rmtree(old_dir)
                sdir.rename(old_dir)
                tmp_dir.rename(sdir)
                shutil.rmtree(old_dir)
                manifest["rows"] = rows
                manifest["content_hash"] = dataset_content_hash(
                    rd.read_parquet(str(sdir)),
                    manifest.get("hash_columns", ("url", "text")),
                )
                summary["shards_rewritten"] += 1
                summary["rows_removed"] += before - rows
        stamp(sid, manifest)

    return summary


def run_status(out_dir: str) -> List[Dict]:
    """All shard manifests under ``out_dir`` (lineage + metrics view)."""
    out = []
    root = Path(out_dir)
    if not root.exists():
        return out
    for mpath in sorted(root.glob(f"*{MANIFEST_SUFFIX}")):
        try:
            out.append(json.loads(mpath.read_text()))
        except json.JSONDecodeError:
            continue
    return out


def watch_resumable(
    input_glob: str,
    build: Callable,
    out_dir: str,
    files_per_shard: int = 16,
    poll_sec: float = 30.0,
    settle_sec: Optional[float] = None,
    max_polls: Optional[int] = None,
    config_fingerprint: Optional[Dict] = None,
    hash_columns: Sequence[str] = ("url", "text"),
    read_fn: Optional[Callable] = None,
    on_poll: Optional[Callable] = None,
) -> Dict:
    """Continuous-ingest mode: poll ``input_glob`` and process files as
    they arrive — the batch analogue of the reference's stream consumer
    (fulltext/agent/consumer.py:115-145), built entirely on the
    manifest anti-join.

    Each poll is stateless: files already assigned to a shard are read
    off the existing manifests' ``input_fingerprint`` keys; unassigned
    files whose mtime has settled for ``settle_sec`` (default:
    ``poll_sec`` — a file still being written is left for the next
    poll) are grouped into NEW shards, so earlier shard groupings never
    shift when files arrive (the alternative — re-chunking the full
    sorted listing — would orphan every downstream shard id). Known
    shards are passed through :func:`run_resumable` too, which skips
    them unless their inputs changed on disk (modified-input
    re-extraction keeps working mid-watch). A no-op poll costs one
    glob + one manifest-directory scan — no Ray work.

    Runs forever unless ``max_polls`` is given (tests / bounded runs).
    Returns cumulative totals; ``rows`` is the current corpus total.
    """
    import glob as _glob

    settle = poll_sec if settle_sec is None else settle_sec
    totals = {"polls": 0, "processed": 0, "skipped": 0, "rows": 0,
              "failed_rows": 0}
    while True:
        totals["polls"] += 1
        known: List[List[str]] = []
        seen: set = set()
        for m in run_status(out_dir):
            paths = sorted((m.get("input_fingerprint") or {}).keys())
            if paths:
                known.append(paths)
                seen.update(paths)
        now = time.time()
        fresh = []
        for f in sorted(_glob.glob(input_glob)):
            if f in seen:
                continue
            try:
                st = Path(f).stat()
            except FileNotFoundError:
                continue
            if now - st.st_mtime < settle:
                continue
            fresh.append(f)
        shards = known + shard_input_files(fresh, files_per_shard)
        if shards:
            s = run_resumable(
                shards, build, out_dir,
                hash_columns=hash_columns,
                read_fn=read_fn,
                config_fingerprint=config_fingerprint,
            )
            totals["processed"] += s["processed"]
            totals["skipped"] += s["skipped"]
            totals["rows"] = s["rows"]
            totals["failed_rows"] = s["failed_rows"]
        if on_poll is not None:
            on_poll(dict(totals))
        if max_polls is not None and totals["polls"] >= max_polls:
            return totals
        time.sleep(poll_sec)


def compact_shards(
    out_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> Dict:
    """Post-pass output compaction: rewrite every finished shard whose
    output holds >= ``min_files`` parquet files into
    ceil(total_bytes / target_bytes) files — the small-files problem
    at 100 TB (a resumable run with many shards x many write tasks
    otherwise leaves thousands of KB-scale files that tank every
    downstream scan).

    Safety contract, per shard: the rewrite goes to a ``.tmp`` dir,
    its ORDER-INDEPENDENT content hash (:func:`shard_digests`, same
    columns the manifest recorded) must equal the manifest's hash
    BEFORE the atomic rename-aside swap (the global-dedup pattern);
    the manifest keeps its content_hash/row count (content is
    byte-identical per hash) and gains a ``compacted`` block.
    Shards already at one file (or below ``min_files``) are skipped.
    Returns {shards_compacted, shards_skipped, files_before,
    files_after}."""
    import ray.data as rd

    out = Path(out_dir)
    summary = {
        "shards_compacted": 0,
        "shards_skipped": 0,
        "files_before": 0,
        "files_after": 0,
    }
    for mpath in sorted(out.glob(f"shard=*{MANIFEST_SUFFIX}")):
        manifest = json.loads(mpath.read_text())
        sid = manifest["shard_id"]
        sdir = shard_out_dir(out_dir, sid)
        if not sdir.exists():
            continue
        files = sorted(p for p in sdir.glob("*.parquet"))
        summary["files_before"] += len(files)
        total = sum(p.stat().st_size for p in files)
        n_target = max(1, -(-total // target_bytes))
        if len(files) < min_files or n_target >= len(files):
            summary["shards_skipped"] += 1
            summary["files_after"] += len(files)
            continue

        tmp_dir = sdir.with_suffix(".compact_tmp")
        old_dir = sdir.with_suffix(".pre_compact")
        for stale in (tmp_dir, old_dir):
            if stale.exists():
                shutil.rmtree(stale)
        (
            rd.read_parquet(str(sdir))
            .repartition(int(n_target))
            .write_parquet(str(tmp_dir))
        )
        chash, _ = shard_digests(
            rd.read_parquet(str(tmp_dir)),
            manifest["hash_columns"],
            None,
        )
        if chash != manifest["content_hash"]:
            shutil.rmtree(tmp_dir)
            raise RuntimeError(
                f"compact_shards: content hash mismatch on shard {sid} "
                "(rewrite aborted, original output untouched)"
            )
        # rename-aside swap: original survives any crash point
        sdir.rename(old_dir)
        tmp_dir.rename(sdir)
        shutil.rmtree(old_dir)

        n_after = len(list(sdir.glob("*.parquet")))
        manifest["compacted"] = {
            "files_before": len(files),
            "files_after": n_after,
            "target_bytes": target_bytes,
            "at": time.time(),
        }
        mtmp = mpath.with_suffix(".tmp")
        mtmp.write_text(json.dumps(manifest, indent=1))
        mtmp.rename(mpath)
        summary["shards_compacted"] += 1
        summary["files_after"] += n_after
    return summary
