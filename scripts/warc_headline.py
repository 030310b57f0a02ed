"""WARC-native headline witness (VERDICT r04 item 4).

The reference's real ingest is crawl files (SURVEY S1); the engine's
scale path for those is the chunked streaming WARC datasource
(``sources/warc_source.py``). This script runs the FULL headline
extraction pipeline end-to-end from .warc.gz shards — not the Parquet
synthesizer — at bench scale and proves:

* wall/throughput of the WARC-sourced headline (vs the Parquet-sourced
  headline measured in the same session, same knobs), and
* byte-identical output between the two sources (same rows, same
  extracted text/status/psv, hash-compared after a url sort).

The WARC shards are synthesized ONCE (untimed, cached under
GRAFT_BENCH_DIR) from the same pages table bench.py uses, via
``write_pages_as_warc`` (gzip members — the Common Crawl layout).

Usage: python scripts/warc_headline.py          # sf0.1 by default
       GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/warc_headline.py
Prints ONE JSON line.
"""

import hashlib
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402  (repo-root bench harness: shared knobs)

ROWS_PER_FILE = int(os.environ.get("GRAFT_WARC_ROWS_PER_FILE", "8192"))


def warc_dir() -> Path:
    return bench.pages_dir().with_name(
        bench.pages_dir().name.replace("pages_", "warc_")
    )


def prepare_warc(ray) -> Path:
    """pages parquet -> .warc.gz shards (once, untimed)."""
    out = warc_dir()
    done = out / "_DONE"
    if done.exists():
        return out
    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        write_pages_as_warc,
    )

    src = bench.prepare_pages(ray)
    tmp = out.with_suffix(".tmp")
    if tmp.exists():
        shutil.rmtree(tmp)
    manifest = write_pages_as_warc(
        rd.read_parquet(str(src)), str(tmp), rows_per_file=ROWS_PER_FILE
    )
    print(
        f"synthesized {len(manifest)} WARC shards, "
        f"{manifest.n_bytes.sum() / 1e6:.1f} MB, "
        f"{manifest.n_records.sum()} records",
        file=sys.stderr,
    )
    tmp.rename(out)
    (out / "_DONE").touch()
    return out


def output_hash(ray, out_dir: str) -> str:
    """Order-insensitive content hash of an extraction output dir."""
    import ray.data as rd

    df = (
        rd.read_parquet(out_dir)
        .to_pandas()
        .sort_values(["url", "warc_ts"])
        .reset_index(drop=True)
    )
    df = df.reindex(sorted(df.columns), axis=1)
    return hashlib.sha256(
        df.to_csv(index=False).encode()
    ).hexdigest()[:16]


def timed_headline(ray, source_fn, out_dir: str) -> dict:
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    concurrency = max(1, bench.NUM_CPUS * 3 // 4)
    t0 = time.time()
    extracted = extraction_pipeline(
        source_fn(),
        concurrency=concurrency,
        batch_size=int(os.environ.get("GRAFT_BATCH", "128")),
        giant_threshold_bytes=bench.GIANT_THRESHOLD,
    )
    extracted.write_parquet(out_dir)
    wall = time.time() - t0
    import ray.data as rd

    n = rd.read_parquet(out_dir).count()
    return {"sec": round(wall, 3), "rows": n,
            "docs_per_sec": round(n / wall, 1)}


def main():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=bench.NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from zzzarchived_arxiv_fulltext_ray.sources.warc_source import (
        read_pages_from_warc_stream,
    )

    wdir = prepare_warc(ray)
    paths = sorted(str(p) for p in wdir.glob("part-*.warc.gz"))
    pq_src = str(bench.prepare_pages(ray))

    out_root = bench.OUT_ROOT
    out_root.mkdir(parents=True, exist_ok=True)
    warc_out = str(out_root / "warc_headline_out")
    pq_out = str(out_root / "warc_headline_pq_out")

    n_runs = int(os.environ.get("GRAFT_HEADLINE_RUNS", "2"))
    warc_runs = [
        timed_headline(
            ray, lambda: read_pages_from_warc_stream(paths), warc_out
        )
        for _ in range(n_runs)
    ]
    pq_runs = [
        timed_headline(ray, lambda: rd.read_parquet(pq_src), pq_out)
        for _ in range(n_runs)
    ]
    wh, ph = output_hash(ray, warc_out), output_hash(ray, pq_out)

    best_w = min(warc_runs, key=lambda r: r["sec"])
    best_p = min(pq_runs, key=lambda r: r["sec"])
    result = {
        "metric": "warc_native_headline_sec",
        "value": best_w["sec"],
        "unit": "sec",
        "rows": best_w["rows"],
        "docs_per_sec": best_w["docs_per_sec"],
        "warc_runs_sec": [r["sec"] for r in warc_runs],
        "parquet_headline_sec": best_p["sec"],
        "parquet_docs_per_sec": best_p["docs_per_sec"],
        "warc_over_parquet": round(best_w["sec"] / best_p["sec"], 3),
        "n_warc_files": len(paths),
        "output_identical": wh == ph,
        "output_hash": wh,
        "num_cpus": bench.NUM_CPUS,
        "sf": Path(bench.SF_DIR).name,
    }
    for d in (warc_out, pq_out):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(result))
    if not result["output_identical"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
