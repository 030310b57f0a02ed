"""Per-operator wall/UDF breakdown of the headline pipeline.

Runs the flagship extraction over the materialized bench pages table
(creating it via bench.prepare_pages if missing) and prints one line
per Ray Data operator from ds.stats() — the feedback loop for "is
wall-time dominated by useful compute?".

Usage: python scripts/profile_headline.py [--cpus N]
"""

import argparse
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--concurrency", type=int, default=0)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False, logging_level="ERROR",
                 ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    import ray.data as rd
    from zzzarchived_arxiv_fulltext_ray.pipelines.extraction import (
        extraction_pipeline,
    )

    src = str(bench.prepare_pages(ray))
    rd.read_parquet(src).count()  # warm page cache

    out_dir = "/tmp/profile_headline_out"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    conc = args.concurrency or max(1, args.cpus * 3 // 4)

    t0 = time.time()
    ds = extraction_pipeline(
        rd.read_parquet(src), concurrency=conc, batch_size=128
    )
    ds.write_parquet(out_dir)
    print(f"wall: {time.time() - t0:.2f}s  (cpus={args.cpus}, pool={conc})")

    for block in ds.stats().split("Operator "):
        head = block.split("\n", 1)[0][:90]
        produced = re.search(r"blocks produced in ([\d\.]+)s", block)
        udf = re.search(r"\* UDF time: .*?, ([\d\.]+)(m?s) total", block)
        if produced or udf:
            print(
                f"  {head}\n"
                f"    produced_in={produced.group(1) if produced else '-'}s"
                f"  udf_total={(udf.group(1) + udf.group(2)) if udf else '-'}"
            )

    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
